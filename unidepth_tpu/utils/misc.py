"""Assorted utilities (reference unidepth/utils/misc.py, channel-last).

Stacking functions for encoder features, pad-aware eval matching
(match_gt/match_intrinsics), padding removal, and wall-clock profiling
decorators with percentile statistics.
"""

from __future__ import annotations

import collections
import functools
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from unidepth_tpu.ops.resize import resize
from unidepth_tpu.utils.constants import (
    IMAGENET_DATASET_MEAN,
    IMAGENET_DATASET_STD,
)


def normalize_rgb(x, mode: str = "imagenet"):
    """ImageNet-normalize raw (..., 3) RGB in 0..255 float, on device.

    The loader/collate path deliberately ships raw uint8-ranged floats
    (half the H2D bytes of normalized fp32 would be a lie — dtype is the
    same — but keeping normalization on device lets XLA fuse it into the
    first conv/patch GEMM for free, exactly like the serving preprocess,
    models/unidepthv2/model.py:_build_run). Training/validation forwards
    MUST call this before encode_decode; the jitted infer() programs
    normalize internally. Reference counterpart: the datasets' Normalize
    transform (reference unidepth/datasets/pipelines + config
    data.normalization=imagenet)."""
    if mode in (None, "none", "identity"):
        return x
    mean = jnp.asarray(IMAGENET_DATASET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_DATASET_STD, jnp.float32) * 255.0
    return (x - mean) / std

__all__ = [
    "normalize_rgb",
    "max_stack",
    "mean_stack",
    "first_stack",
    "last_stack",
    "softmax_stack",
    "sum_stack",
    "STACKING_FNS",
    "match_gt",
    "match_intrinsics",
    "remove_padding",
    "ssi_helper",
    "profile_method",
    "ProfileMethod",
]


def max_stack(tensors):
    if len(tensors) == 1:
        return tensors[0]
    return jnp.max(jnp.stack(tensors, axis=-1), axis=-1)


def mean_stack(tensors):
    if len(tensors) == 1:
        return tensors[0]
    return jnp.mean(jnp.stack(tensors, axis=-1), axis=-1)


def sum_stack(tensors):
    if len(tensors) == 1:
        return tensors[0]
    return jnp.sum(jnp.stack(tensors, axis=-1), axis=-1)


def first_stack(tensors):
    return tensors[0]


def last_stack(tensors):
    return tensors[-1]


def softmax_stack(tensors, temperature: float = 1.0):
    if len(tensors) == 1:
        return tensors[0]
    s = jnp.stack(tensors, axis=-1)
    return jnp.sum(jax.nn.softmax(s / temperature, axis=-1) * s, axis=-1)


STACKING_FNS = {
    "max": max_stack,
    "mean": mean_stack,
    "first": first_stack,
    "last": last_stack,
    "softmax": softmax_stack,
}


def remove_padding(x: jnp.ndarray, padding: tuple[int, int, int, int]) -> jnp.ndarray:
    """x (B, H, W, C), padding (l, r, t, b) (reference misc.py:369-376)."""
    l, r, t, b = padding
    h, w = x.shape[1:3]
    return x[:, t : h - b, l : w - r]


def match_gt(pred, gt_shape, padding1=(0, 0, 0, 0), mode: str = "bilinear"):
    """Un-pad ``pred`` (B, H, W, C) and resize to the GT grid
    (reference misc.py:596-645, same per-batch padding)."""
    pred = remove_padding(pred, padding1)
    return resize(pred, gt_shape, mode=mode, align_corners=False)


def match_intrinsics(K, src_shape, tgt_shape, padding1=(0, 0, 0, 0)):
    """Rescale K after un-padding src and resizing to tgt
    (reference misc.py:648-690)."""
    l, r, t, b = padding1
    h1 = src_shape[0] - t - b
    w1 = src_shape[1] - l - r
    h2, w2 = tgt_shape
    sx, sy = w2 / w1, h2 / h1
    K = K.at[:, 0, 0].multiply(sx).at[:, 1, 1].multiply(sy)
    K = K.at[:, 0, 2].set((K[:, 0, 2] - l) * sx)
    K = K.at[:, 1, 2].set((K[:, 1, 2] - t) * sy)
    return K


def ssi_helper(x, target):
    """Closed-form scale/shift least squares (reference misc.py:388-396)."""
    from unidepth_tpu.training.losses import ssi_helper as _ssi

    return _ssi(x, target)


class ProfileMethod:
    """Wall-clock profiler with percentile stats after warmup
    (reference misc.py:471-583)."""

    def __init__(self, model, name, verbose=False):
        self.name = name
        self.verbose = verbose

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.dt = time.perf_counter() - self.t0


_TIMINGS: dict[str, list[float]] = defaultdict(list)


def profile_method(verbose: bool = False):
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            out = jax.block_until_ready(out) if hasattr(out, "block_until_ready") else out
            dt = time.perf_counter() - t0
            _TIMINGS[fn.__name__].append(dt)
            times = _TIMINGS[fn.__name__]
            if verbose and len(times) > 25:
                arr = np.asarray(times[5:]) * 1000
                print(
                    f"{fn.__name__}: p50={np.percentile(arr, 50):.1f}ms "
                    f"p90={np.percentile(arr, 90):.1f}ms n={len(arr)}"
                )
            return out

        return wrapper

    return deco


class JitCache(collections.OrderedDict):
    """Bounded LRU mapping for per-shape jitted serving programs.

    Long-lived servers that see many input shapes would otherwise
    accumulate one compiled executable per shape bucket forever
    (model._jit_cache grows with every new (H, W, ...) key). Evicting the
    least-recently-used jit wrapper drops the only reference to it, which
    lets jax release the underlying device executable. The default bound
    comfortably covers the 10 resolution_level buckets times the pre/core/
    post programs of the 'core' granularity; see docs/SERVING.md
    ("Serving-cache memory model"). The reference has no serving layer —
    this surface is TPU-native (closest analogue: one torch module held
    in memory, unidepthv2.py:239-339)."""

    def __init__(self, maxsize: int = 32):
        super().__init__()
        self.maxsize = maxsize

    def __getitem__(self, key):
        val = super().__getitem__(key)
        self.move_to_end(key)
        return val

    def __setitem__(self, key, val):
        super().__setitem__(key, val)
        self.move_to_end(key)
        while len(self) > self.maxsize:
            self.popitem(last=False)
