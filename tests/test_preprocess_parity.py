"""Composed infer() preprocessing parity vs torch ops (normalize + pad +
resize exactly as reference unidepthv2.py:287-303)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unidepth_tpu.models.unidepthv2.model import get_paddings, get_resize_factor
from unidepth_tpu.ops.resize import resize
from unidepth_tpu.utils.constants import IMAGENET_DATASET_MEAN, IMAGENET_DATASET_STD


def test_v2_preprocess_composition(rng):
    H, W = 123, 415  # wide image -> vertical padding branch
    rgb = rng.integers(0, 255, (1, H, W, 3), dtype=np.uint8)

    pads, (ph, pw) = get_paddings((H, W), (0.5, 2.5))
    factor, (nh, nw) = get_resize_factor((ph, pw), (20000, 30000))
    pl, pr, pt, pb = pads

    # torch reference composition
    t = torch.from_numpy(rgb.transpose(0, 3, 1, 2)).float() / 255.0
    mean = torch.tensor(IMAGENET_DATASET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_DATASET_STD).view(1, 3, 1, 1)
    t = (t - mean) / std
    t = F.pad(t, (pl, pr, pt, pb), value=0.0)
    t = F.interpolate(t, size=(nh, nw), mode="bilinear", align_corners=False)

    # ours (mirrors the jitted preprocess in model._infer_fn)
    x = jnp.asarray(rgb, jnp.float32)
    x = (x - jnp.asarray(IMAGENET_DATASET_MEAN) * 255.0) / (
        jnp.asarray(IMAGENET_DATASET_STD) * 255.0
    )
    x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    x = resize(x, (nh, nw), mode="bilinear", align_corners=False)

    np.testing.assert_allclose(
        np.asarray(x).transpose(0, 3, 1, 2), t.numpy(), rtol=1e-4, atol=1e-4
    )


def test_v2_postprocess_composition(rng):
    # postprocess: bilinear to padded size then strip pads
    ph, pw = 96, 128
    pads = (8, 8, 0, 0)
    feat = rng.standard_normal((1, 42, 56, 3)).astype(np.float32)
    tt = F.interpolate(
        torch.from_numpy(feat.transpose(0, 3, 1, 2)), size=(ph, pw),
        mode="bilinear", align_corners=False,
    )
    pl, pr, pt, pb = pads
    tt = tt[..., pt : ph - pb, pl : pw - pr]
    x = resize(jnp.asarray(feat), (ph, pw), mode="bilinear", align_corners=False)
    x = x[:, pt : ph - pb, pl : pw - pr]
    np.testing.assert_allclose(
        np.asarray(x).transpose(0, 3, 1, 2), tt.numpy(), rtol=1e-4, atol=1e-5
    )
