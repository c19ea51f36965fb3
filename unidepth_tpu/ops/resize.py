"""Torch-semantics image resizing as separable matrix multiplies.

UniDepth's numerics are extremely sensitive to interpolation details: the
reference mixes ``F.interpolate`` calls with ``align_corners`` True/False,
``antialias`` True/False, bilinear and bicubic modes (see reference
unidepth/models/unidepthv2/unidepthv2.py:80-89, decoder.py:289-301,
utils/geometric.py:227-252, backbones/dinov2.py:267-304).

On TPU the natural formulation is not a gather loop but a pair of dense
matmuls: resizing along H is ``W_h @ x`` and along W is ``x @ W_w^T`` where
``W_h: (out_h, in_h)`` and ``W_w: (out_w, in_w)`` are small static weight
matrices computed on the host at trace time. XLA maps these straight onto
the MXU and fuses the surrounding elementwise work. This reproduces
PyTorch's sampling semantics exactly (same source-index formula, same
kernel, same edge clamping) while being a pure, static-shape program.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["resize", "resize_weights_1d", "flat_interpolate"]


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), torch uses A=-0.75."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _triangle_kernel(x: np.ndarray) -> np.ndarray:
    return np.clip(1.0 - np.abs(x), 0.0, None)


@functools.lru_cache(maxsize=4096)
def _resize_weights_cached(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool,
    antialias: bool,
    scale_factor: float | None = None,
) -> np.ndarray:
    w = _resize_weights_impl(
        in_size, out_size, mode, align_corners, antialias, scale_factor
    )
    w.setflags(write=False)
    return w


def _resize_weights_impl(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool,
    antialias: bool,
    scale_factor: float | None = None,
) -> np.ndarray:
    """Dense (out_size, in_size) resampling matrix with torch semantics.

    ``scale_factor``: torch's explicit out/in scale_factor semantics
    (recompute_scale_factor unset): the source grid uses 1/scale_factor
    instead of in_size/out_size — e.g. DINOv2's historical pos-embed
    kludge scale (grid+0.1)/M (reference backbones/dinov2.py:283-291).
    """
    if mode == "nearest":
        # Legacy torch 'nearest': src = floor(dst * in/out).
        scale = in_size / out_size
        src = np.floor(np.arange(out_size) * scale).astype(np.int64)
        src = np.clip(src, 0, in_size - 1)
        w = np.zeros((out_size, in_size), dtype=np.float64)
        w[np.arange(out_size), src] = 1.0
        return w.astype(np.float32)
    if mode == "nearest-exact":
        scale = in_size / out_size
        src = np.floor((np.arange(out_size) + 0.5) * scale).astype(np.int64)
        src = np.clip(src, 0, in_size - 1)
        w = np.zeros((out_size, in_size), dtype=np.float64)
        w[np.arange(out_size), src] = 1.0
        return w.astype(np.float32)

    if mode == "bilinear":
        kernel, support = _triangle_kernel, 1.0
    elif mode == "bicubic":
        # Torch's non-AA bicubic uses Keys a=-0.75; its antialias path is
        # PIL-compatible and uses a=-0.5.
        a = -0.5 if (antialias and not align_corners) else -0.75
        kernel, support = functools.partial(_cubic_kernel, a=a), 2.0
    else:
        raise ValueError(f"unsupported resize mode: {mode}")

    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = out_idx * scale
        downscale = 1.0
    else:
        scale = (
            1.0 / scale_factor if scale_factor is not None else in_size / out_size
        )
        src = (out_idx + 0.5) * scale - 0.5
        downscale = scale if (antialias and scale > 1.0) else 1.0

    w = np.zeros((out_size, in_size), dtype=np.float64)
    in_idx = np.arange(in_size, dtype=np.float64)

    if antialias and not align_corners:
        # Torch _compute_weights_aa: sample kernel at integer taps around the
        # (half-pixel) center, widen by the scale when minifying, then
        # normalize. Edge handling: taps outside the image are dropped and
        # the remaining weights renormalized.
        center = src + 0.5  # torch uses center = scale * (i + 0.5)
        supp = support * downscale
        xmin = np.maximum(0, np.floor(center - supp + 0.5)).astype(np.int64)
        xmax = np.minimum(in_size, np.floor(center + supp + 0.5)).astype(np.int64)
        for o in range(out_size):
            taps = np.arange(xmin[o], max(xmax[o], xmin[o] + 1))
            vals = kernel((taps - center[o] + 0.5) / downscale)
            total = vals.sum()
            if total != 0.0:
                vals = vals / total
            w[o, taps] = vals
    else:
        # Non-antialiased path: fixed tap count, indices clamped to the valid
        # range (replicate padding). Torch clamps the *source coordinate* at 0
        # for linear interpolation only; cubic keeps negative sources and
        # relies on index clamping (aten UpSample semantics).
        if mode == "bilinear" and not align_corners:
            src = np.clip(src, 0.0, None)
        base = np.floor(src).astype(np.int64)
        frac = src - base
        if mode == "bilinear":
            taps = [0, 1]
        else:
            taps = [-1, 0, 1, 2]
        for t in taps:
            vals = kernel(t - frac)
            idx = np.clip(base + t, 0, in_size - 1)
            np.add.at(w, (np.arange(out_size), idx), vals)
    return w.astype(np.float32)


def resize_weights_1d(
    in_size: int,
    out_size: int,
    mode: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
    scale_factor: float | None = None,
) -> np.ndarray:
    """Public, cached accessor for the 1-D resampling matrix."""
    return _resize_weights_cached(
        int(in_size), int(out_size), mode, bool(align_corners), bool(antialias),
        None if scale_factor is None else float(scale_factor),
    )


def resize(
    x: jnp.ndarray,
    size: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
    channel_last: bool = True,
    scale_factors: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Resize with exact ``torch.nn.functional.interpolate`` semantics.

    Args:
      x: ``(..., H, W, C)`` if ``channel_last`` else ``(..., H, W)``.
      size: output ``(H, W)``.
      scale_factors: optional explicit (sh, sw) out/in scale factors
        (torch ``scale_factor=`` semantics; see resize_weights_1d).
    """
    out_h, out_w = int(size[0]), int(size[1])
    if channel_last:
        in_h, in_w = x.shape[-3], x.shape[-2]
    else:
        in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w) and scale_factors is None:
        # All supported modes reduce to the identity at equal size.
        return x
    sh, sw = scale_factors if scale_factors is not None else (None, None)
    wdt = jnp.float32
    cdt = x.dtype
    wh = jnp.asarray(
        resize_weights_1d(in_h, out_h, mode, align_corners, antialias, sh), wdt
    )
    ww = jnp.asarray(
        resize_weights_1d(in_w, out_w, mode, align_corners, antialias, sw), wdt
    )
    xf = x.astype(wdt)
    if channel_last:
        y = jnp.einsum("Oh,...hwc->...Owc", wh, xf, preferred_element_type=wdt)
        y = jnp.einsum("Pw,...hwc->...hPc", ww, y, preferred_element_type=wdt)
    else:
        y = jnp.einsum("Oh,...hw->...Ow", wh, xf, preferred_element_type=wdt)
        y = jnp.einsum("Pw,...hw->...hP", ww, y, preferred_element_type=wdt)
    return y.astype(cdt)


def flat_interpolate(
    x: jnp.ndarray,
    old: tuple[int, int],
    new: tuple[int, int],
    antialias: bool = True,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Resize token grids ``(B, old_h*old_w, C) -> (B, new_h*new_w, C)``.

    Mirrors reference utils/geometric.py:227-252 (align_corners=False).
    """
    if tuple(old) == tuple(new):
        return x
    b, _, c = x.shape
    grid = x.reshape(b, old[0], old[1], c)
    out = resize(grid, new, mode=mode, align_corners=False, antialias=antialias)
    return out.reshape(b, new[0] * new[1], c)
