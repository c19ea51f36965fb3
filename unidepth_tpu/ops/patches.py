"""Patch extraction and bilinear sampling (TPU equivalents of native ops).

``extract_patches`` replaces the reference's RandomPatchExtraction CUDA op
(reference unidepth/ops/extract_patches/src/extract_patches_kernel.cu):
gather N (kh, kw) windows around integer centers from a (B, H, W, C) tensor.
On TPU this is a vmapped ``lax.dynamic_slice`` — XLA lowers it to an
efficient gather; shapes stay static (N and the kernel are compile-time).

``bilinear_sample`` is the grid-sample primitive used by the SelfDistill
loss redesign and the camera overlap mask (zeros padding, align_corners
False-style pixel-center convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["extract_patches", "bilinear_sample"]


def extract_patches(
    x: jnp.ndarray, centers: jnp.ndarray, size: tuple[int, int]
) -> jnp.ndarray:
    """x: (B, H, W, C); centers: (B, N, 2) int (y, x) — window centers.

    Returns (B, N, kh, kw, C). Windows are taken from a zero-padded image so
    out-of-bounds regions read 0 (matches the reference op's padded gather).
    """
    kh, kw = size
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))

    def one(img, c):
        def window(cyx):
            start = (cyx[0], cyx[1], jnp.int32(0))
            return jax.lax.dynamic_slice(
                img, start, (kh, kw, img.shape[-1])
            )

        return jax.vmap(window)(c)

    # centers already index the padded image at offset +pad - pad = original
    centers = centers.astype(jnp.int32)
    return jax.vmap(one)(xp, centers)


def bilinear_sample(
    img: jnp.ndarray, coords: jnp.ndarray, zero_pad: bool = True
) -> jnp.ndarray:
    """img: (B, H, W, C); coords: (B, Ho, Wo, 2) as (x, y) pixel-center
    positions (0.5 = first pixel center). Returns (B, Ho, Wo, C)."""
    b, h, w, c = img.shape
    x = coords[..., 0] - 0.5
    y = coords[..., 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(iy, ix):
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, iyc, ixc)
        if zero_pad:
            inside = (
                (iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1)
            )
            vals = vals * inside[..., None].astype(img.dtype)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = dx[..., None]
    wy = dy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
