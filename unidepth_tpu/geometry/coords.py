"""Pixel coordinate grids (channel-last).

Reference semantics: unidepth/utils/coordinate.py:4-27 — pixel *centers* at
+0.5 offsets, i.e. x in [0.5, W-0.5], y in [0.5, H-0.5].
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["coords_grid", "normalize_coords"]


def coords_grid(
    h: int,
    w: int,
    homogeneous: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Return an ``(H, W, 2|3)`` grid of pixel-center coordinates (x, y[, 1]).

    Note: channel-last (TPU layout); the reference returns (B, 2, H, W).
    Broadcast over batch at the call site instead of materializing B copies.
    """
    xs = jnp.linspace(0.5, w - 0.5, w, dtype=dtype)
    ys = jnp.linspace(0.5, h - 0.5, h, dtype=dtype)
    grid_x = jnp.broadcast_to(xs[None, :], (h, w))
    grid_y = jnp.broadcast_to(ys[:, None], (h, w))
    parts = [grid_x, grid_y]
    if homogeneous:
        parts.append(jnp.ones((h, w), dtype=dtype))
    return jnp.stack(parts, axis=-1)


def normalize_coords(coords: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Map pixel coords to [-1, 1] (reference utils/coordinate.py:23-27)."""
    c = jnp.asarray([(w - 1) / 2.0, (h - 1) / 2.0], dtype=coords.dtype)
    return (coords - c) / c
