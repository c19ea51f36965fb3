"""Positional encoding modules (reference layers/positional_encoding.py).

``position_embedding_sine`` (the DETR embedding both decoders use) lives in
ops/fourier.py as a pure function; this module adds the remaining layer-
style encodings from the reference inventory: learned sinusoidal embedding
and 2D vision RoPE (axial rotary embedding, the Fast variant precomputing
per-position cos/sin tables).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["LearnedSinusoidalPosEmb", "rope_2d_tables", "apply_rope"]


class LearnedSinusoidalPosEmb(nn.Module):
    """sin/cos of learned frequencies (reference :72-85)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        """x: (B,) scalar positions -> (B, dim + 1)."""
        assert self.dim % 2 == 0
        w = self.param("weights", nn.initializers.normal(1.0), (self.dim // 2,))
        f = x[:, None] * w[None, :] * 2.0 * math.pi
        return jnp.concatenate([x[:, None], jnp.sin(f), jnp.cos(f)], axis=-1)


def rope_2d_tables(h: int, w: int, dim: int, theta: float = 10000.0):
    """Axial 2D rotary tables (reference VisionRotaryEmbeddingFast, :128-226):
    half the head dim rotates with the row coordinate, half with the column.
    Returns (cos, sin) of shape (h*w, dim)."""
    half = dim // 2
    freqs = 1.0 / (theta ** (np.arange(0, half, 2, dtype=np.float64) / half))
    ys = np.arange(h, dtype=np.float64)
    xs = np.arange(w, dtype=np.float64)
    fy = np.einsum("i,j->ij", ys, freqs)  # (h, half/2)
    fx = np.einsum("i,j->ij", xs, freqs)
    fy = np.repeat(fy, 2, axis=-1)  # (h, half)
    fx = np.repeat(fx, 2, axis=-1)
    full = np.concatenate(
        [
            np.broadcast_to(fy[:, None, :], (h, w, half)),
            np.broadcast_to(fx[None, :, :], (h, w, half)),
        ],
        axis=-1,
    ).reshape(h * w, dim)
    return jnp.asarray(np.cos(full), jnp.float32), jnp.asarray(np.sin(full), jnp.float32)


def _rotate_half(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope(x, cos, sin):
    """x (..., N, D) with tables (N, D)."""
    return x * cos + _rotate_half(x) * sin
