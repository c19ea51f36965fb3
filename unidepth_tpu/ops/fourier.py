"""Fourier feature embeddings and DETR-style sine positional encodings.

Parity targets:
  * generate_fourier_features — reference utils/positional_embedding.py:218-256
  * PositionEmbeddingSine     — reference layers/positional_encoding.py:14-57
Both are pure functions of static shapes here; everything folds into the
surrounding jit program.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["generate_fourier_features", "position_embedding_sine"]


def generate_fourier_features(
    x: jnp.ndarray,
    dim: int = 512,
    max_freq: int = 64,
    use_cos: bool = False,
    use_log: bool = False,
    cat_orig: bool = False,
) -> jnp.ndarray:
    """Sin(/cos) features of ``x`` (..., D) -> (..., dim[(+D)])."""
    input_dim = x.shape[-1]
    num_bands = dim // (2 * input_dim) if use_cos else dim // input_dim

    if use_log:
        scales = 2.0 ** np.linspace(0.0, math.log2(max_freq), num=num_bands)
    else:
        scales = np.linspace(1.0, max_freq / 2, num=num_bands)
    scales = jnp.asarray(scales * math.pi, dtype=x.dtype)

    xb = x[..., None] * scales  # (..., D, num_bands)
    feats = [jnp.sin(xb)]
    if use_cos:
        feats.append(jnp.cos(xb))
    out = jnp.concatenate(feats, axis=-1)
    out = out.reshape(*x.shape[:-1], -1)
    if cat_orig:
        out = jnp.concatenate([out, x], axis=-1)
    return out


def position_embedding_sine(
    h: int,
    w: int,
    num_pos_feats: int = 64,
    temperature: float = 10000.0,
    normalize: bool = False,
    scale: float | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """DETR sine embedding, returned as ``(H, W, 2*num_pos_feats)``.

    The reference computes cumsum over a no-mask grid, i.e. y_embed[i]=i+1,
    x_embed[j]=j+1, then (optionally) normalizes by the last element. Output
    channel order is (pos_y || pos_x) with interleaved sin/cos, matching
    reference layers/positional_encoding.py:28-57 (after the permute, its
    channel dim is dim 1; here it is last).
    """
    if scale is None:
        scale = 2.0 * math.pi
    y = np.arange(1, h + 1, dtype=np.float64)
    x = np.arange(1, w + 1, dtype=np.float64)
    if normalize:
        eps = 1e-6
        y = y / (y[-1] + eps) * scale
        x = x / (x[-1] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * np.floor(dim_t / 2) / num_pos_feats)

    pos_x = x[:, None] / dim_t  # (W, F)
    pos_y = y[:, None] / dim_t  # (H, F)

    def interleave(p):
        s = np.sin(p[:, 0::2])
        c = np.cos(p[:, 1::2])
        return np.stack([s, c], axis=2).reshape(p.shape[0], -1)

    pos_x = interleave(pos_x)  # (W, F)
    pos_y = interleave(pos_y)  # (H, F)
    out = np.concatenate(
        [
            np.broadcast_to(pos_y[:, None, :], (h, w, num_pos_feats)),
            np.broadcast_to(pos_x[None, :, :], (h, w, num_pos_feats)),
        ],
        axis=-1,
    )
    return jnp.asarray(out, dtype=dtype)
