"""Nystrom (landmark) attention block.

Sub-quadratic attention used by the V1 depth head at the 1/8 and 1/4
scales (reference layers/nystrom_attention.py:22-84 wrapping xformers
NystromAttention, 128 landmarks): landmarks are segment means of q/k, the
softmax kernel is approximated as K1 · pinv(K2) · (K3 v) with a
Newton-Schulz iterative pseudo-inverse — all dense matmuls, MXU-friendly.

``attn_impl='exact'`` falls back to exact SDPA with the same parameters;
on TPU exact attention at UniDepth's token counts (~2-4k) is often faster
than the approximation, but 'nystrom' reproduces the reference numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from unidepth_tpu.nn.layers import MLP, LayerScale, _merge_heads, _split_heads
from unidepth_tpu.ops.attention import sdpa


def _iterative_pinv(mat: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Newton-Schulz pseudo-inverse of a softmax kernel (rows sum ~1)."""
    abs_mat = jnp.abs(mat)
    col = jnp.max(jnp.sum(abs_mat, axis=-2), axis=-1)
    row = jnp.max(jnp.sum(abs_mat, axis=-1), axis=-1)
    z = mat.swapaxes(-1, -2) / (col * row)[..., None, None]
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    for _ in range(iters):
        kz = mat @ z
        z = 0.25 * z @ (13.0 * eye - kz @ (15.0 * eye - kz @ (7.0 * eye - kz)))
    return z


def nystrom_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_landmarks: int = 128
) -> jnp.ndarray:
    """q, k, v: (B, H, N, D). Falls back to exact when N <= landmarks."""
    b, h, n, d = q.shape
    m = num_landmarks
    if n <= m:
        return sdpa(q, k, v)
    scale = d**-0.5
    # segment-mean landmarks (pad N up to a multiple of m with edge values)
    pad = (-n) % m
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)), mode="edge")
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)), mode="edge")
    seg = qp.shape[2] // m
    q_l = qp.reshape(b, h, m, seg, d).mean(axis=3)
    k_l = kp.reshape(b, h, m, seg, d).mean(axis=3)

    def soft(a, bm):
        logits = jnp.einsum("bhnd,bhmd->bhnm", a, bm, preferred_element_type=jnp.float32) * scale
        return jax.nn.softmax(logits, axis=-1).astype(v.dtype)

    k1 = soft(q, k_l)  # (B,H,N,m)
    k2 = soft(q_l, k_l)  # (B,H,m,m)
    k3 = soft(q_l, k)  # (B,H,m,N)
    out = k1 @ (_iterative_pinv(k2) @ (k3 @ v))
    return out


class NystromBlock(nn.Module):
    """Drop-in AttentionBlock variant using landmark attention (self-attn
    path only, matching its V1 usage)."""

    dim: int
    num_heads: int = 4
    expansion: int = 4
    num_landmarks: int = 128
    layer_scale: float = 1.0
    attn_impl: str = "nystrom"  # 'nystrom' | 'exact'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_embed=None, context=None):
        context = x if context is None else context
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_attnx")(x)
        ctx = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_attnctx")(context)
        y = y.astype(self.dtype)
        ctx = ctx.astype(self.dtype)
        kv = nn.Dense(2 * self.dim, dtype=self.dtype, name="kv")(ctx)
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(y)
        k, v = jnp.split(kv, 2, axis=-1)
        q = _split_heads(q, self.num_heads)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)
        if pos_embed is not None:
            q = q + _split_heads(pos_embed.astype(self.dtype), self.num_heads)
        if self.attn_impl == "nystrom":
            attn = nystrom_attention(q, k, v, self.num_landmarks)
        else:
            attn = sdpa(q, k, v)
        attn = _merge_heads(attn)
        attn = nn.Dense(self.dim, dtype=self.dtype, name="out")(attn)
        if self.layer_scale > 0.0:
            attn = LayerScale(self.dim, self.layer_scale, dtype=self.dtype, name="ls1")(attn)
        x = x + attn
        m = MLP(self.dim, expansion=self.expansion, dtype=self.dtype, name="mlp")(x)
        if self.layer_scale > 0.0:
            m = LayerScale(self.dim, self.layer_scale, dtype=self.dtype, name="ls2")(m)
        return x + m
