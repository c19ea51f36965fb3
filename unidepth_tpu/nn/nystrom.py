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
    """Newton-Schulz (Razavi) pseudo-inverse of a softmax kernel.

    Matches the xformers ``iterative_pinv`` defaults (6 iterations,
    ``pinverse_original_init=False``): init ``Z0 = K^T / max(colsum(K))``
    — for a softmax kernel the row sums are exactly 1, so this coincides
    with the paper's ``K^T / (max colsum * max rowsum)`` init."""
    col = jnp.max(jnp.sum(mat, axis=-2), axis=-1)
    z = mat.swapaxes(-1, -2) / col[..., None, None]
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    for _ in range(iters):
        kz = mat @ z
        z = 0.25 * z @ (13.0 * eye - kz @ (15.0 * eye - kz @ (7.0 * eye - kz)))
    return z


def _landmark_pool(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """Segment-mean landmark pooling over the token axis of (B, H, N, D).

    Non-divisible N follows the xformers AvgPool split (reference pin
    xformers>=0.0.26, components/attention/nystrom.py): the first
    ``m - N%m`` landmarks average ``N//m`` tokens each, the remaining
    ``N%m`` average ``N//m + 1`` — every token contributes to exactly one
    landmark (edge-padding would double-weight boundary tokens)."""
    b, h, n, d = x.shape
    seg = n // m
    r = n % m
    if r == 0:
        return x.reshape(b, h, m, seg, d).mean(axis=3)
    n_round = m - r
    split = n_round * seg
    head = x[:, :, :split].reshape(b, h, n_round, seg, d).mean(axis=3)
    tail = x[:, :, split:].reshape(b, h, r, seg + 1, d).mean(axis=3)
    return jnp.concatenate([head, tail], axis=2)


def nystrom_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_landmarks: int = 128
) -> jnp.ndarray:
    """q, k, v: (B, H, N, D). Falls back to exact when N <= landmarks."""
    b, h, n, d = q.shape
    m = num_landmarks
    if n <= m:
        return sdpa(q, k, v)
    scale = d**-0.5
    q_l = _landmark_pool(q, m)
    k_l = _landmark_pool(k, m)

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
