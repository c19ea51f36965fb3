"""Core NN layer library (flax.linen, channel-last).

TPU-native re-design of the reference layer set
(unidepth/layers/{attention,mlp,activation,layer_scale}.py): pre-LN
cross/self attention with additive per-head positional embeddings on q/k,
LayerScale residuals, and an LN->Linear->GELU->Linear MLP. All matmuls run
in ``dtype`` (bf16 on TPU) with fp32 softmax/LN statistics; params are fp32.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from unidepth_tpu.ops.attention import attention, sdpa

Dtype = jnp.dtype


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


class LayerScale(nn.Module):
    """Per-channel learned residual scale (reference layers/layer_scale.py)."""

    dim: int
    init_value: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma.astype(self.dtype)


class MLP(nn.Module):
    """LN -> Linear -> GELU (exact) -> Linear (reference layers/mlp.py:9-35)."""

    dim: int
    expansion: int = 4
    output_dim: Optional[int] = None
    gated: bool = False
    gate_fn: str = "swiglu"  # 'swiglu' | 'geglu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        expansion = self.expansion
        if self.gated:
            expansion = int(expansion * 2 / 3)
        hidden = int(self.dim * expansion)
        out_dim = self.output_dim if self.output_dim is not None else self.dim
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        x = x.astype(self.dtype)
        x = nn.Dense(hidden * (2 if self.gated else 1), dtype=self.dtype, name="proj1")(x)
        if self.gated:
            # SwiGLU by default; GEGLU via gate_fn
            # (reference layers/activation.py:6-16)
            a, b = jnp.split(x, 2, axis=-1)
            gate = nn.silu(b) if self.gate_fn == "swiglu" else nn.gelu(b, approximate=False)
            x = a * gate
        else:
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(out_dim, dtype=self.dtype, name="proj2")(x)
        return x


class AttentionBlock(nn.Module):
    """Pre-LN (cross-)attention block (reference layers/attention.py:81-165).

    Queries come from ``x``; keys/values from ``context`` (defaults to x).
    ``pos_embed``/``pos_embed_context`` are added to q/k per-head.
    """

    dim: int
    num_heads: int = 4
    expansion: int = 4
    cosine: bool = False
    gated: bool = False
    layer_scale: float = 1.0
    context_dim: Optional[int] = None
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        pos_embed=None,
        pos_embed_context=None,
        attn_bias=None,
    ):
        context = x if context is None else context
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_attnx")(x)
        ctx = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_attnctx")(context)
        y = y.astype(self.dtype)
        ctx = ctx.astype(self.dtype)

        kv = nn.Dense(2 * self.dim, use_bias=self.use_bias, dtype=self.dtype, name="kv")(ctx)
        q = nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype, name="q")(y)
        # torch layout: (kv h d) chunks -> k = first half, v = second half per
        # head pair; reference rearrange "b n (kv h d)" puts kv outermost.
        k, v = jnp.split(kv, 2, axis=-1)
        q = _split_heads(q, self.num_heads)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)

        if pos_embed is not None:
            q = q + _split_heads(pos_embed.astype(self.dtype), self.num_heads)
        if pos_embed_context is not None:
            k = k + _split_heads(pos_embed_context.astype(self.dtype), self.num_heads)

        if self.cosine:
            q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
            k = k / jnp.linalg.norm(k, axis=-1, keepdims=True).clip(1e-12)

        attn = _merge_heads(attention(q, k, v, bias=attn_bias))
        attn = nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype, name="out")(attn)
        if self.layer_scale > 0.0:
            attn = LayerScale(self.dim, self.layer_scale, dtype=self.dtype, name="ls1")(attn)
        x = x + attn

        mlp = MLP(
            self.dim,
            expansion=self.expansion,
            gated=self.gated,
            dtype=self.dtype,
            name="mlp",
        )(x)
        if self.layer_scale > 0.0:
            mlp = LayerScale(self.dim, self.layer_scale, dtype=self.dtype, name="ls2")(mlp)
        return x + mlp


class AttentionLayer(nn.Module):
    """Stack of AttentionBlocks (reference layers/attention.py:168-216)."""

    num_blocks: int
    dim: int
    num_heads: int = 4
    expansion: int = 4
    cosine: bool = False
    gated: bool = False
    layer_scale: float = 1.0
    context_dim: Optional[int] = None
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        pos_embed=None,
        pos_embed_context=None,
        attn_bias=None,
    ):
        for i in range(self.num_blocks):
            x = AttentionBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                expansion=self.expansion,
                cosine=self.cosine,
                gated=self.gated,
                layer_scale=self.layer_scale,
                context_dim=self.context_dim,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(
                x,
                context=context,
                pos_embed=pos_embed,
                pos_embed_context=pos_embed_context,
                attn_bias=attn_bias,
            )
        return x


class AttentionDecoderBlock(nn.Module):
    """Cross-attn -> self-attn -> MLP block with single-head cross option
    (reference layers/attention.py:219-351; exposed by the layer library,
    unused by shipped models)."""

    dim: int
    num_heads: int = 4
    expansion: int = 4
    cosine: bool = False
    gated: bool = False
    layer_scale: float = 1.0
    context_dim: Optional[int] = None
    single_head_ca: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, pos_embed=None, pos_embed_context=None, attn_bias=None):
        context = x if context is None else context
        ca_heads = 1 if self.single_head_ca else self.num_heads

        def attn(y, ctx, heads, prefix, pos_q=None, pos_k=None):
            yn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"norm_{prefix}")(y)
            cn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"norm_ctx_{prefix}")(ctx)
            yn, cn = yn.astype(self.dtype), cn.astype(self.dtype)
            kv = nn.Dense(2 * self.dim, dtype=self.dtype, name=f"kv_{prefix}")(cn)
            q = nn.Dense(self.dim, dtype=self.dtype, name=f"q_{prefix}")(yn)
            k, v = jnp.split(kv, 2, axis=-1)
            q = _split_heads(q, heads)
            k = _split_heads(k, heads)
            v = _split_heads(v, heads)
            if pos_q is not None:
                q = q + _split_heads(pos_q.astype(self.dtype), heads)
            if pos_k is not None:
                k = k + _split_heads(pos_k.astype(self.dtype), heads)
            if self.cosine:
                q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
                k = k / jnp.linalg.norm(k, axis=-1, keepdims=True).clip(1e-12)
            o = _merge_heads(sdpa(q, k, v, bias=attn_bias))
            return nn.Dense(self.dim, dtype=self.dtype, name=f"out_{prefix}")(o)

        ca = attn(x, context, ca_heads, "ca", pos_q=pos_embed, pos_k=pos_embed_context)
        if self.layer_scale > 0:
            ca = LayerScale(self.dim, self.layer_scale, dtype=self.dtype, name="ls1")(ca)
        x = x + ca
        sa = attn(x, x, self.num_heads, "sa", pos_q=pos_embed)
        if self.layer_scale > 0:
            sa = LayerScale(self.dim, self.layer_scale, dtype=self.dtype, name="ls2")(sa)
        x = x + sa
        m = MLP(self.dim, expansion=self.expansion, gated=self.gated, dtype=self.dtype, name="mlp")(x)
        if self.layer_scale > 0:
            m = LayerScale(self.dim, self.layer_scale, dtype=self.dtype, name="ls3")(m)
        return x + m


def drop_path(x, rate, rng, deterministic: bool = True):
    """Stochastic depth over the batch axis: scale-compensated per-sample
    Bernoulli residual drop (reference layers/drop_path.py:5-26 and
    metadinov2/block.py:103-105, which applies drop_path1 to both residual
    branches at train time). ``rate`` may be a traced scalar (per-block
    ramp threaded through nn.scan)."""
    if deterministic:
        return x
    import jax
    import jax.numpy as jnp

    keep = 1.0 - jnp.asarray(rate, jnp.float32)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep.astype(x.dtype), jnp.zeros((), x.dtype))

class DenseParams(nn.Module):
    """Declares the exact param tree of an ``nn.Dense`` (kernel + bias,
    default initializers) WITHOUT applying it — fused Pallas block paths
    consume the raw weights while keeping the checkpoint tree byte-identical
    to the unfused modules."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class LNParams(nn.Module):
    """Param tree of an ``nn.LayerNorm`` (scale + bias) without applying."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        return scale, bias

