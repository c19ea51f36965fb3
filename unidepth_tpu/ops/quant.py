"""Int8 serving quantization for the MXU's double-rate int8 path.

TPU v5e executes int8 x int8 -> int32 matmuls at ~2x the bf16 MXU rate
(394 TOPS vs 197 TFLOP/s datasheet). The encoder's dense GEMMs (qkv, proj,
fc1, fc2 — ~6.6 TFLOP of the ViT-L serving step) are the main consumer.
This module provides the standard post-training-quantization recipe:

  * weights:     symmetric per-output-channel int8 (scale over the
                 contraction axis), quantized ONCE at serving-params build;
  * activations: symmetric per-token (per-row) dynamic int8 — the row
                 abs-max is computed on the fly each call. Per-token
                 scaling is what keeps ViT accuracy: LN outputs are
                 well-conditioned per token but vary across tokens.

The dequant is a rank-1 outer product of the two scale vectors applied to
the int32 accumulator: y = (q_x @ q_w) * (s_x s_w^T) + b, fused by XLA
into the GEMM epilogue.

This is a serving-only, opt-in mode (``model.set_serving_precision``);
training and the default serving path stay bf16/fp32. The reference has no
quantized path — this surface is TPU-native (closest analogue: the
reference serves under fp16 autocast, unidepthv2.py:240).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "quantize_kernel",
    "dynamic_quant",
    "QuantDense",
    "quantize_dense_tree",
    "QUANT_DENSE_NAMES",
]

# Dense submodules of ViTBlock that carry the encoder's GEMM FLOPs.
QUANT_DENSE_NAMES = ("qkv", "proj", "fc1", "fc2", "w12", "w3")


def quantize_kernel(kernel: jnp.ndarray, axis: int = -2):
    """Symmetric per-output-channel int8 quantization of a dense kernel.

    ``axis`` is the contraction (in-features) axis; every other axis keeps
    its extent in the scale (so scanned-stacked kernels (L, K, N) get a
    per-(layer, out-channel) scale (L, N)).
    Returns (int8 kernel, float32 scale) with kernel ~= q * scale.
    """
    k = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=axis)


def dynamic_quant(x: jnp.ndarray):
    """Symmetric per-row (last-axis) dynamic int8 quantization.

    Returns (int8 x, float32 scale (..., 1)) with x ~= q * scale."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


class QuantDense(nn.Module):
    """Drop-in int8 Dense: int8 weights (pre-quantized into the params) x
    dynamically-quantized int8 activations, int32 accumulation on the MXU,
    rank-1 dequant epilogue. Param tree: {kernel: int8 (K, N),
    scale: f32 (N,), bias: f32 (N,)} — produced by ``quantize_dense_tree``
    from a standard Dense {kernel, bias}."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel",
            lambda rng, shape: jnp.zeros(shape, jnp.int8),
            (x.shape[-1], self.features),
        )
        w_scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        q, s = dynamic_quant(x)
        acc = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (s * w_scale) + bias
        return y.astype(self.dtype)


def quantize_dense_tree(
    params,
    names: tuple[str, ...] = QUANT_DENSE_NAMES,
    stages: set[str] | None = None,
):
    """Walk a flax param tree; for every submodule dict named in ``names``
    that looks like a Dense ({kernel: float (..., K, N), bias}), replace it
    with the QuantDense layout ({kernel: int8, scale, bias}). Leaves
    everything else (LN, layerscale, pos embeds, ...) untouched.

    ``stages``: when given, only denses under a scan-stage subtree whose
    key is in the set (e.g. {'stage_0', 'stage_2'}) are quantized — the
    layout for a per-stage ``DinoViT.quant`` tuple (selective int8,
    ServingPrecisionMixin.calibrate_int8_stages)."""

    # with a stage filter, ONLY denses under a selected stage_* subtree
    # quantize; anything outside a stage (patch embed, final norm) stays
    def walk(tree, enabled=stages is None):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for key, val in tree.items():
            if stages is not None and key.startswith("stage_"):
                out[key] = walk(val, enabled=key in stages)
                continue
            if (
                enabled
                and key in names
                and isinstance(val, dict)
                and "kernel" in val
                and hasattr(val["kernel"], "dtype")
                and jnp.issubdtype(val["kernel"].dtype, jnp.floating)
                and val["kernel"].ndim >= 2
            ):
                qk, scale = quantize_kernel(val["kernel"])
                new = {"kernel": qk, "scale": scale}
                if "bias" in val:
                    new["bias"] = val["bias"].astype(jnp.float32)
                else:
                    # QuantDense unconditionally declares a bias param;
                    # synthesize zeros for a use_bias=False source Dense
                    new["bias"] = jnp.zeros(
                        val["kernel"].shape[:-2] + val["kernel"].shape[-1:],
                        jnp.float32,
                    )
                out[key] = new
            else:
                out[key] = walk(val, enabled)
        return out

    return walk(params)
