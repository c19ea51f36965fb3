"""Shared serving-precision machinery for the model wrappers.

Every model family (V1 / V2 / V2old) serves through jitted programs cached
on ``self._jit_cache`` and owns an ``{'encoder': ..., 'decoder': ...}``
param pytree. This mixin centralizes the two serving-params optimizations
so the families cannot drift:

  * **compute-dtype pre-cast** — fp32 master params are cast to the
    compute dtype (bf16 on TPU) ONCE and cached, halving per-block weight
    DMA inside the scanned encoder vs casting at every use;
  * **opt-in int8** (``set_serving_precision('int8')``) — the encoder's
    dense GEMM kernels are quantized per-output-channel to int8
    (ops/quant.py) and the serving programs run them on the MXU's
    double-rate integer path with per-token dynamic activation quant.
    Requires a ViT encoder (DinoViT carries the ``quant`` flag); the
    ConvNeXt families raise. Training / ``encode_decode`` are untouched.

The reference has no analogue (it serves under fp16 autocast,
reference unidepth/models/unidepthv2/unidepthv2.py:240); this is
TPU-native serving surface. See docs/SERVING.md "Int8 serving mode".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ServingPrecisionMixin"]


class ServingPrecisionMixin:
    """Mixin for model wrappers with ``params``/``dtype``/``encoder``/
    ``_jit_cache`` attributes. Call ``_init_serving()`` at the end of
    ``__init__``."""

    #: serving trusts the guarded max-free softmax kernel only below this
    #: prescaled-logit bound (the kernel clamps at 80 and saturates instead
    #: of NaN-ing — ops/flash_attention._packed_kernel_tr); 60 leaves a
    #: margin for inputs harder than the audit image
    LOGIT_AUDIT_MARGIN = 60.0

    def _init_serving(self):
        self.serving_precision = "default"  # 'default' (compute dtype) | 'int8'
        # (params-object, mode, cast-tree): the cache holds the params
        # object itself and compares with ``is`` — keying on id() would let
        # CPython reuse a freed dict's address after a checkpoint reload
        # and silently serve the OLD weights' cast
        self._infer_params = None
        self._encoder_q = None  # int8-GEMM encoder module (lazy clone)
        # max |prescaled attention logit| audited at conversion (config
        # metadata key 'attention_logit_bound', scripts/convert.py) or via
        # audit_attention_logits(); None = never audited -> serving keeps
        # the loud row-max softmax kernels
        self.attention_logit_bound = getattr(self, "attention_logit_bound", None)

    def serving_safe_softmax(self) -> bool:
        """True when serving programs must trace under the row-max softmax
        kernels: the checkpoint's attention-logit bound is unaudited or too
        close to the max-free kernel's clamp at 80."""
        b = self.attention_logit_bound
        return b is None or not (float(b) < self.LOGIT_AUDIT_MARGIN)

    def _serving_trace_ctx(self):
        """Context for TRACING serving programs (enter inside the function
        under jit): ``safe_attention()`` unless the checkpoint's audited
        logit bound clears the margin."""
        import contextlib

        from unidepth_tpu.ops.flash_attention import safe_attention

        return safe_attention() if self.serving_safe_softmax() else contextlib.nullcontext()

    def audit_attention_logits(self, image) -> float:
        """Measure max |prescaled attention logit| over every flash-eligible
        attention call in one eager forward on ``image`` (B, H, W, 3 raw in
        [0, 255] is NOT expected here — pass a normalized, shape-valid
        batch, e.g. the converter's demo input). Stores and returns the
        bound; serving re-keys its program cache so the kernel choice can
        change."""
        from unidepth_tpu.ops.attention import collect_attention_logits
        from unidepth_tpu.ops.flash_attention import safe_attention

        with collect_attention_logits() as sink, safe_attention():
            self.encode_decode(self.params, jnp.asarray(image))
            bound = float(jnp.max(jnp.stack(sink))) if sink else 0.0
        self.attention_logit_bound = bound
        old = self._jit_cache
        self._jit_cache = (
            type(old)(old.maxsize) if hasattr(old, "maxsize") else type(old)()
        )
        return bound

    def set_serving_precision(self, mode: str):
        """Select serving numerics: 'default' keeps the compute dtype (bf16
        on TPU); 'int8' runs every encoder GEMM as int8 x int8 -> int32 on
        the MXU's double-rate path (weights quantized once here, per-token
        dynamic activation scales at run time). Serving-only; clears the
        program caches (programs are precision-specific)."""
        if mode not in ("default", "int8"):
            raise ValueError(f"unknown serving precision {mode!r}")
        if mode == "int8" and not hasattr(self.encoder, "quant"):
            raise ValueError(
                "int8 serving requires a ViT encoder (DinoViT); "
                f"{type(self.encoder).__name__} has no int8 GEMM path"
            )
        if mode != self.serving_precision:
            self.serving_precision = mode
            old = self._jit_cache
            self._jit_cache = (
                type(old)(old.maxsize) if hasattr(old, "maxsize") else type(old)()
            )
            self._infer_params = None

    def _serving_encoder(self):
        if self.serving_precision != "int8":
            return self.encoder
        if self._encoder_q is None:
            self._encoder_q = self.encoder.clone(quant=True)
        return self._encoder_q

    def _serving_params(self):
        if self.dtype == jnp.float32 and self.serving_precision == "default":
            return self.params
        cached = self._infer_params
        if (
            cached is None
            or cached[0] is not self.params
            or cached[1] != self.serving_precision
        ):
            def cast_tree(tree):
                return jax.tree.map(
                    lambda x: x.astype(self.dtype)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x,
                    tree,
                )

            if self.serving_precision == "int8":
                from unidepth_tpu.ops.quant import quantize_dense_tree

                # quantize the encoder from the fp32 masters (never a bf16
                # intermediate); then compute-dtype-cast every remaining
                # fp32 leaf EXCEPT the quantized dense subtrees, whose f32
                # scale/bias QuantDense consumes directly (a bf16 scale
                # would silently add ~0.4% per-channel dequant error — and
                # in scan-stacked blocks scale/bias are 2D, so an ndim rule
                # cannot tell them apart). Non-encoder subtrees cast
                # directly — building a bf16 encoder copy only to discard
                # it would churn ~0.6 GB of transient device memory on ViT-L
                cast = {
                    k: _cast_around_quant(quantize_dense_tree(v), self.dtype)
                    if k == "encoder"
                    else cast_tree(v)
                    for k, v in self.params.items()
                }
            else:
                cast = cast_tree(self.params)
            self._infer_params = (self.params, self.serving_precision, cast)
        return self._infer_params[2]


def _cast_around_quant(tree, dtype):
    if isinstance(tree, dict):
        k = tree.get("kernel")
        if k is not None and hasattr(k, "dtype") and k.dtype == jnp.int8:
            return tree  # quantized dense: int8 kernel + f32 scale/bias as-is
        return {key: _cast_around_quant(val, dtype) for key, val in tree.items()}
    if hasattr(tree, "dtype") and tree.dtype == jnp.float32:
        return tree.astype(dtype)
    return tree
