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

    #: families whose depth head exponentiates logits (V1's exp(logit),
    #: reference unidepth/models/unidepthv1/decoder.py) amplify int8 GEMM
    #: noise too much for blanket quantization — they must run
    #: ``calibrate_int8_stages`` first so int8 only touches the
    #: measured-robust encoder stages
    INT8_REQUIRES_CALIBRATION = False

    def _init_serving(self):
        self.serving_precision = "default"  # 'default' (compute dtype) | 'int8'
        # (params-object, mode, stage-mask, cast-tree): the cache holds the
        # params object itself and compares with ``is`` — keying on id()
        # would let CPython reuse a freed dict's address after a checkpoint
        # reload and silently serve the OLD weights' cast
        self._infer_params = None
        self._encoder_q = None  # int8-GEMM encoder module (lazy clone)
        self._encoder_q_mask = None  # stage mask the clone was built for
        # per-stage int8 mask from calibrate_int8_stages(); None = every
        # stage (blanket int8)
        self._int8_stages = None
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
        if (
            mode == "int8"
            and self.INT8_REQUIRES_CALIBRATION
            and self._int8_stages is None
        ):
            raise ValueError(
                f"{type(self).__name__} exponentiates its depth logits; "
                "blanket int8 is unvalidated for it. Run "
                "calibrate_int8_stages(image) first — it measures per-stage "
                "sensitivity and enables int8 only on stages that keep the "
                "depth drift inside the bound (docs/SERVING.md)."
            )
        if mode != self.serving_precision:
            self.serving_precision = mode
            self._reset_serving_caches()

    def _reset_serving_caches(self):
        old = self._jit_cache
        self._jit_cache = (
            type(old)(old.maxsize) if hasattr(old, "maxsize") else type(old)()
        )
        self._infer_params = None

    def _int8_stage_mask(self):
        """Current per-stage int8 mask as a hashable tuple, or None for
        blanket quantization."""
        m = self._int8_stages
        return None if m is None else tuple(bool(x) for x in m)

    def calibrate_int8_stages(self, image, max_rel_err: float = 0.05):
        """Sensitivity-ordered selective int8: measure per-encoder-stage
        depth drift of int8 GEMMs on ``image`` (a batch ``infer`` accepts),
        then greedily enable stages — most robust first — while the
        *cumulative* mean relative depth error vs the default-precision
        forward stays within ``max_rel_err``.

        Families with exponentiating depth heads (V1) require this before
        ``set_serving_precision('int8')`` is accepted; for the others it
        tightens blanket int8 to a measured subset. The scan runs
        ``2 * n_stages + 1`` jitted forwards (one program per distinct
        stage mask) — a one-time conversion/deployment cost.

        Returns a report dict: ``per_stage`` (solo mean rel err, stage
        order), ``selected`` (the stored mask), ``rel_err`` (cumulative
        err of the selection). Raises if no stage fits the budget.
        """
        import numpy as np

        if not hasattr(self.encoder, "quant"):
            raise ValueError(
                "int8 calibration requires a ViT encoder (DinoViT); "
                f"{type(self.encoder).__name__} has no int8 GEMM path"
            )
        n = len(self.encoder.cfg.output_idx)
        prev_mode, prev_mask = self.serving_precision, self._int8_stages

        def run_depth(mode, mask):
            self._int8_stages = mask
            self.serving_precision = mode
            self._reset_serving_caches()
            return np.asarray(self.infer(image)["depth"])

        try:
            base = run_depth("default", None)

            def err_of(mask):
                d = run_depth("int8", mask)
                return float(np.mean(np.abs(d - base) / (np.abs(base) + 1e-6)))

            solo = sorted(
                (err_of(tuple(j == i for j in range(n))), i) for i in range(n)
            )
            kept = [False] * n
            kept_err = 0.0
            for e, i in solo:
                if e > max_rel_err:
                    break  # solo already over budget; the rest are worse
                trial = list(kept)
                trial[i] = True
                te = err_of(tuple(trial))
                if te <= max_rel_err:
                    kept, kept_err = trial, te
        finally:
            self._int8_stages = prev_mask
            self.serving_precision = prev_mode
            self._reset_serving_caches()
        if not any(kept):
            raise ValueError(
                f"int8 calibration failed: no encoder stage keeps mean rel "
                f"depth err <= {max_rel_err} (best solo "
                f"{solo[0][0]:.3f} at stage {solo[0][1]})"
            )
        self._int8_stages = tuple(kept)
        if self.serving_precision == "int8":
            self._reset_serving_caches()
        return {
            "per_stage": [(i, e) for e, i in solo],
            "selected": tuple(kept),
            "rel_err": kept_err,
            "max_rel_err": max_rel_err,
        }

    def _serving_encoder(self):
        if self.serving_precision != "int8":
            return self.encoder
        mask = self._int8_stage_mask()
        if self._encoder_q is None or self._encoder_q_mask != mask:
            self._encoder_q = self.encoder.clone(
                quant=True if mask is None else mask
            )
            self._encoder_q_mask = mask
        return self._encoder_q

    def _serving_params(self):
        if self.dtype == jnp.float32 and self.serving_precision == "default":
            return self.params
        cached = self._infer_params
        mask = self._int8_stage_mask()
        if (
            cached is None
            or cached[0] is not self.params
            or cached[1] != self.serving_precision
            or cached[2] != mask
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
                stages = (
                    None
                    if mask is None
                    else {f"stage_{i}" for i, on in enumerate(mask) if on}
                )
                cast = {
                    k: _cast_around_quant(
                        quantize_dense_tree(v, stages=stages), self.dtype
                    )
                    if k == "encoder"
                    else cast_tree(v)
                    for k, v in self.params.items()
                }
            else:
                cast = cast_tree(self.params)
            self._infer_params = (self.params, self.serving_precision, mask, cast)
        return self._infer_params[3]


def _cast_around_quant(tree, dtype):
    if isinstance(tree, dict):
        k = tree.get("kernel")
        if k is not None and hasattr(k, "dtype") and k.dtype == jnp.int8:
            return tree  # quantized dense: int8 kernel + f32 scale/bias as-is
        return {key: _cast_around_quant(val, dtype) for key, val in tree.items()}
    if hasattr(tree, "dtype") and tree.dtype == jnp.float32:
        return tree.astype(dtype)
    return tree
