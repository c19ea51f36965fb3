"""Scaled dot-product attention for TPU.

Two paths:
  * ``sdpa`` — XLA einsum formulation with fp32 softmax accumulation. XLA
    already fuses this well on TPU for the moderate sequence lengths UniDepth
    uses (~1.5-3k tokens); it is the default and the parity reference.
  * ``flash_attention`` — Pallas blockwise kernel (ops/flash_attention.py)
    for long sequences; selected automatically above a token threshold.

Semantics match ``torch.nn.functional.scaled_dot_product_attention`` (no
causal masking; optional additive bias), reference
unidepth/layers/attention.py:136-138 and backbones/metadinov2/attention.py.
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp

__all__ = ["sdpa", "attention", "collect_attention_logits", "auditing_logits"]

# ---------------------------------------------------------------------------
# Attention-logit audit (r5): the serving-default max-free softmax kernel
# (ops/flash_attention._packed_kernel_tr) clamps prescaled logits at 80 and
# SATURATES instead of NaN-ing. That is only sound for checkpoints whose
# logits are known-bounded, so conversion audits the bound: under
# ``collect_attention_logits()`` every flash-eligible attention call records
# max |prescaled logit| into the ambient sink (a trace-time mechanism like
# ``safe_attention`` — scanned encoder blocks thread their maxima out of the
# ``lax.scan`` first, see models/backbones/dinov2.py). The audited bound is
# stored in converted-checkpoint metadata and serving only trusts the fast
# kernel when it sits under the margin (models/serving.py).
# ---------------------------------------------------------------------------
_AUDIT = threading.local()


@contextlib.contextmanager
def collect_attention_logits():
    """Trace-time collector: while active, attention entry points append
    ``max |prescaled logit|`` scalars to the yielded list. Enter it inside
    the function being traced (or run eagerly) and consume the sink before
    exiting — the entries are tracers of the enclosing trace."""
    prev = getattr(_AUDIT, "sink", None)
    _AUDIT.sink = []
    try:
        yield _AUDIT.sink
    finally:
        _AUDIT.sink = prev


def auditing_logits() -> bool:
    return getattr(_AUDIT, "sink", None) is not None


def record_logit_max(value: jnp.ndarray) -> None:
    """Append one max-|logit| scalar to the ambient audit sink (no-op when
    no audit is active)."""
    sink = getattr(_AUDIT, "sink", None)
    if sink is not None:
        sink.append(jnp.asarray(value, jnp.float32))


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Attention over ``(B, H, N, D)`` tensors with fp32 accumulation."""
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.asarray(scale, jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching attention over (B, H, N, D): flash kernel for long
    unbiased sequences on TPU, XLA SDPA otherwise. ``UNIDEPTH_ATTN_IMPL``
    overrides 'auto' (the export path sets it to 'xla' so serialized
    programs carry no Pallas custom calls)."""
    if impl == "auto":
        import os

        impl = os.environ.get("UNIDEPTH_ATTN_IMPL", "auto")
    b, h, nq, d = q.shape
    nk = k.shape[2]
    # a bias ALWAYS forces the XLA path — the flash kernel has no additive
    # bias support, so honoring impl='flash' here would silently compute
    # unbiased attention
    use_flash = bias is None and (
        impl == "flash"
        or (
            impl == "auto"
            and min(nq, nk) >= 1024
            and d <= 128
            and jax.default_backend() not in ("cpu",)
        )
    )
    if bias is None and auditing_logits():
        # every bias-free call is flash-ELIGIBLE on some deployment target
        # (the audit may run on CPU where use_flash is False), so the audit
        # records them all — conservative over-coverage, never under
        record_logit_max(
            jnp.max(
                jnp.abs(
                    jnp.einsum(
                        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
                    )
                )
            )
            * jnp.float32(d**-0.5)
        )
    if not use_flash:
        return sdpa(q, k, v, bias=bias)
    from unidepth_tpu.ops.flash_attention import sharded_flash_attention

    return sharded_flash_attention(q, k, v)
