"""Attention-logit audit (r4 VERDICT #3): the serving-default max-free
softmax kernel clamps prescaled logits at 80 and SATURATES instead of
NaN-ing, so serving may only trace it for checkpoints whose audited
max |prescaled logit| clears ``ServingPrecisionMixin.LOGIT_AUDIT_MARGIN``.
Conversion measures the bound (scripts/convert.py --verify) and stores it
in checkpoint metadata; an unaudited or out-of-margin checkpoint keeps the
loud row-max kernels. Reference equivalent: SDPA's unconditional row-max
(/root/reference/unidepth/models/backbones/metadinov2/attention.py:51-63).
"""

import contextlib
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unidepth_tpu.ops.attention import (
    attention,
    auditing_logits,
    collect_attention_logits,
)

@pytest.mark.smoke
def test_collector_records_bias_free_attention(rng):
    b, h, n, d = 1, 2, 16, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32) for _ in range(3)
    )
    assert not auditing_logits()
    with collect_attention_logits() as sink:
        attention(q, k, v)
        assert len(sink) == 1
        expected = float(
            np.abs(np.einsum("bhqd,bhkd->bhqk", q, k)).max() * d**-0.5
        )
        assert abs(float(sink[0]) - expected) < 1e-5 * max(1.0, expected)
        # biased calls are never flash-eligible -> not recorded
        attention(q, k, v, bias=jnp.zeros((b, h, n, n)))
        assert len(sink) == 1
    assert not auditing_logits()


@pytest.mark.smoke
def test_vit_encoder_threads_audit_through_scan(rng):
    """Per-block maxima cross the lax.scan boundary as a stacked extra
    output; the ambient sink receives one entry per scan stage."""
    from unidepth_tpu.models.backbones.dinov2 import DinoViT, ViTConfig

    cfg = ViTConfig(
        embed_dim=32, depth=2, num_heads=2, patch_size=14, pos_embed_size=4,
        output_idx=(1, 2),
    )
    enc = DinoViT(cfg=cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 28, 42, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    with collect_attention_logits() as sink:
        enc.apply(params, x)
        assert sink, "encoder recorded nothing"
        bound = float(jnp.max(jnp.stack(sink)))
    assert np.isfinite(bound) and bound > 0.0


@pytest.mark.smoke
def test_serving_kernel_choice_follows_bound():
    from unidepth_tpu.models.serving import ServingPrecisionMixin

    class M(ServingPrecisionMixin):
        def __init__(self):
            self._jit_cache = {}
            self._init_serving()

    m = M()
    # unaudited -> loud path
    assert m.attention_logit_bound is None
    assert m.serving_safe_softmax() is True
    assert not isinstance(m._serving_trace_ctx(), contextlib.nullcontext)
    # audited comfortably under the margin -> fast kernel allowed
    m.attention_logit_bound = 12.5
    assert m.serving_safe_softmax() is False
    assert isinstance(m._serving_trace_ctx(), contextlib.nullcontext)
    # a >margin checkpoint (e.g. the VERDICT's >80-logit scenario) must
    # keep the row-max kernels even though it converted fine
    m.attention_logit_bound = 100.0
    assert m.serving_safe_softmax() is True
    assert not isinstance(m._serving_trace_ctx(), contextlib.nullcontext)


@pytest.mark.smoke
def test_serving_trace_ctx_sets_safe_flag():
    """Entering the ctx of an out-of-margin model flips the ambient
    trace-time flag the kernels resolve."""
    from unidepth_tpu.models.serving import ServingPrecisionMixin
    from unidepth_tpu.ops.flash_attention import _resolve_safe

    class M(ServingPrecisionMixin):
        def __init__(self):
            self._jit_cache = {}
            self._init_serving()

    m = M()
    m.attention_logit_bound = 100.0
    with m._serving_trace_ctx():
        assert _resolve_safe(None) is True
    m.attention_logit_bound = 5.0
    with m._serving_trace_ctx():
        assert _resolve_safe(None) is False


@pytest.mark.slow
def test_audit_rekeys_serving_cache():
    """audit_attention_logits must store the measured bound and drop stale
    serving programs (they were traced under the old kernel choice)."""
    from pathlib import Path

    from unidepth_tpu.models.unidepthv2.model import UniDepthV2

    cfg = json.loads(
        (
            Path(__file__).resolve().parents[1] / "configs/config_v2_vits14.json"
        ).read_text()
    )
    model = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    model.init_params(seed=0, image_shape=(56, 70))
    assert model.serving_safe_softmax() is True  # unaudited
    rgb = np.random.default_rng(0).integers(0, 255, (1, 56, 70, 3)).astype(np.float32)
    bound = model.audit_attention_logits(model._audit_preprocess(rgb))
    assert np.isfinite(bound) and bound > 0.0
    assert model.attention_logit_bound == bound
    assert model.serving_safe_softmax() is (not bound < model.LOGIT_AUDIT_MARGIN)
