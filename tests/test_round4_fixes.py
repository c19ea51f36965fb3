"""Regression pins for the round-4 review findings.

1. The guarded max-free softmax (the serving default since the r4 kernel
   work) is NOT safe for unbounded logits; training must trace under
   ``safe_attention()`` so every attention call takes the row-max kernels.
2. ``_serving_params`` must hold the params OBJECT in its cache key —
   keying on id() lets CPython reuse a freed dict's address after a
   checkpoint reload and silently serve the old weights' cast.
3. Ordered-mode Loader re-iteration must CONTINUE the ticket stream
   (workers persist and never re-issue a ticket; a generator-local
   next_ticket=0 deadlocks the second iterator).
"""

import threading
from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

from unidepth_tpu.ops.flash_attention import (
    _resolve_safe,
    _xla_attention,
    flash_attention,
    safe_attention,
)

pytestmark = pytest.mark.smoke


# ---------------------------------------------------------------- 1. attn


def test_safe_attention_flag_resolution():
    assert _resolve_safe(None) is False
    assert _resolve_safe(True) is True
    with safe_attention():
        assert _resolve_safe(None) is True
        assert _resolve_safe(False) is False  # explicit pin wins
        with safe_attention():  # nesting
            assert _resolve_safe(None) is True
        assert _resolve_safe(None) is True
    assert _resolve_safe(None) is False


def _big_logit_qkv(seed=0, bh=2, n=160, d=64):
    """Rows whose top-2 logits are ~100 and ~90 — both beyond the serving
    kernel's min(s, 80) clamp (trained prescaled ViT logits stay < 30).
    Clamping maps BOTH to 80, turning a ~1/4.5e-5 weight ratio into 1/1;
    a single >80 logit per row would not expose the distortion (the row
    stays one-hot either way)."""
    r = np.random.default_rng(seed)
    q = r.normal(size=(bh, n, d)).astype(np.float32)
    q = 10.0 * q / np.linalg.norm(q, axis=-1, keepdims=True)
    k = q.copy()
    # give every even row a 0.9-scaled twin at the next key slot
    k[:, 1::2, :] = 0.9 * q[:, 0::2, :]
    v = r.normal(size=(bh, n, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_unbounded_logits_need_safe_softmax():
    q, k, v = _big_logit_qkv()
    ref = _xla_attention(q, k, v, scale=1.0)

    safe = flash_attention(q, k, v, scale=1.0, safe_softmax=True)
    np.testing.assert_allclose(np.asarray(safe), np.asarray(ref), atol=2e-4)

    # the serving default saturates >80 logits — it must NOT silently be
    # used for logits like these (this is the hazard the train-step
    # safe_attention() wrap exists for; if this starts matching, the
    # kernels were unified and the wrap can go)
    fast = flash_attention(q, k, v, scale=1.0, safe_softmax=False)
    assert not np.allclose(np.asarray(fast), np.asarray(ref), atol=1e-3)

    # ambient context: unspecified safe_softmax resolves safe at trace time
    with safe_attention():
        ambient = flash_attention(q, k, v, scale=1.0)
    np.testing.assert_allclose(np.asarray(ambient), np.asarray(ref), atol=2e-4)


def test_train_step_traces_under_safe_attention():
    """The train-step forward must run with the ambient safe flag set (the
    whole point of safe_attention: no per-module plumbing)."""
    import unidepth_tpu.ops.flash_attention as fa
    from unidepth_tpu.training import step as step_mod

    seen = []

    class SpyModel:
        def encode_decode(self, params, image, rays_gt=None, rng=None):
            seen.append(fa._resolve_safe(None))
            b, h, w, _ = image.shape
            return {
                "depth": jnp.ones((b, h, w, 1)),
                "rays": jnp.ones((b, h * w, 3)),
                "confidence": jnp.ones((b, h, w, 1)),
            }

    def recipe(losses, outputs, batch, rng):
        return {"total": outputs["depth"].mean()}

    config = {"training": {"warmup_iters": 10, "losses": {}}, "data": {}}
    import jax
    import optax

    init_state, train_step = step_mod.make_train_step(
        SpyModel(), optax.sgd(0.0), config, recipe=recipe
    )
    state = init_state({"w": jnp.ones((2,))})
    batch = {
        "image": jnp.zeros((1, 2, 28, 28, 3)),
        "depth": jnp.ones((1, 2, 28, 28, 1)),
        "depth_mask": jnp.ones((1, 2, 28, 28, 1), bool),
    }
    train_step(state, batch, jax.random.key(0))
    assert seen and all(seen), "encode_decode traced without safe_attention()"
    assert fa._resolve_safe(None) is False  # flag restored after trace


# ------------------------------------------------------------ 2. serving


def test_serving_params_cache_holds_params_identity():
    from unidepth_tpu.models.serving import ServingPrecisionMixin
    from unidepth_tpu.utils.misc import JitCache

    class Fake(ServingPrecisionMixin):
        def __init__(self, params):
            self.params = params
            self.dtype = jnp.bfloat16
            self.encoder = SimpleNamespace(quant=False)
            self._jit_cache = JitCache()
            self._init_serving()

    p1 = {"encoder": {"w": jnp.ones((4, 4), jnp.float32)}, "decoder": {"b": jnp.zeros(3, jnp.float32)}}
    m = Fake(p1)
    c1 = m._serving_params()
    assert c1["encoder"]["w"].dtype == jnp.bfloat16
    # the cache must hold the params object itself (a strong ref makes
    # CPython id-reuse impossible) and compare by identity
    assert m._infer_params[0] is m.params
    assert m._serving_params() is c1  # hit

    # checkpoint reload: a NEW params tree must invalidate the cast cache
    p2 = {"encoder": {"w": 2.0 * jnp.ones((4, 4), jnp.float32)}, "decoder": {"b": jnp.zeros(3, jnp.float32)}}
    m.params = p2
    c2 = m._serving_params()
    assert c2 is not c1
    np.testing.assert_allclose(np.asarray(c2["encoder"]["w"], np.float32), 2.0)


# ------------------------------------------------------------- 3. loader


def test_ordered_loader_reiteration_continues_stream():
    from tests.test_shape_sampling_spmd import _loader

    ld = _loader(data_seed=0, shape_seed=7, num_threads=2)
    expected = [ld.shape_for_batch(n) for n in range(6)]

    got: list[tuple[int, int]] = []

    def consume():
        it1 = iter(ld)
        for _ in range(3):
            got.append(next(it1)["image"].shape[1:3])
        # abandon it1; a fresh iterator must CONTINUE at ticket 3 (before
        # the fix it waited on ticket 0 forever)
        it2 = iter(ld)
        for _ in range(3):
            got.append(next(it2)["image"].shape[1:3])

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=60)
    hung = t.is_alive()
    ld.close()
    assert not hung, "second iter(loader) deadlocked waiting for ticket 0"
    assert [tuple(s) for s in got] == expected
