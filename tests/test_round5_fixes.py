"""Regression pins for the round-5 advisor findings (all ADVICE.md r4).

1. ``safe_attention()``'s trace-time flag is thread-local: a concurrent
   trace on another thread must not observe this thread's flag.
2. A closed Loader refuses re-iteration loudly instead of spawning
   workers that exit immediately and parking the consumer on q.get().
3. ``quantize_dense_tree`` synthesizes a zero bias for a use_bias=False
   source Dense (QuantDense unconditionally declares one).
4. ``set_serving_precision`` preserves a non-default JitCache maxsize.
"""

import threading

import numpy as np
import pytest

import jax.numpy as jnp

from unidepth_tpu.ops.flash_attention import _resolve_safe, safe_attention

pytestmark = pytest.mark.smoke


def test_safe_attention_is_thread_local():
    seen = {}

    def probe():
        seen["other_thread"] = _resolve_safe(None)

    with safe_attention():
        assert _resolve_safe(None) is True
        t = threading.Thread(target=probe)
        t.start()
        t.join()
    assert seen["other_thread"] is False
    assert _resolve_safe(None) is False


def test_loader_close_is_terminal():
    from unidepth_tpu.datasets.dummy import Dummy
    from unidepth_tpu.datasets.loader import Loader, WeightedConcat

    ds = WeightedConcat([Dummy(image_shape=(56, 70), length=8)])
    loader = Loader(ds, batch_size=2, num_threads=1, normalize=False)
    it = iter(loader)
    next(it)
    loader.close()
    with pytest.raises(RuntimeError, match="closed"):
        next(iter(loader))


def test_quantize_dense_tree_synthesizes_missing_bias():
    from unidepth_tpu.ops.quant import QuantDense, quantize_dense_tree

    kernel = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32)
    tree = {"qkv": {"kernel": kernel}}  # use_bias=False layout
    q = quantize_dense_tree(tree)
    assert q["qkv"]["bias"].shape == (8,)
    assert q["qkv"]["bias"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(q["qkv"]["bias"]), 0.0)
    # the quantized layout must apply cleanly
    x = jnp.ones((2, 16), jnp.bfloat16)
    y = QuantDense(8, dtype=jnp.bfloat16).apply({"params": q["qkv"]}, x)
    assert y.shape == (2, 8)
    # scan-stacked layout (L, K, N) -> bias (L, N)
    q3 = quantize_dense_tree({"fc1": {"kernel": jnp.zeros((3, 16, 8))}})
    assert q3["fc1"]["bias"].shape == (3, 8)


def test_set_serving_precision_preserves_cache_maxsize():
    from unidepth_tpu.models.serving import ServingPrecisionMixin
    from unidepth_tpu.utils.misc import JitCache

    class Dummy(ServingPrecisionMixin):
        def __init__(self):
            self.dtype = jnp.bfloat16
            self.params = {"encoder": {}, "decoder": {}}
            self.encoder = type("E", (), {"quant": False, "clone": lambda s, **k: s})()
            self._jit_cache = JitCache(maxsize=3)
            self._init_serving()

    m = Dummy()
    m.set_serving_precision("int8")
    assert isinstance(m._jit_cache, JitCache)
    assert m._jit_cache.maxsize == 3
