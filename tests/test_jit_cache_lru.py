"""Bounded serving caches (VERDICT r3 #8): model._jit_cache is an LRU so
long-lived servers cycling many input-shape buckets don't accumulate
compiled executables without bound."""

import json
from pathlib import Path

import pytest

import jax.numpy as jnp

from unidepth_tpu.utils.misc import JitCache

ROOT = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.smoke


def test_jitcache_evicts_lru():
    c = JitCache(maxsize=3)
    for i in range(3):
        c[i] = i * 10
    _ = c[0]  # refresh 0 -> 1 is now LRU
    c[3] = 30
    assert 1 not in c
    assert set(c) == {0, 2, 3}
    c[4] = 40
    assert 2 not in c and 0 in c


def test_model_jit_cache_bounded():
    from unidepth_tpu.models.unidepthv2.model import UniDepthV2

    cfg = json.loads((ROOT / "configs" / "config_v2_vits14.json").read_text())
    model = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    bound = model._jit_cache.maxsize
    # build (not compile) far more shape-bucket programs than the bound:
    # jit wrapper creation is lazy/cheap, compilation happens on call
    for i in range(bound + 20):
        h, w = 112 + 14 * i, 140 + 14 * i
        key = (h, w, (0, 0, 0, 0), (h, w), (h, w), 1.0, False, True, ("depth",))
        model._infer_fn(key)
    assert len(model._jit_cache) == bound
    # the most recent keys survive
    h, w = 112 + 14 * (bound + 19), 140 + 14 * (bound + 19)
    assert (h, w, (0, 0, 0, 0), (h, w), (h, w), 1.0, False, True, ("depth",)) in (
        model._jit_cache
    )
