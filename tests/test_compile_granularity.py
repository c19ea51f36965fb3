"""'core' compile granularity: same numerics as 'full', one core program
shared across input shapes that map to the same resolution bucket."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from unidepth_tpu.models.unidepthv2.model import UniDepthV2

pytestmark = pytest.mark.slow

CFG = json.loads(
    (Path(__file__).resolve().parents[1] / "configs/config_v2_vits14.json").read_text()
)


def test_core_mode_matches_full_and_shares_core():
    cfg = json.loads(json.dumps(CFG))
    m = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    # pixel budget forces every input into the same bucket
    m.shape_constraints["pixels_min"] = 4000
    m.shape_constraints["pixels_max"] = 4000
    m.init_params(seed=0, image_shape=(56, 70))
    rng = np.random.default_rng(0)

    rgb1 = rng.integers(0, 255, (1, 60, 90, 3), dtype=np.uint8)
    full = m.infer(rgb1, compile_granularity="full")
    core = m.infer(rgb1, compile_granularity="core")
    np.testing.assert_allclose(
        np.asarray(core["depth"]), np.asarray(full["depth"]), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(core["intrinsics"]), np.asarray(full["intrinsics"]), rtol=1e-4, atol=1e-3
    )

    n_core = sum(1 for k in m._jit_cache if isinstance(k, tuple) and k[0] == "core")
    assert n_core == 1
    # a different input shape in the same aspect band reuses the core program
    rgb2 = rng.integers(0, 255, (1, 66, 99, 3), dtype=np.uint8)
    out2 = m.infer(rgb2, compile_granularity="core")
    assert out2["depth"].shape == (1, 66, 99, 1)
    n_core2 = sum(1 for k in m._jit_cache if isinstance(k, tuple) and k[0] == "core")
    assert n_core2 == 1  # no new expensive compile
