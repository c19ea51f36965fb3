"""UniDepthV2old family: token-budget shapes, GlobalHead scale/shift path."""

import numpy as np
import pytest

import jax.numpy as jnp

from unidepth_tpu.models.backbones.dinov2 import ViTConfig
from unidepth_tpu.models.unidepthv2.old import UniDepthV2old

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def v2old_tiny():
    cfg = ViTConfig(
        embed_dim=64, depth=4, num_heads=2, pos_embed_size=8,
        output_idx=(1, 2, 3, 4), use_norm=True,
    )
    m = UniDepthV2old(
        cfg, hidden_dim=32, decoder_depths=(1, 0, 0), num_heads=4,
        pixels_bounds=(9, 20), dtype=jnp.float32, attn_impl="exact",
    )
    m.init_params(0, image_shape=(56, 70))
    return m


def test_token_budget_shapes(v2old_tiny):
    # default resolution level = max -> upper bound of 20 tokens
    (h, w), ratio = v2old_tiny._shapes((100, 150))
    assert h % 14 == 0 and w % 14 == 0
    assert (h // 14) * (w // 14) <= 24
    v2old_tiny.resolution_level = 0
    (h0, w0), _ = v2old_tiny._shapes((100, 150))
    assert h0 * w0 <= h * w
    v2old_tiny.resolution_level = None


def test_infer_contract(v2old_tiny):
    rgb = np.random.default_rng(0).integers(0, 255, (1, 50, 64, 3), dtype=np.uint8)
    out = v2old_tiny.infer(rgb)
    assert out["depth"].shape == (1, 50, 64, 1)
    assert out["confidence"].shape == (1, 50, 64, 1)
    assert out["points"].shape == (1, 50, 64, 3)
    assert bool(jnp.all(out["depth"] > 0))  # softplus output
    assert bool(jnp.all(out["confidence"] >= 0)) and bool(
        jnp.all(out["confidence"] <= 1)
    )  # sigmoid confidence
    np.testing.assert_allclose(
        np.asarray(out["points"][..., 2]), np.asarray(out["depth"][..., 0]), rtol=1e-5
    )


def test_infer_with_gt_K(v2old_tiny):
    rgb = np.random.default_rng(1).integers(0, 255, (1, 56, 70, 3), dtype=np.uint8)
    K = np.array([[80.0, 0, 35], [0, 80.0, 28], [0, 0, 1]], np.float32)
    out = v2old_tiny.infer(rgb, intrinsics=K)
    assert np.isfinite(np.asarray(out["depth"])).all()
