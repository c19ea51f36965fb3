"""UniDepthV1 family: SH embeddings, Nystrom attention, infer pipeline."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from unidepth_tpu.models.backbones.convnext import ConvNeXt, ConvNeXtConfig
from unidepth_tpu.models.backbones.dinov2 import DinoViT, ViTConfig
from unidepth_tpu.models.unidepthv1.model import UniDepthV1, _v1_paddings, _v1_shapes
from unidepth_tpu.nn.nystrom import nystrom_attention
from unidepth_tpu.ops.attention import sdpa
from unidepth_tpu.ops.sht import rsh_cart

pytestmark = pytest.mark.slow


def test_sht_low_degree_constants(rng):
    """Values against the published torch-spherical-harmonics polynomial
    constants (reference utils/sht.py rsh_cart_3)."""
    v = rng.standard_normal((7, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    got = np.asarray(rsh_cart(jnp.asarray(v), 2))
    exp = np.stack(
        [
            0.282094791773878 * np.ones_like(x),
            -0.48860251190292 * y,
            0.48860251190292 * z,
            -0.48860251190292 * x,
            1.09254843059208 * x * y,
            -1.09254843059208 * y * z,
            0.94617469575756 * z * z - 0.31539156525252,
            -1.09254843059208 * x * z,
            0.54627421529604 * (x * x - y * y),
        ],
        -1,
    )
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_sht_degree8_orthonormal(rng):
    n = 100_000
    u = rng.standard_normal((n, 3)).astype(np.float32)
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    Y = np.asarray(rsh_cart(jnp.asarray(u), 8))
    assert Y.shape == (n, 81)
    g = (Y.T @ Y) * (4 * np.pi / n)
    assert np.abs(g - np.eye(81)).max() < 0.05


def test_nystrom_approximates_exact(rng):
    b, h, n, d = 1, 2, 512, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32) * 0.2)
        for _ in range(3)
    )
    exact = np.asarray(sdpa(q, k, v))
    approx = np.asarray(nystrom_attention(q, k, v, num_landmarks=128))
    rel = np.abs(exact - approx).mean() / np.abs(exact).mean()
    assert rel < 0.15, rel
    # short sequences fall back to exact
    small = nystrom_attention(q[:, :, :64], k[:, :, :64], v[:, :, :64], 128)
    np.testing.assert_allclose(
        np.asarray(small), np.asarray(sdpa(q[:, :, :64], k[:, :, :64], v[:, :, :64])),
        rtol=1e-5, atol=1e-5,
    )


def test_v1_shape_math():
    (h, w), ratio = _v1_shapes((231, 308), (462, 616))
    assert (h, w) == (462, 616) and ratio == 2.0
    pads = _v1_paddings((462, 500), (462, 616))
    assert pads == (58, 58, 0, 0)


@pytest.fixture(scope="module")
def v1_tiny():
    cfg = ViTConfig(
        embed_dim=64, depth=4, num_heads=2, pos_embed_size=8,
        output_idx=(1, 2, 3, 4), use_norm=False,
    )
    m = UniDepthV1(
        cfg, hidden_dim=32, decoder_depths=(1, 1, 1), num_heads=4,
        image_shape=(56, 70), dtype=jnp.float32, attn_impl="exact",
    )
    m.init_params(0)
    return m


def test_v1_infer_contract(v1_tiny):
    rgb = np.random.default_rng(0).integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    out = v1_tiny.infer(rgb)
    assert out["depth"].shape == (2, 48, 64, 1)
    assert out["points"].shape == (2, 48, 64, 3)
    assert bool(jnp.all(out["depth"] > 0))
    # z of points equals depth (spherical z-buffer convention)
    np.testing.assert_allclose(
        np.asarray(out["points"][..., 2]), np.asarray(out["depth"][..., 0]), rtol=1e-5
    )


def test_v1_gt_camera_and_skip(v1_tiny):
    rgb = np.random.default_rng(1).integers(0, 255, (1, 56, 70, 3), dtype=np.uint8)
    K = np.array([[80.0, 0, 35], [0, 80.0, 28], [0, 0, 1]], np.float32)
    out = v1_tiny.infer(rgb, intrinsics=K)
    out_skip = v1_tiny.infer(rgb, intrinsics=K, skip_camera=True)
    assert np.isfinite(np.asarray(out["depth"])).all()
    # depth path conditioned on same GT rays in both cases
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(out_skip["depth"]), rtol=1e-4, atol=1e-4
    )


def test_v1_convnext_backbone():
    ccfg = ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128))
    enc = ConvNeXt(cfg=ccfg, stacking="max_cls", dtype=jnp.float32)
    m = UniDepthV1(
        None, hidden_dim=32, decoder_depths=(1, 1, 1), num_heads=4,
        image_shape=(64, 96), dtype=jnp.float32, attn_impl="exact",
        encoder_module=enc,
    )
    m.init_params(0)
    out = m.infer(
        np.random.default_rng(0).integers(0, 255, (1, 64, 96, 3), dtype=np.uint8)
    )
    assert out["depth"].shape == (1, 64, 96, 1)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_vit_max_cls_stacking_matches_manual(rng):
    """'max_cls' must equal max over per-block (patches + cls)."""
    cfg = ViTConfig(
        embed_dim=32, depth=2, num_heads=2, pos_embed_size=4,
        output_idx=(1, 2), use_norm=False,
    )
    img = jnp.asarray(rng.standard_normal((1, 28, 28, 3)).astype(np.float32))
    enc = DinoViT(cfg=cfg, stacking="max_cls", dtype=jnp.float32)
    params = enc.init(jax.random.key(0), img)
    feats, cls_tokens = enc.apply(params, img)
    assert len(feats) == 2 and len(cls_tokens) == 2
    assert feats[0].shape == (1, 2, 2, 32)
    assert cls_tokens[0].shape == (1, 1, 32)
