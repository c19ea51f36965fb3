"""End-to-end numerical parity: unidepth_tpu V2 vs the torch oracle.

Random weights are generated in torch with reference-compatible key names,
converted via io.convert, and the same normalized image is pushed through
both stacks. This validates encoder math, decoder math, AND the checkpoint
converter in one shot.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from unidepth_tpu.io.convert import convert_v2_state_dict
from unidepth_tpu.models.backbones.dinov2 import DinoViT, ViTConfig
from unidepth_tpu.models.unidepthv2.decoder import Decoder

from torch_mirror import MirrorUniDepthV2

DIM, DEPTH, HEADS = 64, 4, 2
HIDDEN, OUT_DIM = 32, 8
H, W = 56, 70  # 4x5 patch grid


@pytest.fixture(scope="module")
def bundle():
    torch.manual_seed(7)
    mirror = MirrorUniDepthV2(
        dim=DIM, depth=DEPTH, heads=HEADS, hidden_dim=HIDDEN, out_dim=OUT_DIM
    ).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = convert_v2_state_dict(
        sd, output_idx=(1, 2, 3, 4), num_levels=3, use_norm=True
    )

    enc_cfg = ViTConfig(
        embed_dim=DIM,
        depth=DEPTH,
        num_heads=HEADS,
        pos_embed_size=8,
        output_idx=(1, 2, 3, 4),
        use_norm=True,
    )
    encoder = DinoViT(cfg=enc_cfg, dtype=jnp.float32)
    decoder = Decoder(
        input_dims=(DIM,) * 4,
        hidden_dim=HIDDEN,
        num_heads=2,
        depths=(1, 1, 1),
        out_dim=OUT_DIM,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(3)
    img = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    return mirror, params, encoder, decoder, img


def test_encoder_parity(bundle):
    mirror, params, encoder, _, img = bundle
    with torch.no_grad():
        feats_t, cls_t = mirror.pixel_encoder(torch.from_numpy(img))
    feats_j, cls_j = encoder.apply(
        {"params": params["encoder"]}, jnp.asarray(img.transpose(0, 2, 3, 1))
    )
    assert len(feats_j) == 4
    for ft, fj in zip(feats_t, feats_j):
        np.testing.assert_allclose(
            np.asarray(fj), ft.numpy(), rtol=1e-4, atol=1e-4
        )
    for ct, cj in zip(cls_t, cls_j):
        np.testing.assert_allclose(
            np.asarray(cj), ct.numpy(), rtol=1e-4, atol=1e-4
        )


def test_full_model_parity(bundle):
    mirror, params, encoder, decoder, img = bundle
    with torch.no_grad():
        out_t = mirror(torch.from_numpy(img))

    def fwd(p, x):
        feats, cls_tokens = encoder.apply({"params": p["encoder"]}, x)
        return decoder.apply(
            {"params": p["decoder"]}, feats, cls_tokens, (H, W)
        )

    out_j = jax.jit(fwd)(params, jnp.asarray(img.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(out_j["intrinsics"]),
        out_t["intrinsics"].numpy(),
        rtol=1e-4,
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_j["rays"]).reshape(2, H, W, 3),
        out_t["rays"].reshape(2, H, W, 3).numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    radius_t = out_t["radius"][:, 0].numpy()  # (B, H, W)
    radius_j = np.asarray(out_j["radius"])[..., 0]
    np.testing.assert_allclose(radius_j, radius_t, rtol=2e-3, atol=2e-3)
    conf_t = out_t["confidence"][:, 0].numpy()
    conf_j = np.asarray(out_j["confidence"])[..., 0]
    np.testing.assert_allclose(conf_j, conf_t, rtol=2e-3, atol=2e-3)


def test_full_model_parity_gt_rays(bundle):
    mirror, params, encoder, decoder, img = bundle
    rng = np.random.default_rng(5)
    v = rng.standard_normal((2, H * W, 3)).astype(np.float32)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    with torch.no_grad():
        out_t = mirror(torch.from_numpy(img), rays_gt=torch.from_numpy(v))

    def fwd(p, x, rays):
        feats, cls_tokens = encoder.apply({"params": p["encoder"]}, x)
        return decoder.apply(
            {"params": p["decoder"]}, feats, cls_tokens, (H, W), rays_gt=rays
        )

    out_j = jax.jit(fwd)(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(v)
    )
    radius_t = out_t["radius"][:, 0].numpy()
    radius_j = np.asarray(out_j["radius"])[..., 0]
    np.testing.assert_allclose(radius_j, radius_t, rtol=2e-3, atol=2e-3)
