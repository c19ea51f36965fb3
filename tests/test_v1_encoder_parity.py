"""V1 encoder consumption pattern parity: per-block cls-added features
max-reduced per stage + last-4-block cls tokens (reference
unidepthv1.py:321-326 + unidepthv1/decoder.py:373-380)."""

import numpy as np
import torch

import jax.numpy as jnp

from unidepth_tpu.io.convert import convert_encoder
from unidepth_tpu.models.backbones.dinov2 import DinoViT, ViTConfig

from torch_mirror import MirrorViT

DIM, DEPTH, HEADS = 64, 4, 2
H, W = 56, 70


def test_v1_max_cls_stacking_parity(rng):
    torch.manual_seed(5)
    mirror = MirrorViT(
        dim=DIM, depth=DEPTH, heads=HEADS, pos_grid=8, output_idx=(1, 2, 3, 4)
    ).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    # V1 encoders run without the final norm
    sd = {k: v for k, v in sd.items() if not k.startswith("norm.")}
    params = convert_encoder(sd, output_idx=(1, 2, 3, 4))

    cfg = ViTConfig(
        embed_dim=DIM, depth=DEPTH, num_heads=HEADS, pos_embed_size=8,
        output_idx=(1, 2, 3, 4), use_norm=False,
    )
    enc = DinoViT(cfg=cfg, stacking="max_cls", dtype=jnp.float32)

    img = rng.standard_normal((2, 3, H, W)).astype(np.float32)

    # torch reference composition: per-block outputs (pre-norm) + cls add,
    # then max over each 1-block stage; cls tokens = last 4 blocks
    with torch.no_grad():
        x = torch.from_numpy(img)
        b = x.shape[0]
        gh, gw = H // 14, W // 14
        t = mirror.patch_embed.proj(x).flatten(2).transpose(1, 2)
        pos = mirror.pos_embed[:, 1:].reshape(1, 8, 8, -1).permute(0, 3, 1, 2)
        pos = torch.nn.functional.interpolate(
            pos, size=(gh, gw), mode="bicubic", align_corners=False
        )
        t = t + pos.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        cls = mirror.cls_token.expand(b, -1, -1) + mirror.pos_embed[:, :1]
        t = torch.cat([cls, t], dim=1)
        feats_t, cls_t = [], []
        for blk in mirror.blocks:
            t = blk(t)
            cls_t.append(t[:, :1])
            feats_t.append((t[:, 1:] + t[:, :1]).reshape(b, gh, gw, -1))

    feats_j, cls_j = enc.apply(
        {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1))
    )
    assert len(feats_j) == 4 and len(cls_j) == 4
    for fj, ft in zip(feats_j, feats_t):  # 1-block stages: max == identity
        np.testing.assert_allclose(np.asarray(fj), ft.numpy(), rtol=1e-4, atol=1e-4)
    for cj, ct in zip(cls_j, cls_t[-4:]):
        np.testing.assert_allclose(np.asarray(cj), ct.numpy(), rtol=1e-4, atol=1e-4)
