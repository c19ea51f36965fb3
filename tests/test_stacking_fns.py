"""Encoder stacking_fn options ('max'/'mean') vs torch composition."""

import numpy as np
import torch

import jax.numpy as jnp

from unidepth_tpu.io.convert import convert_encoder
from unidepth_tpu.models.backbones.dinov2 import DinoViT, ViTConfig

from torch_mirror import MirrorViT


def _setup(rng):
    torch.manual_seed(4)
    mirror = MirrorViT(dim=32, depth=4, heads=2, pos_grid=8, output_idx=(2, 4)).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = convert_encoder(sd, output_idx=(2, 4))
    img = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(img)
        gh = gw = 4
        t = mirror.patch_embed.proj(x).flatten(2).transpose(1, 2)
        pos = mirror.pos_embed[:, 1:].reshape(1, 8, 8, -1).permute(0, 3, 1, 2)
        pos = torch.nn.functional.interpolate(
            pos, size=(gh, gw), mode="bicubic", align_corners=False
        )
        t = t + pos.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        cls = mirror.cls_token.expand(1, -1, -1) + mirror.pos_embed[:, :1]
        t = torch.cat([cls, t], 1)
        blocks = []
        for blk in mirror.blocks:
            t = blk(t)
            blocks.append(mirror.norm(t))
    return params, img, blocks


def test_max_and_mean_stacking(rng):
    params, img, blocks = _setup(rng)
    for mode, reduce in (
        ("max", lambda xs: torch.stack(xs, -1).max(-1).values),
        ("mean", lambda xs: torch.stack(xs, -1).mean(-1)),
    ):
        cfg = ViTConfig(
            embed_dim=32, depth=4, num_heads=2, pos_embed_size=8,
            output_idx=(2, 4), use_norm=True,
        )
        enc = DinoViT(cfg=cfg, stacking=mode, dtype=jnp.float32)
        feats, cls_j = enc.apply({"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)))
        for si, seg in enumerate((blocks[0:2], blocks[2:4])):
            ref = reduce(seg)
            np.testing.assert_allclose(
                np.asarray(feats[si]).reshape(1, 16, 32), ref[:, 1:].numpy(),
                rtol=1e-4, atol=1e-5, err_msg=f"{mode} seg{si}",
            )
            np.testing.assert_allclose(
                np.asarray(cls_j[si]), ref[:, :1].numpy(), rtol=1e-4, atol=1e-5
            )
