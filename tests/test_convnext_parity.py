"""ConvNeXt encoder + converter parity vs a timm-named torch mirror."""

import numpy as np
import torch

import jax.numpy as jnp

from unidepth_tpu.io.convert import convert_convnext
from unidepth_tpu.models.backbones.convnext import ConvNeXt, ConvNeXtConfig

from torch_mirror import MirrorConvNeXt

DEPTHS, DIMS = (1, 1, 2, 1), (16, 32, 64, 128)


def test_convnext_parity(rng):
    torch.manual_seed(13)
    mirror = MirrorConvNeXt(DEPTHS, DIMS).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = convert_convnext(sd, depths=DEPTHS)

    enc = ConvNeXt(cfg=ConvNeXtConfig(depths=DEPTHS, dims=DIMS), stacking="last", dtype=jnp.float32)
    img = rng.standard_normal((2, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        feats_t, toks_t = mirror(torch.from_numpy(img))
    feats_j, toks_j = enc.apply({"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)))
    for fj, ft in zip(feats_j, feats_t):
        np.testing.assert_allclose(np.asarray(fj), ft.numpy(), rtol=2e-4, atol=2e-4)
    for tj, tt in zip(toks_j, toks_t):
        np.testing.assert_allclose(np.asarray(tj), tt.numpy(), rtol=2e-4, atol=2e-4)
