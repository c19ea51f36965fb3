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


def test_convnext_checkpoint_layout_normalization():
    """FB- and CLIP-layout checkpoints convert to the identical param tree
    as the timm layout (reference convnext.py:512-563 checkpoint_filter_fn)."""
    import re

    import jax

    torch.manual_seed(13)
    mirror = MirrorConvNeXt(DEPTHS, DIMS).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    ref = convert_convnext(sd, depths=DEPTHS)

    # CLIP layout: image tower under visual.trunk. plus head keys to drop
    clip_sd = {f"visual.trunk.{k}": v for k, v in sd.items()}
    clip_sd["visual.head.proj.weight"] = np.zeros((4, DIMS[-1]), np.float32)
    clip = convert_convnext(clip_sd, depths=DEPTHS)

    # FB layout: downsample_layers + per-stage indexed blocks + dw/pw names
    fb_sd = {}
    for k, v in sd.items():
        k = k.replace("stem.", "downsample_layers.0.")
        m = re.match(r"stages\.(\d+)\.downsample\.(\d+)\.(.*)", k)
        if m:
            k = f"downsample_layers.{int(m.group(1))}.{m.group(2)}.{m.group(3)}"
        k = re.sub(r"stages\.(\d+)\.blocks\.(\d+)\.", r"stages.\1.\2.", k)
        k = k.replace(".conv_dw.", ".dwconv.")
        k = k.replace(".mlp.fc1.", ".pwconv1.").replace(".mlp.fc2.", ".pwconv2.")
        fb_sd[k] = v
    fb = convert_convnext({"model": fb_sd}, depths=DEPTHS)

    for other in (clip, fb):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            ref,
            other,
        )
