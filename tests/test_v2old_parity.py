"""V2old decoder numeric parity vs the torch oracle + converter mapping."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from unidepth_tpu.io.convert import convert_v2old_decoder
from unidepth_tpu.models.unidepthv2.old import DecoderV2Old

from torch_mirror import MirrorV2OldDecoder

HID, HEADS = 32, 2
GH, GW = 4, 5
H, W = GH * 14, GW * 14
DIMS = (24, 24, 24, 24)


def test_v2old_decoder_parity(rng):
    torch.manual_seed(21)
    mirror = MirrorV2OldDecoder(
        input_dims=list(DIMS), hidden_dim=HID, num_heads=HEADS,
        depths=(1, 0, 0), camera_dim=24,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = convert_v2old_decoder(sd, num_resolutions=4, num_levels=3)

    dec = DecoderV2Old(
        input_dims=DIMS, hidden_dim=HID, num_heads=HEADS, depths=(1, 0, 0),
        camera_dim=24, attn_impl="exact", dtype=jnp.float32,
    )

    feats_np = [rng.standard_normal((2, GH, GW, d)).astype(np.float32) for d in DIMS]
    cam_np = [rng.standard_normal((2, 1, DIMS[-1])).astype(np.float32) for _ in range(4)]
    glob_np = [rng.standard_normal((2, 1, DIMS[-1])).astype(np.float32) for _ in range(2)]

    with torch.no_grad():
        K_t, depth_t, conf_t = mirror(
            [torch.from_numpy(f) for f in feats_np],
            [torch.from_numpy(c) for c in cam_np],
            [torch.from_numpy(g) for g in glob_np],
            (H, W),
        )

    out = jax.jit(
        lambda p, f, c, g: dec.apply({"params": p}, f, c, g, (H, W))
    )(
        params,
        [jnp.asarray(f) for f in feats_np],
        [jnp.asarray(c) for c in cam_np],
        [jnp.asarray(g) for g in glob_np],
    )

    np.testing.assert_allclose(np.asarray(out["K"]), K_t.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["depth"])[..., 0], depth_t.numpy()[:, 0], rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["confidence"])[..., 0], conf_t.numpy()[:, 0], rtol=5e-3, atol=5e-3
    )
