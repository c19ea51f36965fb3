"""V1 decoder numeric parity vs the torch oracle (exact-attention mode),
also exercising the V1 checkpoint converter key mapping."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from unidepth_tpu.io.convert import convert_v1_decoder
from unidepth_tpu.models.unidepthv1.decoder import DecoderV1

from torch_mirror import MirrorV1Decoder, torch_rsh_cart
from unidepth_tpu.ops.sht import rsh_cart

HID, HEADS = 32, 2
GH, GW = 4, 5
H, W = GH * 14, GW * 14
DIMS = (24, 24, 24, 24)


def test_torch_mirror_sh_matches_jax(rng):
    v = rng.standard_normal((10, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    a = torch_rsh_cart(torch.from_numpy(v), 8).numpy()
    b = np.asarray(rsh_cart(jnp.asarray(v), 8))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_v1_decoder_parity(rng):
    torch.manual_seed(11)
    mirror = MirrorV1Decoder(
        input_dims=list(DIMS), hidden_dim=HID, num_heads=HEADS, depths=(1, 1, 1)
    ).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = convert_v1_decoder(sd, num_resolutions=4)

    dec = DecoderV1(
        input_dims=DIMS,
        hidden_dim=HID,
        num_heads=HEADS,
        depths=(1, 1, 1),
        attn_impl="exact",
        dtype=jnp.float32,
    )
    feats_np = [rng.standard_normal((2, GH, GW, d)).astype(np.float32) for d in DIMS]
    cls_np = [rng.standard_normal((2, 1, d)).astype(np.float32) for d in DIMS]

    with torch.no_grad():
        K_t, outs_t = mirror(
            [torch.from_numpy(f) for f in feats_np],
            [torch.from_numpy(c) for c in cls_np],
            (H, W),
        )

    K_j, outs_j, _ = jax.jit(
        lambda p, f, c: dec.apply({"params": p}, f, c, (H, W))
    )(params, [jnp.asarray(f) for f in feats_np], [jnp.asarray(c) for c in cls_np])

    np.testing.assert_allclose(np.asarray(K_j), K_t.numpy(), rtol=1e-4, atol=1e-3)
    for o_j, o_t, scale in zip(outs_j, outs_t, (8, 4, 2)):
        got = np.asarray(o_j)[..., 0]
        exp = o_t.numpy()[:, 0]
        np.testing.assert_allclose(got, exp, rtol=3e-3, atol=3e-3, err_msg=f"out{scale}")


def test_v1_decoder_parity_gt_rays(rng):
    torch.manual_seed(12)
    mirror = MirrorV1Decoder(
        input_dims=list(DIMS), hidden_dim=HID, num_heads=HEADS, depths=(1, 1, 1)
    ).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = convert_v1_decoder(sd, num_resolutions=4)
    dec = DecoderV1(
        input_dims=DIMS, hidden_dim=HID, num_heads=HEADS, depths=(1, 1, 1),
        attn_impl="exact", dtype=jnp.float32,
    )
    feats_np = [rng.standard_normal((1, GH, GW, d)).astype(np.float32) for d in DIMS]
    cls_np = [rng.standard_normal((1, 1, d)).astype(np.float32) for d in DIMS]
    # genuine pinhole rays
    from unidepth_tpu.geometry.cameras import Pinhole

    K = jnp.asarray([[[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]])
    rays = Pinhole.from_K(K).get_rays(H, W).reshape(1, H * W, 3)

    with torch.no_grad():
        _, outs_t = mirror(
            [torch.from_numpy(f) for f in feats_np],
            [torch.from_numpy(c) for c in cls_np],
            (H, W),
            rays_gt=torch.from_numpy(np.asarray(rays)),
        )
    _, outs_j, _ = dec.apply(
        {"params": params},
        [jnp.asarray(f) for f in feats_np],
        [jnp.asarray(c) for c in cls_np],
        (H, W),
        rays_gt=rays,
    )
    for o_j, o_t in zip(outs_j, outs_t):
        np.testing.assert_allclose(
            np.asarray(o_j)[..., 0], o_t.numpy()[:, 0], rtol=3e-3, atol=3e-3
        )
