"""Full from_pretrained path: reference-style checkpoint dir (config.json +
pytorch_model.bin with pixel_encoder./pixel_decoder. keys) -> converted
params -> numerically identical inference vs the torch oracle."""

import json

import numpy as np
import torch

import jax.numpy as jnp

from unidepth_tpu.models.unidepthv2.model import UniDepthV2

from torch_mirror import MirrorUniDepthV2

DIM, DEPTH, HEADS, HIDDEN, OUT_DIM = 64, 4, 2, 32, 8


def test_from_pretrained_checkpoint_dir(tmp_path, rng):
    torch.manual_seed(3)
    mirror = MirrorUniDepthV2(
        dim=DIM, depth=DEPTH, heads=HEADS, hidden_dim=HIDDEN, out_dim=OUT_DIM
    ).eval()
    torch.save(mirror.state_dict(), tmp_path / "pytorch_model.bin")
    config = {
        "generic": {},
        "training": {},
        "data": {
            "image_shape": [56, 70],
            "augmentations": {
                "shape_constraints": {
                    "ratio_bounds": [0.5, 2.5],
                    "pixels_min": 3000,
                    "pixels_max": 5000,
                    "shape_mult": 14,
                }
            },
        },
        "model": {
            "name": "UniDepthV2",
            "num_heads": HEADS,
            "expansion": 4,
            "layer_scale": 1.0,
            "pixel_decoder": {
                "hidden_dim": HIDDEN,
                "depths": [1, 1, 1],
                "out_dim": OUT_DIM,
                "kernel_size": 3,
            },
            "pixel_encoder": {
                "name": "dinov2_tiny_test",
                "embed_dim": DIM,
                "depth": DEPTH,
                "num_heads": HEADS,
                "pos_embed_size": 8,
                "output_idx": [1, 2, 3, 4],
                "use_norm": True,
                "stacking_fn": "last",
            },
        },
    }
    (tmp_path / "config.json").write_text(json.dumps(config))

    model = UniDepthV2.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert model.params is not None

    img = rng.standard_normal((1, 56, 70, 3)).astype(np.float32)
    out = model.encode_decode(model.params, jnp.asarray(img))

    with torch.no_grad():
        out_t = mirror(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(out["depth"])[..., 0], out_t["depth"].numpy()[:, 0],
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["intrinsics"]), out_t["intrinsics"].numpy(),
        rtol=1e-4, atol=1e-3,
    )

    # infer() runs end-to-end on the converted weights
    pred = model.infer(
        rng.integers(0, 255, (1, 60, 90, 3), dtype=np.uint8)
    )
    assert pred["depth"].shape == (1, 60, 90, 1)
    assert np.isfinite(np.asarray(pred["depth"])).all()
