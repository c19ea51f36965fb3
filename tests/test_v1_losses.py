"""V1 loss recipe over fabricated model outputs (cheap, model-free)."""

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from unidepth_tpu.training.losses import build_losses
from unidepth_tpu.training.step import compute_losses_v1


def test_compute_losses_v1(rng):
    cfg = json.loads(
        (Path(__file__).resolve().parents[1] / "configs/train_v1_vitl14.json").read_text()
    )
    losses = build_losses(cfg)
    assert set(losses) == {"depth", "camera", "invariance"}

    b, h, w = 4, 28, 28
    gh, gw = 2, 2
    depth_gt = rng.uniform(1, 10, (b, h, w, 1)).astype(np.float32)
    outputs = {
        "depth": jnp.asarray(depth_gt * rng.uniform(0.9, 1.1, depth_gt.shape).astype(np.float32)),
        "rays": jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32)),
        "depth_features": jnp.asarray(rng.standard_normal((b, gh, gw, 8)).astype(np.float32)),
    }
    rays_gt = rng.standard_normal((b, h * w, 3)).astype(np.float32)
    rays_gt /= np.linalg.norm(rays_gt, axis=-1, keepdims=True)
    batch = {
        "depth": jnp.asarray(depth_gt),
        "depth_mask": jnp.ones((b, h, w, 1), bool),
        "rays": jnp.asarray(rays_gt),
        "K": jnp.broadcast_to(
            jnp.asarray([[[60.0, 0, 14], [0, 60.0, 14], [0, 0, 1]]]), (b, 3, 3)
        ),
        "si": jnp.zeros(b),
        "flips": jnp.zeros(b, bool),
    }
    out = jax.jit(lambda o, bt: compute_losses_v1(losses, o, bt, jax.random.key(0)))(
        outputs, batch
    )
    for k in ("depth", "camera", "invariance", "total"):
        assert np.isfinite(float(out[k])), k
    assert float(out["total"]) > 0
