"""Sharded training step on the virtual 8-device CPU mesh."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unidepth_tpu.models.unidepthv2.model import UniDepthV2
from unidepth_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from unidepth_tpu.training.optim import build_optimizer
from unidepth_tpu.training.step import make_train_step

CFG = json.loads(
    (Path(__file__).resolve().parents[1] / "configs/config_v2_vits14.json").read_text()
)


def _tiny_batch(rng, accum, b, h, w):
    img = rng.standard_normal((accum, b, h, w, 3)).astype(np.float32)
    depth = rng.uniform(0.5, 10, (accum, b, h, w, 1)).astype(np.float32)
    mask = np.ones((accum, b, h, w, 1), bool)
    K = np.broadcast_to(
        np.array([[[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]]], np.float32),
        (accum, b, 3, 3),
    ).copy()
    from unidepth_tpu.geometry.cameras import Pinhole

    cam = Pinhole.from_K(jnp.asarray(K[0, 0]))
    rays1 = np.asarray(cam.get_rays(h, w)).reshape(1, 1, h * w, 3)
    rays = np.broadcast_to(rays1, (accum, b, h * w, 3)).copy()
    return {
        "image": img,
        "depth": depth,
        "depth_mask": mask,
        "validity_mask": mask.astype(np.float32),
        "K": K,
        "rays": rays,
        "si": np.zeros((accum, b), np.float32),
        "flips": np.zeros((accum, b), bool),
    }


@pytest.mark.slow
def test_train_step_runs_and_descends():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=8)
    cfg = json.loads(json.dumps(CFG))
    model = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    model.shape_constraints["pixels_min"] = 1000
    model.shape_constraints["pixels_max"] = 4000
    h = w = 28
    params = model.init_params(seed=0, image_shape=(h, w))
    opt = build_optimizer(
        params,
        lr=1e-4,
        warmup_iters=2,
        total_iters=10,
        num_encoder_layers=model.encoder_cfg.depth,
    )
    init_state, train_step = make_train_step(model, opt, cfg)
    state = init_state(params)

    # shard: params replicated, batch on data axis (micro dim inside)
    state = jax.device_put(state, replicated(mesh))
    rng = np.random.default_rng(0)
    batch = _tiny_batch(rng, accum=2, b=8, h=h, w=w)
    bshard = NamedSharding(mesh, P(None, ("data", "fsdp")))
    batch = {k: jax.device_put(jnp.asarray(v), bshard) for k, v in batch.items()}

    step = jax.jit(train_step)
    key = jax.random.key(0)
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["total"]))
    assert int(state.step) == 3
    assert all(np.isfinite(losses))
    # same batch re-fed: the loss should decrease across steps
    assert losses[-1] < losses[0], losses
