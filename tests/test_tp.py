"""Tensor parallelism: Megatron-style column/row kernel sharding over the
mesh's ``tp`` axis (parallel/mesh.py:tp_param_sharding).

The reference has no TP at all (NCCL DDP only, scripts/train.py:131-136);
this is TPU-added capability. Correctness bar: the sharding rules land on
the intended axes (column modules shard the output dim, row modules the
contraction dim, opt-state moments mirror their param), a jitted forward
with a tp>1 layout matches the replicated forward numerically, and a full
train step runs with all three mesh axes live.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unidepth_tpu.models.unidepthv2.model import UniDepthV2
from unidepth_tpu.parallel.mesh import (
    make_mesh,
    pin_state_sharding,
    tp_param_sharding,
    virtual_mesh_exec_ok,
)
from unidepth_tpu.training.optim import build_optimizer
from unidepth_tpu.training.step import make_train_step

CFG = json.loads(
    (Path(__file__).resolve().parents[1] / "configs/config_v2_vits14.json").read_text()
)


def _leaves_by_path(tree):
    out = {}

    def visit(path, x):
        out["/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)] = x
        return x

    jax.tree_util.tree_map_with_path(visit, tree)
    return out


def _build(h=28, w=28):
    cfg = json.loads(json.dumps(CFG))
    model = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    params = model.init_params(seed=0, image_shape=(h, w))
    return model, params, cfg


def test_tp_spec_rules():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=2, fsdp=2, tp=2)
    model, params, _ = _build()
    specs = {p: s.spec for p, s in _leaves_by_path(tp_param_sharding(mesh, params)).items()}

    # column-parallel: output (last) dim on tp; fsdp fills the largest
    # remaining divisible axis. Scanned ViT kernels are (L, in, out).
    assert specs["encoder/stage_0/qkv/kernel"] == P(None, "fsdp", "tp")
    assert specs["encoder/stage_0/fc1/kernel"] == P(None, "fsdp", "tp")
    assert specs["encoder/stage_0/qkv/bias"] == P(None, "tp")
    # row-parallel: contraction (second-to-last) dim on tp; bias replicated
    # (added once after the all-reduced partial sums).
    assert specs["encoder/stage_0/fc2/kernel"] == P(None, "tp", "fsdp")
    assert specs["encoder/stage_0/proj/kernel"][-2] == "tp"
    assert "tp" not in (specs["encoder/stage_0/fc2/bias"] or ())
    # decoder attention stacks use the same module names unscanned
    assert specs["decoder/camera_layer/aggregate1/kv/kernel"][-1] == "tp"
    assert specs["decoder/camera_layer/aggregate1/out/kernel"][-2] == "tp"
    # non-matching leaves fall back to the shape-driven fsdp rule
    assert "tp" not in (specs["encoder/pos_embed"] or ())

    # the path-matched rules give Adam moments the same layout as the param
    opt = build_optimizer(
        params, warmup_iters=2, total_iters=10, num_encoder_layers=model.encoder_cfg.depth
    )
    opt_specs = _leaves_by_path(tp_param_sharding(mesh, opt.init(params)))
    hits = 0
    for path, s in opt_specs.items():
        for suffix, pspec in specs.items():
            if path.endswith(suffix):
                assert s.spec == pspec, (path, s.spec, pspec)
                hits += 1
                break
    assert hits > 50


@pytest.mark.slow
def test_tp_forward_matches_replicated():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=2, fsdp=2, tp=2)
    model, params, _ = _build()
    h = w = 28
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, h, w, 3)), jnp.float32
    )

    ref = jax.jit(model.encode_decode)(params, img)

    sh_params = jax.device_put(params, tp_param_sharding(mesh, params))
    sh_img = jax.device_put(img, NamedSharding(mesh, P(("data", "fsdp"))))
    out = jax.jit(model.encode_decode)(sh_params, sh_img)

    # tolerance: tp changes only the reduction order of fp32 contractions,
    # but depth passes through exp() which amplifies ulp-level drift
    np.testing.assert_allclose(
        np.asarray(ref["depth"]), np.asarray(out["depth"]), rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
def test_tp_train_step_runs():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=2, fsdp=2, tp=2)
    model, params, cfg = _build()
    h = w = 28
    opt = build_optimizer(
        params, warmup_iters=2, total_iters=10, num_encoder_layers=model.encoder_cfg.depth
    )
    init_state, train_step = make_train_step(model, opt, cfg)
    state = init_state(params)
    state = state._replace(
        params=jax.device_put(state.params, tp_param_sharding(mesh, state.params)),
        opt_state=jax.device_put(state.opt_state, tp_param_sharding(mesh, state.opt_state)),
        ema=jax.device_put(state.ema, tp_param_sharding(mesh, state.ema)),
    )

    from unidepth_tpu.geometry.cameras import Pinhole

    rng = np.random.default_rng(0)
    K = jnp.asarray([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])
    rays1 = np.asarray(Pinhole.from_K(K).get_rays(h, w)).reshape(1, 1, h * w, 3)
    accum, b = 1, 8
    batch = {
        "image": rng.standard_normal((accum, b, h, w, 3)).astype(np.float32),
        "depth": rng.uniform(0.5, 10, (accum, b, h, w, 1)).astype(np.float32),
        "depth_mask": np.ones((accum, b, h, w, 1), bool),
        "validity_mask": np.ones((accum, b, h, w, 1), np.float32),
        "K": np.broadcast_to(np.asarray(K, np.float32), (accum, b, 3, 3)).copy(),
        "rays": np.broadcast_to(rays1, (accum, b, h * w, 3)).copy(),
        "si": np.zeros((accum, b), np.float32),
        "flips": np.zeros((accum, b), bool),
    }
    bshard = NamedSharding(mesh, P(None, ("data", "fsdp")))
    batch = {k: jax.device_put(jnp.asarray(v), bshard) for k, v in batch.items()}
    # pinned like scripts/train.py: output state keeps the input layout
    step = pin_state_sharding(train_step, state)
    compiled = jax.jit(step).lower(state, batch, jax.random.key(0)).compile()
    # tp layout survives the step on a representative kernel — checked on
    # the compiled output shardings, so it holds even when execution is
    # skipped below
    out_shardings, _ = compiled.output_shardings
    qkv_sharding = out_shardings.params["encoder"]["stage_0"]["qkv"]["kernel"]
    flat = [
        n
        for e in qkv_sharding.spec
        if e is not None
        for n in (e if isinstance(e, tuple) else (e,))
    ]
    assert "tp" in flat, qkv_sharding.spec
    if virtual_mesh_exec_ok():
        new_state, metrics = compiled(state, batch, jax.random.key(0))
        assert np.isfinite(float(metrics["total"]))
