"""FSDP layout: optimizer state and the EMA shadow must shard like their
params over the fsdp axis (the whole point of the axis is saving memory on
the Adam moments, which are ~2x param bytes). Also covers the startup
divisibility gate and the fail-fast initialize_distributed contract."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unidepth_tpu.models.unidepthv2.model import UniDepthV2
from unidepth_tpu.parallel import mesh as mesh_mod
from unidepth_tpu.parallel.mesh import (
    check_batch_divisibility,
    fsdp_param_sharding,
    make_mesh,
    pin_state_sharding,
    virtual_mesh_exec_ok,
)
from unidepth_tpu.training.optim import build_optimizer
from unidepth_tpu.training.step import make_train_step

CFG = json.loads(
    (Path(__file__).resolve().parents[1] / "configs/config_v2_vits14.json").read_text()
)


def _param_leaf_index(tree):
    """Map id(leaf array) is useless across trees; key by path string."""
    out = {}

    def visit(path, x):
        out["/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)] = x
        return x

    jax.tree_util.tree_map_with_path(visit, tree)
    return out


@pytest.mark.slow
def test_opt_state_and_ema_shard_like_params():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=4, fsdp=2)
    cfg = json.loads(json.dumps(CFG))
    model = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    h = w = 28
    params = model.init_params(seed=0, image_shape=(h, w))
    opt = build_optimizer(
        params,
        warmup_iters=2,
        total_iters=10,
        num_encoder_layers=model.encoder_cfg.depth,
    )
    init_state, train_step = make_train_step(model, opt, cfg)
    state = init_state(params)

    state = state._replace(
        params=jax.device_put(state.params, fsdp_param_sharding(mesh, state.params)),
        opt_state=jax.device_put(
            state.opt_state, fsdp_param_sharding(mesh, state.opt_state)
        ),
        ema=jax.device_put(state.ema, fsdp_param_sharding(mesh, state.ema)),
    )

    # Every param-shaped leaf of the Adam moments and the EMA shadow must
    # carry the same sharding spec as its parameter (shape-driven layout).
    param_spec = {
        p: s.spec
        for p, s in _param_leaf_index(fsdp_param_sharding(mesh, state.params)).items()
    }
    param_shapes = {p: x.shape for p, x in _param_leaf_index(state.params).items()}

    def norm(spec):
        parts = list(spec)
        while parts and parts[-1] is None:
            parts.pop()
        return tuple(parts)

    def check_tree(tree, what):
        n_sharded = 0
        for path, leaf in _param_leaf_index(tree).items():
            for pname, shape in param_shapes.items():
                if path.endswith(pname) and leaf.shape == shape:
                    assert norm(leaf.sharding.spec) == norm(param_spec[pname]), (
                        what,
                        path,
                        leaf.sharding.spec,
                        param_spec[pname],
                    )
                    if param_spec[pname] != P():
                        n_sharded += 1
                    break
        return n_sharded

    assert check_tree(state.ema.shadow, "ema") > 10
    # opt_state: mu and nu inside scale_by_adam
    assert check_tree(state.opt_state, "opt") > 20

    # and the step still runs with this layout
    rng = np.random.default_rng(0)
    from unidepth_tpu.geometry.cameras import Pinhole

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
    # pin_state_sharding: without it GSPMD propagates gradient shardings
    # into small replicated opt leaves and the output layout drifts from
    # the input spec (recompile flap + broken ZeRO-3 invariant)
    compiled = (
        jax.jit(pin_state_sharding(train_step, state))
        .lower(state, batch, jax.random.key(0))
        .compile()
    )
    # layout is preserved through the step (no silent gather to replicated)
    # — asserted on the compiled output shardings so it holds even when
    # execution is gated off below
    out_shardings, _ = compiled.output_shardings
    n_sharded = 0
    for path, s in _param_leaf_index(out_shardings.opt_state).items():
        for pname, pspec in param_spec.items():
            if path.endswith(pname):
                assert norm(s.spec) == norm(pspec), (path, s.spec, pspec)
                if pspec != P():
                    n_sharded += 1
                break
    assert n_sharded > 20
    # execution gated: XLA:CPU in-process collectives can cyclically
    # deadlock on thread-starved hosts (mesh.py:virtual_mesh_exec_ok)
    if virtual_mesh_exec_ok():
        new_state, metrics = compiled(state, batch, jax.random.key(0))
        assert np.isfinite(float(metrics["total"]))
        assert check_tree(new_state.opt_state, "opt-after") > 20


def test_check_batch_divisibility():
    assert check_batch_divisibility(8, 1, 8) == 8
    assert check_batch_divisibility(32, 2, 8) == 16
    # multi-host at one image/chip: 2 hosts x 16 global devices, batch 16
    # -> local 8. The constraint is GLOBAL batch % GLOBAL devices, so this
    # is valid (the old local_bs % n_dev check wrongly rejected it).
    assert check_batch_divisibility(16, 2, 16) == 8
    with pytest.raises(ValueError, match="not divisible by process_count"):
        check_batch_divisibility(9, 2, 4)
    with pytest.raises(ValueError, match="not divisible by the"):
        check_batch_divisibility(12, 1, 8)
    # no silent inflation: a configured batch smaller than the device count
    # must fail, not quietly run at n_dev images
    with pytest.raises(ValueError, match="not divisible by the"):
        check_batch_divisibility(4, 1, 8)


def test_initialize_distributed_gating(monkeypatch):
    calls = []

    def fake_init(**kw):
        calls.append(kw)
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    for var in (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "SLURM_JOB_ID",
        "OMPI_COMM_WORLD_SIZE",
        "TPU_WORKER_HOSTNAMES",
    ):
        monkeypatch.delenv(var, raising=False)

    # plain single-process: no-op, no swallowed call
    mesh_mod.initialize_distributed()
    assert calls == []

    # single-worker tunnel hostname (what the axon container sets) is not
    # a cluster signal
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    mesh_mod.initialize_distributed()
    assert calls == []
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    with pytest.raises(RuntimeError):
        mesh_mod.initialize_distributed()
    assert len(calls) == 1
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    calls.clear()

    # cluster env present: real failures must propagate
    monkeypatch.setenv("SLURM_JOB_ID", "1234")
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        mesh_mod.initialize_distributed()
    assert len(calls) == 1

    # explicit kwargs count as a cluster request too
    monkeypatch.delenv("SLURM_JOB_ID")
    with pytest.raises(RuntimeError):
        mesh_mod.initialize_distributed(coordinator_address="10.0.0.1:1234")
    assert len(calls) == 2
