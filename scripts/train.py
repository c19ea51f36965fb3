"""Training CLI (reference scripts/train.py re-designed for SPMD).

One process drives all local devices; multi-host runs call
``jax.distributed.initialize`` (replaces torchrun/SLURM + NCCL init).

Usage:
  python scripts/train.py --config-file configs/config_v2_vitl14.json \
      [--data-root $DATAROOT] [--dummy-data] [--steps N]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--dummy-data", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument(
        "--tp",
        type=int,
        default=1,
        help="tensor-parallel degree: Megatron column/row sharding of "
        "attention/MLP kernels over the mesh's innermost axis",
    )
    ap.add_argument("--checkpoint-dir", default="checkpoints")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument(
        "--image-shape",
        type=int,
        nargs=2,
        default=None,
        help="override the training image shape (e.g. smoke tests)",
    )
    ap.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (e.g. 'cpu'); needed because this "
        "container pre-imports jax with JAX_PLATFORMS=axon",
    )
    ap.add_argument(
        "--val-interval",
        type=int,
        default=None,
        help="validate every N steps (default: training.validation_interval "
        "from the config; 0 disables)",
    )
    ap.add_argument(
        "--val-iters",
        type=int,
        default=25,
        help="max batches per val dataset per validation pass",
    )
    args = ap.parse_args()

    import jax

    from unidepth_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unidepth_tpu.datasets.dummy import Dummy
    from unidepth_tpu.datasets.base import make_dataset
    from unidepth_tpu.datasets.loader import Loader, ShapeSampler, WeightedConcat
    from unidepth_tpu.models.unidepthv2.model import UniDepthV2
    from unidepth_tpu.parallel.mesh import (
        initialize_distributed,
        make_mesh,
        fsdp_param_sharding,
        tp_param_sharding,
        check_batch_divisibility,
        use_sharding,
    )
    from unidepth_tpu.training.optim import build_optimizer
    from unidepth_tpu.training.step import make_train_step
    from unidepth_tpu.io.checkpoint import save_checkpoint, load_train_checkpoint

    initialize_distributed()
    config = json.loads(Path(args.config_file).read_text())
    tr = config["training"]

    mesh = make_mesh(fsdp=args.fsdp, tp=args.tp)
    n_dev = len(jax.devices())
    print(f"devices: {n_dev}, mesh: {dict(mesh.shape)}")

    # Ambient mesh for the whole run: activation-sharding constraints at the
    # encoder's reshape seams (no involuntary GSPMD rematerialization) and
    # the shard_map'd flash kernel (--tp keeps the Pallas attention kernel;
    # heads shard over the tp axis inside the kernel's shard_map).
    import contextlib

    _mesh_ctx = contextlib.ExitStack()
    _mesh_ctx.enter_context(use_sharding(mesh))

    # Model family follows config model.name (reference train.py resolves the
    # class by string): V1 is a fixed-image-shape model, V2 shape-bucketed.
    model_name = config.get("model", {}).get("name", "UniDepthV2")
    is_v1 = model_name == "UniDepthV1"
    mult = config["data"].get("augmentations", {}).get("shape_constraints", {}).get("shape_mult", 14)
    raw_shape = args.image_shape or config["data"].get("image_shape", (480, 640))
    image_shape = tuple((s // mult) * mult for s in raw_shape)
    if is_v1:
        from unidepth_tpu.models.unidepthv1.model import UniDepthV1

        config = dict(config)
        config.setdefault("data", {})
        config["data"]["image_shape"] = list(image_shape)
        model = UniDepthV1.from_config(config)
        sc = None  # fixed shape: no per-batch shape sampling
        params = model.init_params(seed=args.seed)
    else:
        model = UniDepthV2.from_config(config)
        sc = model.shape_constraints
        params = model.init_params(seed=args.seed, image_shape=(126, 126))

    opt = build_optimizer(
        params,
        lr=tr.get("lr", 1e-4),
        lr_final=tr.get("lr_final", 1e-6),
        encoder_lr=config["model"]["pixel_encoder"].get("lr", 2e-6),
        wd=tr.get("wd", 0.1),
        wd_final=tr.get("wd_final", 0.1),
        warmup_iters=tr.get("warmup_iters", 75000),
        total_iters=tr.get("n_iters", 300000),
        ld=tr.get("ld", 1.0),
        num_encoder_layers=model.encoder_cfg.depth,
        clipping=tr.get("clipping", 1.0),
        cycle_betas=tr.get("cycle_beta", tr.get("cycle_betas", True)),
    )
    if is_v1:
        from unidepth_tpu.training.step import make_train_step_v1

        init_state, train_step = make_train_step_v1(model, opt, config)
    else:
        init_state, train_step = make_train_step(model, opt, config)
    state = init_state(params)
    start_step = 0
    if args.resume:
        state, start_step = load_train_checkpoint(args.resume, state)
        print(f"resumed from {args.resume} at step {start_step}")

    # params, Adam moments, and the EMA shadow all use the same spec
    # (tp column/row rules on attention/MLP kernels when --tp > 1, the
    # shape-driven fsdp rule elsewhere), so mu/nu/shadow land on the same
    # layout as their param.
    param_sharding = tp_param_sharding if args.tp > 1 else fsdp_param_sharding
    state = state._replace(
        params=jax.device_put(state.params, param_sharding(mesh, state.params)),
        opt_state=jax.device_put(
            state.opt_state, param_sharding(mesh, state.opt_state)
        ),
        ema=jax.device_put(state.ema, param_sharding(mesh, state.ema)),
    )
    # Pin the output state to the input layout: GSPMD otherwise picks
    # output shardings by propagation, which can drift from the spec on
    # individual leaves (breaking the opt-like-params invariant) and turns
    # the next call into a fresh jit signature — a recompile every step.
    from unidepth_tpu.parallel.mesh import pin_state_sharding

    step_fn = jax.jit(pin_state_sharding(train_step, state), donate_argnums=(0,))

    # data — fail fast on indivisible batch configs instead of deep inside
    # XLA: the P(None, ("data","fsdp")) batch sharding needs local_bs to
    # divide over the data*fsdp submesh (batch is replicated over tp), and
    # the global batch must split evenly across processes.
    batch_size = tr.get("batch_size", 8)
    accum = tr.get("nsteps_accumulation_gradient", 1)
    local_bs = check_batch_divisibility(
        batch_size, jax.process_count(), n_dev // args.tp
    )
    aug = config["data"].get("augmentations", {})
    if args.dummy_data:
        datasets = [Dummy(image_shape=image_shape, length=1024)]
    else:
        datasets = [
            make_dataset(
                name,
                data_root=args.data_root,
                image_shape=image_shape,
                augmentations=aug,
            )
            for name in config["data"]["train_datasets"]
        ]
    sampler = (
        ShapeSampler(
            {
                "ratio_bounds": tuple(sc["ratio_bounds"]),
                "pixels_min": sc["pixels_min"],
                "pixels_max": sc["pixels_max"],
                "shape_mult": sc.get("shape_mult", 14),
            }
        )
        if sc is not None
        and aug.get("shape_constraints", {}).get("sample", False)
        and not args.dummy_data
        else None
    )
    # Per-batch global shape sampling stays ON under multi-process SPMD:
    # batch n's shape is a pure function of (shape_seed, n) and batches are
    # delivered in ticket order (Loader.shape_for_batch), so every
    # controller traces the identical program shape for the same step —
    # matching the reference's per-batch sample_shape semantics
    # (reference datasets/utils.py:29-53). shape_seed deliberately excludes
    # process_index; sample CONTENT stays process-local via `seed`.
    loader = Loader(
        WeightedConcat(datasets, sampling=config["data"].get("sampling")),
        batch_size=local_bs,
        shape_sampler=sampler,
        accum=accum,
        num_threads=4,
        seed=args.seed + jax.process_index(),
        num_copies=config["data"].get("num_copies", 1),
        shape_seed=args.seed,
    )
    # accum > 1: leaves are (accum, batch, ...) — shard axis 1; accum == 1:
    # the Loader emits flat (batch, ...) — shard axis 0 (train_step promotes
    # the accum axis internally)
    bshard = NamedSharding(
        mesh, P(None, ("data", "fsdp")) if accum > 1 else P(("data", "fsdp"))
    )

    from unidepth_tpu.utils.logging import MetricLogger

    logger = MetricLogger(
        run_name=Path(args.config_file).stem, out_dir=args.checkpoint_dir, config=config
    )

    # periodic validation under EMA params (reference train.py:163-175,
    # 474-475 validates under ema_handle.average_parameters())
    from unidepth_tpu.datasets.loader import collate
    from unidepth_tpu.datasets.samplers import ShardedEvalSampler
    from unidepth_tpu.utils.validation import validate

    val_interval = (
        args.val_interval
        if args.val_interval is not None
        else tr.get("validation_interval", 0)
    )
    val_names = config["data"].get("val_datasets", [])

    # datasets are built once (HDF5 open + split parse); _val_loaders() only
    # wraps fresh single-use batch generators around them per interval
    _val_datasets = {}

    def _val_loaders():
        names = val_names if (val_names and not args.dummy_data) else ["Dummy"]
        out = {}
        for name in names:
            if name not in _val_datasets:
                if name == "Dummy" or args.dummy_data:
                    _val_datasets[name] = Dummy(
                        image_shape=image_shape, length=2 * local_bs
                    )
                else:
                    _val_datasets[name] = make_dataset(
                        name,
                        data_root=args.data_root,
                        test_mode=True,
                        image_shape=image_shape,
                    )
            ds = _val_datasets[name]

            def gen(ds=ds):
                # Every process must launch the SAME number of identically
                # shaped val batches: the jitted forward over the globally
                # sharded EMA params is one SPMD program, so ragged shards
                # (they differ by up to 1 sample) or a ragged remainder
                # batch would hang the collective launch. Pad each shard to
                # the globally agreed count by repeating a sample; padded
                # entries carry pad_mask=False and are dropped from metrics
                # (MetricAccumulator NaN/nanmean path).
                P, p = jax.process_count(), jax.process_index()
                idxs = list(ShardedEvalSampler(len(ds), P, p))
                n_valid = len(idxs)
                max_shard = -(-len(ds) // P)
                n_batches = -(-max_shard // local_bs)
                idxs += [idxs[-1] if idxs else 0] * (
                    n_batches * local_bs - n_valid
                )
                for b in range(n_batches):
                    chunk = idxs[b * local_bs : (b + 1) * local_bs]
                    batch = collate([ds[i] for i in chunk])
                    batch["pad_mask"] = (
                        np.arange(b * local_bs, (b + 1) * local_bs) < n_valid
                    )
                    yield batch

            out[name] = gen()
        return out
    from unidepth_tpu.datasets.loader import device_prefetch

    n_iters = args.steps or tr.get("n_iters", 300000)
    key = jax.random.key(args.seed)

    # compiled once and reused every validation interval (a fresh
    # jax.jit(lambda) per interval would recompile the full forward);
    # batches carry raw 0..255 floats — normalize on device
    from unidepth_tpu.utils.misc import normalize_rgb

    art_forward = jax.jit(
        lambda p, x, r: model.encode_decode(p, normalize_rgb(x), rays_gt=r)
    )

    t0 = time.time()
    batches = device_prefetch(loader, bshard, size=2)
    for step, batch in zip(range(start_step, n_iters), batches):
        if step == start_step:
            print(f"first batch ready at +{time.time() - t0:.0f}s; compiling train step...", flush=True)
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, step))
        if step == start_step:
            jax.block_until_ready(metrics["total"])
            print(f"train step compiled+run at +{time.time() - t0:.0f}s", flush=True)
        if (step + 1) % 50 == 0 or step == start_step:
            m = {k: float(v) for k, v in metrics.items()}
            ema_losses = logger.log(m, step + 1)
            if (step + 1) % 1000 == 0:
                logger.log(logger.memory_stats(), step + 1, prefix="sys")
            rate = (step + 1 - start_step) * batch_size * accum / (time.time() - t0)
            # print only train/ loss keys: the EMA dict also accumulates
            # sys/* and val/* entries once those have been logged
            losses_only = {
                k.split("/", 1)[1]: v
                for k, v in ema_losses.items()
                if k.startswith("train/")
            }
            print(
                f"step {step + 1}: "
                + " ".join(f"{k}={v:.4f}" for k, v in sorted(losses_only.items()))
                + f" | {rate:.1f} img/s"
            )
        if (step + 1) % tr.get("checkpoint_interval", 10000) == 0:
            save_checkpoint(args.checkpoint_dir, state, step + 1)
        if val_interval and (step + 1) % val_interval == 0:
            # image artifacts: rgb / GT / prediction grid for one batch
            # (reference utils/visualization.py:136 log_train_artifacts)
            from unidepth_tpu.utils.visualization import log_train_artifacts

            art_name, art_loader = next(iter(_val_loaders().items()))
            # a per-process val shard smaller than local_bs yields no full
            # batch; skip the artifact quietly rather than StopIteration
            art_batch = next(iter(art_loader), None)
            if art_batch is not None:
                n_cols = min(4, art_batch["image"].shape[0])
                art_out = art_forward(
                    state.ema.shadow,
                    jnp.asarray(art_batch["image"][:n_cols]),
                    jnp.asarray(art_batch["rays"][:n_cols]),
                )
                grid = log_train_artifacts(
                    [np.asarray(art_batch["image"][i]) for i in range(n_cols)],
                    [np.asarray(art_batch["depth"][i]) for i in range(n_cols)],
                    [np.asarray(art_out["depth"][i]) for i in range(n_cols)],
                )
                logger.log_image(f"{art_name}_training", grid, step + 1)

            results = validate(
                model, state.ema.shadow, _val_loaders(), max_iters=args.val_iters
            )
            for name, metrics in results.items():
                logger.log(
                    {f"{name}/{k}": float(v) for k, v in metrics.items()},
                    step + 1,
                    prefix="val",
                )
                shown = sorted(metrics.items())[:6]
                print(
                    f"val[{name}] step {step + 1}: "
                    + " ".join(f"{k}={float(v):.4f}" for k, v in shown)
                )
    loader.close()
    save_checkpoint(args.checkpoint_dir, state, n_iters)
    print("done")


if __name__ == "__main__":
    main()
