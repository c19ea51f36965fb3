"""Full-fidelity training rehearsal on the virtual mesh (VERDICT r2 #8).

Drives ``scripts/train.py`` — the real CLI, not the bare step function —
end-to-end over synthetic HDF5 shards: grad-accum 2, fsdp=2 sharding,
periodic validation, checkpoint write, simulated crash (resume from the
mid-run snapshot, discarding later progress), and exact state
continuation. This is the last integration seam between
loader -> step -> checkpoint that unit tests cannot cover.
"""

import io
import json
import os
import subprocess
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest
from PIL import Image

ROOT = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.slow


def _png(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


def _write_shards(root: Path, n=10, hw=(80, 100)):
    """Synthetic IBims-layout shard (spec: ibims.hdf5 + ibims_val.txt,
    uint16 depth at depth_scale=1000)."""
    rng = np.random.default_rng(0)
    h, w = hw
    with h5py.File(root / "ibims.hdf5", "w") as f:
        lines = []
        for i in range(n):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            depth16 = rng.integers(500, 20000, (h, w), dtype=np.uint16)
            f.create_dataset(f"rgb/{i}.png", data=_png(img))
            f.create_dataset(f"depth/{i}.png", data=_png(depth16))
            lines.append(f"rgb/{i}.png depth/{i}.png")
        f.create_dataset(
            "ibims_val.txt",
            data=np.frombuffer(("\n".join(lines) + "\n").encode(), np.uint8),
        )


def _train_config():
    cfg = json.loads((ROOT / "configs/config_v2_vits14.json").read_text())
    cfg["training"] = {
        **cfg.get("training", {}),
        "batch_size": 8,
        "nsteps_accumulation_gradient": 2,
        "checkpoint_interval": 3,
        "validation_interval": 3,
        "warmup_iters": 2,
        "n_iters": 6,
        "lr": 1e-4,
    }
    # Shrink the architecture through the config's preset-override fields
    # (from_config reads explicit pixel_encoder keys over the named preset):
    # the rehearsal exercises the loader->step->checkpoint->resume seam, not
    # model scale, and a full ViT-S SPMD train-step compile takes >25 min on
    # the single-core CI host.
    cfg["model"]["pixel_encoder"].update(
        {"embed_dim": 64, "depth": 4, "num_heads": 2, "output_idx": [1, 2, 3, 4]}
    )
    cfg["model"]["pixel_decoder"].update({"hidden_dim": 64, "out_dim": 16})
    cfg["model"]["num_heads"] = 2
    cfg.setdefault("data", {})
    # Pin the batch shape: with the config's default ``sample: true`` the
    # loader draws a fresh global shape inside pixels [200k, 600k] per
    # batch, so every step would trace (and on this 1-core host spend ~10
    # minutes compiling) a new half-megapixel train step — the 28x28
    # override below would never apply past the sampler.
    cfg["data"].setdefault("augmentations", {}).setdefault(
        "shape_constraints", {}
    )["sample"] = False
    cfg["data"]["train_datasets"] = ["IBims"]
    cfg["data"]["val_datasets"] = ["IBims"]
    # 28x28: the smallest /14-multiple shape
    cfg["data"]["image_shape"] = [28, 28]
    return cfg


def _run(args, cwd):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env.setdefault("JAX_PLATFORMS", "cpu")
    return subprocess.run(
        [sys.executable, str(ROOT / "scripts/train.py"), *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )


def test_train_cli_rehearsal_with_crash_resume(tmp_path):
    _write_shards(tmp_path)
    cfg_p = tmp_path / "train_cfg.json"
    cfg_p.write_text(json.dumps(_train_config()))
    ckpt_dir = tmp_path / "ckpt"

    common = [
        "--config-file", str(cfg_p),
        "--data-root", str(tmp_path),
        "--platform", "cpu",
        "--fsdp", "2",
        "--checkpoint-dir", str(ckpt_dir),
        "--val-iters", "1",
        "--image-shape", "28", "28",
    ]
    # phase 1: run to step 4 — the interval checkpoint lands at step 3,
    # the final save at 4; treat everything past step 3 as lost to a crash
    r1 = _run([*common, "--steps", "4"], tmp_path)
    assert r1.returncode == 0, r1.stderr[-4000:] + r1.stdout[-2000:]
    assert (ckpt_dir / "step_00000003").exists(), r1.stdout[-2000:]
    assert "val[IBims]" in r1.stdout, "periodic validation did not run"

    # phase 2: resume from the crash snapshot, continue to step 6
    r2 = _run(
        [*common, "--steps", "6", "--resume", str(ckpt_dir / "step_00000003")],
        tmp_path,
    )
    assert r2.returncode == 0, r2.stderr[-4000:] + r2.stdout[-2000:]
    assert "resumed from" in r2.stdout and "at step 3" in r2.stdout
    assert (ckpt_dir / "step_00000006").exists()

    # state continuation: the step counter and EMA update count advanced by
    # exactly the 3 resumed steps, and params actually moved
    import jax

    jax.config.update("jax_platforms", "cpu")

    from unidepth_tpu.io.checkpoint import _ckptr

    s3 = _ckptr().restore((ckpt_dir / "step_00000003").absolute())
    s6 = _ckptr().restore((ckpt_dir / "step_00000006").absolute())
    assert int(s3["step"]) == 3 and int(s6["step"]) == 6
    # TrainState leaves: [params..., opt..., ema shadow..., num_updates, step]
    # num_updates is the second-to-last leaf of the flattened state
    n3, n6 = int(s3["leaves"][-2]), int(s6["leaves"][-2])
    assert n6 - n3 == 3, (n3, n6)
    moved = sum(
        1
        for a, b in zip(s3["leaves"], s6["leaves"])
        if np.asarray(a).shape == np.asarray(b).shape
        and not np.array_equal(np.asarray(a), np.asarray(b))
    )
    assert moved > 20, f"only {moved} leaves changed across resumed steps"
