"""Stochastic depth (DropPath) and num_copies replication.

Reference behaviours covered: metadinov2/block.py:103-105 (drop_path on
both residual branches at train time, linear per-block ramp
dinov2.py:204-205) and base_dataset.py:273 replicate + train.py:185
(num_copies=2 pairs with independent augmentations feeding SelfDistill,
configs/train_v1_vitl14.json data.num_copies)."""

import io
import json
from pathlib import Path

import h5py
import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from unidepth_tpu.datasets.base import HDF5Dataset
from unidepth_tpu.datasets.loader import Loader, WeightedConcat
from unidepth_tpu.datasets.specs import DatasetSpec
from unidepth_tpu.models.backbones.dinov2 import DinoViT, ViTConfig

ROOT = Path(__file__).resolve().parents[1]


def test_drop_path_stochastic_at_train_deterministic_at_eval(rng):
    cfg = ViTConfig(
        embed_dim=32, depth=2, num_heads=2, pos_embed_size=4,
        output_idx=(2,), use_norm=False, drop_path_rate=0.5,
    )
    vit = DinoViT(cfg=cfg, dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((4, 28, 28, 3)), jnp.float32)
    variables = vit.init(jax.random.key(0), img)

    def run(train, seed=0):
        feats, _ = vit.apply(
            variables, img, train, rngs={"droppath": jax.random.key(seed)}
        )
        return np.asarray(feats[0])

    eval_out = np.asarray(vit.apply(variables, img)[0][0])
    # eval (and train=False) is deterministic and ignores the rng
    np.testing.assert_array_equal(run(False, 0), eval_out)
    np.testing.assert_array_equal(run(False, 1), eval_out)
    # train: different rngs -> different drop masks -> different outputs
    a, b = run(True, 0), run(True, 1)
    assert not np.array_equal(a, b)
    # per-sample drop: at least one sample equals the undropped path for
    # some seed is probabilistic — instead check outputs stay finite and
    # differ from eval (rate 0.5 over 4 blocks-residuals is near-certain)
    assert np.isfinite(a).all()
    assert not np.array_equal(a, eval_out)


def test_convnext_drop_path_stochastic_at_train(rng):
    """ConvNeXt backbones get the same stochastic-depth treatment as the
    ViTs (reference passes drop_path into the timm ConvNeXt,
    reference encoder.py:133); before round 2 a config drop_path was
    silently ignored on the convnext branch."""
    from unidepth_tpu.models.backbones.convnext import ConvNeXt, ConvNeXtConfig

    cfg = ConvNeXtConfig(
        depths=(2, 2), dims=(16, 32), drop_path_rate=0.5
    )
    net = ConvNeXt(cfg=cfg, dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), img)

    def run(train, seed=0):
        feats, _ = net.apply(
            variables, img, train, rngs={"droppath": jax.random.key(seed)}
        )
        return np.asarray(feats[-1])

    eval_out = np.asarray(net.apply(variables, img)[0][-1])
    np.testing.assert_array_equal(run(False, 0), eval_out)
    a, b = run(True, 0), run(True, 1)
    assert not np.array_equal(a, b)
    assert np.isfinite(a).all()
    assert not np.array_equal(a, eval_out)

    # the V1 model picks the rate up from the config for convnext encoders
    from unidepth_tpu.models.unidepthv1.model import UniDepthV1

    v1cfg = json.loads((ROOT / "configs/config_v1_cnvnxtl.json").read_text())
    v1cfg = json.loads(json.dumps(v1cfg))
    v1cfg.setdefault("training", {})["drop_path"] = 0.2
    model = UniDepthV1.from_config(v1cfg, dtype=jnp.float32)
    assert model.drop_path_rate == 0.2


def _fake_hdf5(tmp_path, n=6, hw=(80, 100)):
    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "fake.hdf5", "w") as f:
        lines = []
        for i in range(n):
            img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
            depth16 = rng.integers(500, 60000, hw, dtype=np.uint16)
            buf = io.BytesIO(); Image.fromarray(img).save(buf, format="PNG")
            f.create_dataset(f"rgb/{i}.png", data=np.frombuffer(buf.getvalue(), np.uint8))
            buf = io.BytesIO(); Image.fromarray(depth16, mode="I;16").save(buf, format="PNG")
            f.create_dataset(f"depth/{i}.png", data=np.frombuffer(buf.getvalue(), np.uint8))
            lines.append(f"rgb/{i}.png depth/{i}.png")
        f.create_dataset(
            "train.txt", data=np.frombuffer(("\n".join(lines) + "\n").encode(), np.uint8)
        )
    spec = DatasetSpec(
        name="Fake", kind="image", min_depth=0.01, max_depth=80.0,
        depth_scale=1000.0, hdf5_paths=("fake.hdf5",),
        train_split="train.txt", test_split="train.txt",
    )
    return HDF5Dataset(spec, data_root=str(tmp_path), image_shape=(56, 70))


def test_num_copies_interleaves_same_base_sample(tmp_path):
    ds = _fake_hdf5(tmp_path)
    seen = []
    reads = []
    orig = ds.get_single_item
    orig_read = ds._read

    def spy(idx, rng, image_shape=None, base=None):
        seen.append(idx)
        return orig(idx, rng, image_shape=image_shape, base=base)

    def spy_read(idx):
        reads.append(idx)
        return orig_read(idx)

    ds.get_single_item = spy
    ds._read = spy_read
    loader = Loader(
        WeightedConcat([ds]), batch_size=4, accum=1, num_threads=0,
        num_copies=2, seed=0,
    )
    batch = next(iter(loader))
    assert batch["image"].shape[0] == 4
    # copies are adjacent (SelfDistill pairing layout) and share the index
    assert len(seen) == 4
    assert seen[0] == seen[1] and seen[2] == seen[3]
    # independent augmentation draws: the two copies differ
    assert not np.array_equal(batch["image"][0], batch["image"][1])
    # ...but the HDF5 read + PNG decode ran only once per base sample
    # (copies re-run the augmentation pipeline on a deep copy)
    assert len(reads) == 2

    with pytest.raises(ValueError, match="num_copies"):
        Loader(WeightedConcat([ds]), batch_size=3, num_copies=2)


@pytest.mark.slow
def test_train_step_with_droppath_and_num_copies_descends(tmp_path):
    """The VERDICT done-criterion: a train step with drop_path > 0 and the
    num_copies=2 batch layout (SelfDistill active) runs and descends."""
    from unidepth_tpu.models.unidepthv2.model import UniDepthV2
    from unidepth_tpu.training.optim import build_optimizer
    from unidepth_tpu.training.step import make_train_step

    cfg = json.loads((ROOT / "configs/config_v2_vits14.json").read_text())
    cfg["training"]["drop_path"] = 0.2
    model = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    assert model.encoder_cfg.drop_path_rate == 0.2
    h = w = 56
    params = model.init_params(seed=0, image_shape=(h, w))
    opt = build_optimizer(
        params, lr=3e-4, warmup_iters=2, total_iters=20,
        num_encoder_layers=model.encoder_cfg.depth,
    )
    init_state, train_step = make_train_step(model, opt, cfg)
    state = init_state(params)

    ds = _fake_hdf5(tmp_path, hw=(70, 84))
    ds.image_shape = (h, w)
    ds.resizer.image_shape = (h, w)
    loader = Loader(
        WeightedConcat([ds]), batch_size=4, accum=1, num_threads=0,
        num_copies=2, seed=0,
    )
    batch = next(iter(loader))
    batch = {k: jnp.asarray(v)[None] for k, v in batch.items()}  # accum axis

    step = jax.jit(train_step)
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.fold_in(jax.random.key(0), i))
        assert np.isfinite(float(metrics["total"])), metrics
        assert "invariance" in metrics  # SelfDistill saw the pair layout
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0], losses
