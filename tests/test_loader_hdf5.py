"""Loader over a real (fake) HDF5 dataset with shape sampling — the full
train data path end-to-end."""

import io

import h5py
import numpy as np
from PIL import Image

from unidepth_tpu.datasets.base import HDF5Dataset
from unidepth_tpu.datasets.loader import Loader, ShapeSampler, WeightedConcat
from unidepth_tpu.datasets.specs import DatasetSpec


def _png(arr, mode=None):
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


def test_loader_over_hdf5_with_shape_sampling(tmp_path):
    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "fake.hdf5", "w") as f:
        lines = []
        for i in range(6):
            img = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
            depth16 = rng.integers(500, 60000, (80, 100), dtype=np.uint16)
            f.create_dataset(f"rgb/{i}.png", data=_png(img))
            f.create_dataset(f"depth/{i}.png", data=_png(depth16, mode="I;16"))
            lines.append(f"rgb/{i}.png depth/{i}.png")
        f.create_dataset(
            "train.txt", data=np.frombuffer(("\n".join(lines) + "\n").encode(), np.uint8)
        )
    spec = DatasetSpec(
        name="Fake", kind="image", min_depth=0.01, max_depth=80.0,
        depth_scale=1000.0, hdf5_paths=("fake.hdf5",),
        train_split="train.txt", test_split="train.txt",
    )
    ds = HDF5Dataset(spec, data_root=str(tmp_path), image_shape=(56, 70))
    sampler = ShapeSampler(
        {"ratio_bounds": (1.0, 1.5), "pixels_min": 3000, "pixels_max": 6000, "shape_mult": 14},
        num_shapes=3, seed=1,
    )
    loader = Loader(
        WeightedConcat([ds]), batch_size=3, shape_sampler=sampler, accum=1,
        num_threads=2, prefetch=2,
    )
    it = iter(loader)
    shapes = set()
    for _ in range(4):
        batch = next(it)
        h, w = batch["image"].shape[1:3]
        assert h % 14 == 0 and w % 14 == 0
        shapes.add((h, w))
        assert batch["depth"].shape == (3, h, w, 1)
        assert np.isfinite(batch["rays"]).all()
        # camera follows the crop: cx within the crop width
        assert (batch["K"][:, 0, 2] > 0).all() and (batch["K"][:, 0, 2] < w).all()
    loader.close()
    assert len(shapes) >= 1  # shape sampling produced consistent batches


def test_spec_flags_and_pre_crop_flow_into_batches(tmp_path):
    """Per-dataset annotation flags (si/ssi/dense/quality, reference
    base_dataset.py:294-297) ride sample dicts into collated batches, and
    ``pre_crop`` applies the fixed KITTI-style crop before the resizer
    (reference kitti.py:92,131)."""
    rng = np.random.default_rng(1)
    with h5py.File(tmp_path / "fake.hdf5", "w") as f:
        lines = []
        for i in range(3):
            img = rng.integers(0, 255, (90, 120, 3), dtype=np.uint8)
            depth16 = rng.integers(500, 60000, (90, 120), dtype=np.uint16)
            f.create_dataset(f"rgb/{i}.png", data=_png(img))
            f.create_dataset(f"depth/{i}.png", data=_png(depth16, mode="I;16"))
            lines.append(f"rgb/{i}.png depth/{i}.png")
        f.create_dataset(
            "train.txt", data=np.frombuffer(("\n".join(lines) + "\n").encode(), np.uint8)
        )
    spec = DatasetSpec(
        name="FakeFlags", kind="image", min_depth=0.01, max_depth=80.0,
        depth_scale=1000.0, hdf5_paths=("fake.hdf5",),
        train_split="train.txt", test_split="train.txt",
        si=True, ssi=False, dense=True, quality=2, pre_crop=(70, 100),
    )
    ds = HDF5Dataset(spec, data_root=str(tmp_path), image_shape=(56, 70))
    sample = ds.get_single_item(0, np.random.default_rng(0))
    assert sample["si"] is True and sample["dense"] is True
    assert sample["quality"] == 2
    loader = Loader(WeightedConcat([ds]), batch_size=2, num_threads=0)
    batch = next(iter(loader))
    assert batch["si"].tolist() == [1.0, 1.0]
    assert batch["ssi"].tolist() == [0.0, 0.0]
    assert batch["dense"].tolist() == [1.0, 1.0]
    assert batch["quality"].tolist() == [2, 2]
    loader.close()

    # pre_crop geometry: cropping (90,120)->(70,100) keeps bottom rows,
    # centers columns, and shifts the principal point accordingly.
    raw = ds._read(0)
    cropped = ds.pre_cropper(dict(raw), np.random.default_rng(0))
    assert cropped["image"].shape[:2] == (70, 100)
    assert cropped["K"][0, 2] == raw["K"][0, 2] - 10  # (120-100)//2
    assert cropped["K"][1, 2] == raw["K"][1, 2] - 20  # 90-70
