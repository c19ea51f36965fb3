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
