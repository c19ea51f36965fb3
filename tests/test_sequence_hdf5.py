"""Sequence datasets and per-date intrinsics tables over real (synthetic)
HDF5 shards — the spec metadata paths the round-1 suite never exercised
against actual files (reference sequence_dataset.py:21-150 and
kitti.py:14-50)."""

import io
import json

import h5py
import numpy as np
import pytest
from PIL import Image

from unidepth_tpu.datasets.base import HDF5Dataset
from unidepth_tpu.datasets.sequence import SequenceHDF5Dataset
from unidepth_tpu.datasets.specs import KITTI_INTRINSICS, SPECS, DatasetSpec


def _png(arr, mode=None):
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


def _txt(f, name, text):
    f.create_dataset(name, data=np.frombuffer(text.encode(), np.uint8))


def _make_sequence_shard(tmp_path, n_frames=8, hw=(64, 96)):
    rng = np.random.default_rng(0)
    seqs = {"drive_000": {}}
    with h5py.File(tmp_path / "seq.hdf5", "w") as f:
        for i in range(n_frames):
            img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
            depth16 = rng.integers(500, 60000, hw, dtype=np.uint16)
            f.create_dataset(f"drive_000/rgb_{i}.png", data=_png(img))
            f.create_dataset(f"drive_000/depth_{i}.png", data=_png(depth16, mode="I;16"))
            seqs["drive_000"][str(i)] = {
                "image": f"drive_000/rgb_{i}.png",
                "depth": f"drive_000/depth_{i}.png",
                "K": [[100.0, 0, hw[1] / 2], [0, 100.0, hw[0] / 2], [0, 0, 1]],
                "cam2w": np.eye(4).tolist(),
            }
        # one frame with a full camera-params vector (EUCM-style)
        seqs["drive_000"]["0"]["camera_params"] = [100.0, 100.0, 48.0, 32.0, 0.5, 1.0]
        seqs["drive_000"]["0"]["camera_model"] = "EUCM"
        _txt(f, "train.txt", f"drive_000 {n_frames}\n")
        _txt(f, "sequences.json", json.dumps(seqs))
    return DatasetSpec(
        name="FakeSeq", kind="sequence", min_depth=0.01, max_depth=80.0,
        depth_scale=1000.0, hdf5_paths=("seq.hdf5",),
        train_split="train.txt", test_split="train.txt",
    )


def test_sequence_dataset_multiframe_window(tmp_path):
    spec = _make_sequence_shard(tmp_path)
    ds = SequenceHDF5Dataset(
        spec, data_root=str(tmp_path), image_shape=(56, 84),
        num_frames=3, fps_range=(1, 5),
    )
    assert len(ds) == 1
    rng = np.random.default_rng(0)
    frames = ds.get_single_item(0, rng)
    assert isinstance(frames, list) and len(frames) == 3
    for s in frames:
        assert s["image"].shape == (56, 84, 3)
        assert s["depth"].shape == (56, 84)
        assert np.isfinite(s["K"]).all()
        assert "cam2w" in s

    # single-frame mode returns a bare sample
    ds1 = SequenceHDF5Dataset(
        spec, data_root=str(tmp_path), image_shape=(56, 84), num_frames=1
    )
    s = ds1.get_single_item(0, rng)
    assert isinstance(s, dict)

    # a window longer than the sequence is rejected (retry machinery upstream)
    ds9 = SequenceHDF5Dataset(
        spec, data_root=str(tmp_path), image_shape=(56, 84), num_frames=9
    )
    with pytest.raises(IndexError):
        ds9._frame_indices(8, rng)


def test_sequence_fps_resampling_strides(tmp_path):
    spec = _make_sequence_shard(tmp_path, n_frames=20)
    ds = SequenceHDF5Dataset(
        spec, data_root=str(tmp_path), image_shape=(56, 84),
        num_frames=4, fps_range=(1, 5), test_mode=True,
    )
    rng = np.random.default_rng(0)
    # test mode: max fps (= default 5) -> stride 1, contiguous window
    idxs = ds._frame_indices(20, rng)
    assert idxs == [idxs[0] + i for i in range(4)]
    # train mode: strides stay within bounds and indices in range
    ds.test_mode = False
    for _ in range(10):
        idxs = ds._frame_indices(20, rng)
        assert len(idxs) == 4 and all(0 <= i < 20 for i in idxs)
        assert all(b >= a for a, b in zip(idxs, idxs[1:]))


def test_sequence_camera_params_flow_through(tmp_path):
    spec = _make_sequence_shard(tmp_path)
    ds = SequenceHDF5Dataset(
        spec, data_root=str(tmp_path), image_shape=(56, 84), num_frames=1,
        test_mode=True,
    )
    meta = ds.sequences["drive_000"]["0"]
    s = ds._read_frame("drive_000", meta)
    assert s["camera_model"] == "EUCM"
    assert s["camera_params"].shape == (6,)
    np.testing.assert_allclose(s["K"][0, 0], 100.0)


def test_kitti_per_date_intrinsics_lookup(tmp_path):
    """A KITTI-layout shard whose image names carry drive dates must pick
    the per-date K from the intrinsics table (reference kitti.py:14-50)."""
    rng = np.random.default_rng(0)
    hw = (60, 80)
    date = "2011_09_26"
    with h5py.File(tmp_path / "kitti.hdf5", "w") as f:
        img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        depth16 = rng.integers(500, 60000, hw, dtype=np.uint16)
        f.create_dataset(f"rgb/{date}_drive_0001/0.png", data=_png(img))
        f.create_dataset(f"depth/{date}_drive_0001/0.png", data=_png(depth16, mode="I;16"))
        f.create_dataset(f"rgb/unknown_drive/0.png", data=_png(img))
        f.create_dataset(f"depth/unknown_drive/0.png", data=_png(depth16, mode="I;16"))
        _txt(
            f,
            "train.txt",
            f"rgb/{date}_drive_0001/0.png depth/{date}_drive_0001/0.png\n"
            "rgb/unknown_drive/0.png depth/unknown_drive/0.png\n",
        )
    spec = SPECS["KITTI"]
    spec = DatasetSpec(
        **{**spec.__dict__, "hdf5_paths": ("kitti.hdf5",),
           "train_split": "train.txt", "test_split": "train.txt",
           "pre_crop": None}
    )
    assert spec.intrinsics_table == "kitti_dates"
    ds = HDF5Dataset(spec, data_root=str(tmp_path), image_shape=(56, 70))
    raw = ds._read(0)
    np.testing.assert_allclose(
        raw["K"], np.asarray(KITTI_INTRINSICS[date], np.float32)
    )
    # names with no table match fall back to the default K
    raw2 = ds._read(1)
    assert raw2["K"][0, 0] != KITTI_INTRINSICS[date][0][0]


def test_specs_metadata_is_coherent():
    """Registry-wide sanity: every spec's kind/splits/depth bounds are
    usable (guards against typos in the 81-row declarative table)."""
    assert len(SPECS) >= 70
    for spec in SPECS.values():
        assert spec.kind in ("image", "sequence"), spec.name
        assert spec.min_depth < spec.max_depth, spec.name
        assert spec.depth_scale > 0, spec.name
        assert spec.hdf5_paths and spec.train_split and spec.test_split, spec.name
        if spec.intrinsics_table:
            from unidepth_tpu.datasets.specs import INTRINSICS_TABLES

            assert spec.intrinsics_table in INTRINSICS_TABLES, spec.name
