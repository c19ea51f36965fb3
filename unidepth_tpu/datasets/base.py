"""Generic HDF5-backed dataset reader.

Replaces the reference's BaseDataset/ImageDataset class tower
(unidepth/datasets/{base_dataset,image_dataset}.py) with one reader driven
by a ``DatasetSpec``: split txt stored inside the HDF5, encoded image/depth
blobs at node paths, 16-bit or 24-bit packed depth, per-date intrinsics
tables, retry-on-error with a random index (reference
image_dataset.py:161-171). Output samples are numpy dicts consumed by the
pipeline transforms (datasets/pipelines.py) and the loader.
"""

from __future__ import annotations

import copy
import io
import os
from typing import Any

import h5py
import numpy as np
from PIL import Image

from unidepth_tpu.datasets.pipelines import (
    AnnotationMask,
    Compose,
    ContextCrop,
    GaussianBlur,
    KittiCrop,
    PanoCrop,
    PanoRoll,
    RandomColorJitter,
    RandomFlip,
    RandomGamma,
    RandomGrayscale,
)
from unidepth_tpu.datasets.specs import INTRINSICS_TABLES, SPECS, DatasetSpec


def decode_depth(blob: bytes, depth_scale: float) -> np.ndarray:
    """PNG blob -> metric depth (H, W) float32. 3-channel images carry
    24-bit packed depth (reference image_dataset.py:112-121). The unpack +
    scale runs in the native single-pass kernel when available."""
    from unidepth_tpu import native

    img = np.asarray(Image.open(io.BytesIO(blob)))
    if img.ndim == 3:
        return native.unpack24_scale(img, depth_scale)
    if img.dtype == np.uint16:
        return native.scale_u16(img, depth_scale)
    return (img.astype(np.float64) / depth_scale).astype(np.float32)


def decode_rgb(blob: bytes) -> np.ndarray:
    img = Image.open(io.BytesIO(blob))
    return np.asarray(img.convert("RGB"))


class HDF5Dataset:
    """One dataset = HDF5 shard(s) + split + spec metadata."""

    def __init__(
        self,
        spec: DatasetSpec,
        data_root: str | None = None,
        test_mode: bool = False,
        image_shape: tuple[int, int] = (480, 640),
        augmentations: dict | None = None,
        benchmark: bool = False,
        mini: float = 1.0,
    ):
        self.spec = spec
        self.test_mode = test_mode
        self.image_shape = tuple(image_shape)
        self.data_root = data_root or os.environ.get("DATAROOT", ".")
        split = spec.test_split if test_mode else spec.train_split
        if benchmark and spec.benchmark_split:
            split = spec.benchmark_split
        self.split_file = split
        self.samples = self._load_split()
        if mini < 1.0 and not test_mode:
            n = max(1, int(len(self.samples) * mini))
            self.samples = self.samples[:: max(1, len(self.samples) // n)]
        aug = augmentations or {}
        # Fixed transforms applied before the resizer: the KITTI family's
        # benchmark crop (reference kitti.py:92,131 and kitti_rmvd.py:56) or
        # the panoramic pole-trim + roll (reference matterport3d.py:48).
        if spec.pre_crop:
            self.pre_cropper = KittiCrop(crop_size=spec.pre_crop)
        elif spec.pano:
            self.pre_cropper = Compose(
                [PanoCrop(), PanoRoll(test_mode=test_mode)]
            )
        else:
            self.pre_cropper = None
        self.resizer = ContextCrop(
            image_shape=self.image_shape,
            test_context=aug.get("test_context", 1.0),
            test_mode=test_mode,
        )
        self.masker = AnnotationMask(
            min_value=0.0,
            max_value=spec.max_depth if test_mode else None,
            crop=spec.crop if test_mode else None,
        )
        if test_mode:
            self.augmenter = None
        else:
            self.augmenter = Compose(
                [
                    RandomFlip(prob=aug.get("flip_p", 0.5)),
                    RandomColorJitter(
                        strength=aug.get("random_jitter", 0.4),
                        prob=aug.get("jitter_p", 0.8),
                    ),
                    RandomGamma(
                        strength=aug.get("random_gamma", 0.2),
                        prob=aug.get("gamma_p", 0.8),
                    ),
                    GaussianBlur(
                        radius=aug.get("random_blur", 2.0),
                        prob=aug.get("blur_p", 0.2),
                    ),
                    RandomGrayscale(prob=aug.get("grayscale_p", 0.2)),
                ]
            )

    # -- split handling ------------------------------------------------
    def _h5(self, chunk_idx: int = 0) -> h5py.File:
        path = os.path.join(self.data_root, self.spec.hdf5_paths[chunk_idx])
        return h5py.File(path, "r", libver="latest", swmr=True)

    def _load_split(self) -> list[tuple]:
        with self._h5(0) as f:
            raw = np.array(f[self.split_file]).tobytes().decode("ascii").rstrip("\x00")
        samples = []
        for line in raw.strip().split("\n"):
            parts = line.strip().split(" ")
            if len(parts) < 2 or parts[1] == "None":
                continue
            chunk = int(parts[2]) if len(parts) > 2 and parts[2].isdigit() else 0
            samples.append((parts[0], parts[1], chunk))
        return samples

    def __len__(self):
        return len(self.samples)

    # -- intrinsics ----------------------------------------------------
    def _intrinsics_for(self, image_name: str) -> np.ndarray | None:
        if self.spec.intrinsics_table is None:
            return None
        table = INTRINSICS_TABLES[self.spec.intrinsics_table]
        for key, K in table.items():
            if key in image_name:
                return np.asarray(K, np.float32)
        return None

    def _default_K(self) -> np.ndarray:
        h, w = self.image_shape
        return np.asarray(
            [[0.7 * w, 0, 0.5 * w], [0, 0.7 * w, 0.5 * h], [0, 0, 1]], np.float32
        )

    # -- item ----------------------------------------------------------
    def _read(self, idx: int) -> dict:
        image_name, depth_name, chunk = self.samples[idx]
        with self._h5(chunk) as f:
            image = decode_rgb(np.array(f["/" + image_name]).tobytes())
            depth = decode_depth(
                np.array(f["/" + depth_name]).tobytes(), self.spec.depth_scale
            )
        K = self._intrinsics_for(image_name)
        if K is None:
            K = self._default_K()
        return {
            "image": image,
            "depth": depth,
            "K": K,
            "validity": np.ones(depth.shape, bool),
            "flip": False,
            "si": self.spec.si,
            "ssi": self.spec.ssi,
            "dense": self.spec.dense,
            "synthetic": self.spec.synthetic,
            "quality": self.spec.quality,
            "dataset": self.spec.name,
        }

    def read_base(self, idx: int) -> dict | None:
        """Decoded-but-unaugmented sample for num_copies replication (the
        loader decodes once and re-augments per copy). Subclasses whose
        samples are not a single decoded dict return None to opt out."""
        return self._read(idx)

    def get_single_item(
        self, idx: int, rng: np.random.Generator, image_shape=None, base=None
    ) -> dict:
        """``base``: optional pre-read sample (a ``_read(idx)`` result) so
        num_copies replication re-runs only the augmentation pipeline, not
        the HDF5 read + PNG decode (reference base_dataset.py:273 replicates
        the decoded sample). Deep-copied — transforms may mutate arrays."""
        sample = copy.deepcopy(base) if base is not None else self._read(idx)
        if self.pre_cropper is not None:
            sample = self.pre_cropper(sample, rng)
        sample = self.resizer(sample, rng, image_shape=image_shape)
        if np.count_nonzero(sample["depth"] > 0) < 50:
            raise IndexError("too few valid depth points")
        if self.augmenter is not None:
            sample = self.augmenter(sample, rng)
        sample = self.masker(sample, rng)
        return sample

    def __getitem__(self, idx: int) -> dict:
        # eval reproducibility: in test mode the rng is seeded by the index
        # so frame selection (sequence datasets) and error-retry
        # replacement are identical run-to-run and across processes
        rng = np.random.default_rng(idx if self.test_mode else None)
        # fault tolerance: retry with a random index on any error
        for _ in range(8):
            try:
                return self.get_single_item(idx, rng)
            except Exception:
                idx = int(rng.integers(0, len(self.samples)))
        raise RuntimeError(f"{self.spec.name}: failed to load any sample")


def make_dataset(name: str, **kwargs) -> HDF5Dataset:
    """Build the reader matching the spec's kind: sequence-kind specs get
    the SequenceHDF5Dataset (sequences JSON, fps resampling), image-kind
    specs the flat reader."""
    spec = SPECS[name]
    if spec.kind == "sequence":
        from unidepth_tpu.datasets.sequence import SequenceHDF5Dataset

        return SequenceHDF5Dataset(spec, **kwargs)
    return HDF5Dataset(spec, **kwargs)


def _decode_png16_rgb(blob: bytes) -> np.ndarray:
    """Decode a 16-bit-per-channel RGB PNG to (H, W, 3) uint16.

    PIL silently downcasts 16-bit color PNGs to 8 bits, which destroys the
    12-bit flow payload — so the IDAT stream is unfiltered by hand (spec
    filters 0-4; no interlace)."""
    import struct
    import zlib

    assert blob[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, idat, w = 8, b"", 0
    h = bitdepth = color = 0
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, bitdepth, color = struct.unpack(">IIBB", data[:10])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    assert bitdepth == 16 and color == 2, (bitdepth, color)
    from unidepth_tpu import native

    raw = zlib.decompress(idat)
    stride = w * 6  # 3 channels x 2 bytes
    out = native.png_unfilter(raw, h, stride, bpp=6)
    hi = out.reshape(h, w, 3, 2).astype(np.uint16)
    return hi[..., 0] * 256 + hi[..., 1]


def decode_flow(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """16-bit PNG optical flow: channels 0/1 carry (u, v) packed as
    (value / 2^4 - 2^11) twelve-bit fixed point; channel 2 is validity
    (reference datasets/utils_decode.py:100-122). Returns (flow (H,W,2),
    valid (H,W) bool)."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[24] == 16 and blob[25] == 2:
        img = _decode_png16_rgb(blob).astype(np.float64)
    else:
        img = np.asarray(Image.open(io.BytesIO(blob))).astype(np.float64)
    flow = (img[..., :2] / 2.0**4) - 2.0**11
    valid = img[..., 2] > 0 if img.shape[-1] > 2 else np.ones(img.shape[:2], bool)
    return flow.astype(np.float32), valid
