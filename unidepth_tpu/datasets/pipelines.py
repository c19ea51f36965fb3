"""Host-side data transforms (numpy/PIL), the TPU analogue of the
reference's mmcv-style pipeline (unidepth/datasets/pipelines/transforms.py).

Design: augmentation runs on the host CPU in numpy (the TPU only ever sees
fixed-shape normalized batches), each transform is a callable over a
``sample`` dict with keys:
  image (H, W, 3) uint8 | depth (H, W) float32 | K (3, 3) float32
  mask/validity (H, W) bool | flip: bool | si: bool
Cameras are updated alongside pixels exactly as in the reference
(flip moves cx, crop shifts the principal point, resize scales fx/fy).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps


def _to_pil(img: np.ndarray) -> Image.Image:
    return Image.fromarray(img)


def resize_image(img: np.ndarray, size: tuple[int, int], mode="bilinear") -> np.ndarray:
    """(H, W[, C]) -> size (h, w) resize via PIL (antialiased)."""
    resample = {
        "bilinear": Image.BILINEAR,
        "nearest": Image.NEAREST,
        "bicubic": Image.BICUBIC,
    }[mode]
    arr = Image.fromarray(img)
    out = arr.resize((size[1], size[0]), resample=resample)
    return np.asarray(out)


def resize_depth(depth: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize preserving sparse validity."""
    return resize_image(depth, size, mode="nearest")


@dataclasses.dataclass
class Compose:
    transforms: Sequence

    def __call__(self, sample, rng):
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


@dataclasses.dataclass
class ContextCrop:
    """Random (train) / centered (test) context crop + resize into the
    target shape, updating the camera (reference transforms.py:1131-1355
    behaviour: sample a crop of the source image whose aspect matches the
    target, with scale jitter ``random_scale``, then resize)."""

    image_shape: tuple[int, int]
    train_ctx_range: tuple[float, float] = (0.66, 1.5)
    test_context: float = 1.0
    keep_original: bool = False
    test_mode: bool = False

    def __call__(self, sample, rng: np.random.Generator, image_shape=None):
        h, w = sample["image"].shape[:2]
        # per-call shape override: the loader samples a global shape per
        # batch and worker threads must not mutate shared state
        th, tw = image_shape if image_shape is not None else self.image_shape
        target_ratio = tw / th
        # largest crop with the target aspect ratio that fits the source
        crop_w = min(w, int(round(h * target_ratio)))
        crop_h = min(h, int(round(crop_w / target_ratio)))
        crop_w = int(round(crop_h * target_ratio))
        if self.test_mode:
            ctx = self.test_context
        else:
            ctx = float(rng.uniform(*self.train_ctx_range))
        crop_h = min(h, max(8, int(round(crop_h / ctx))))
        crop_w = min(w, max(8, int(round(crop_w / ctx))))
        if self.test_mode:
            top = (h - crop_h) // 2
            left = (w - crop_w) // 2
        else:
            top = int(rng.integers(0, h - crop_h + 1))
            left = int(rng.integers(0, w - crop_w + 1))

        scale_y = th / crop_h
        scale_x = tw / crop_w

        img = sample["image"][top : top + crop_h, left : left + crop_w]
        sample["image"] = resize_image(img, (th, tw))
        if "depth" in sample:
            d = sample["depth"][top : top + crop_h, left : left + crop_w]
            sample["depth"] = resize_depth(d, (th, tw))
        if "validity" in sample:
            v = sample["validity"][top : top + crop_h, left : left + crop_w]
            sample["validity"] = resize_depth(v.astype(np.uint8), (th, tw)).astype(bool)
        K = sample["K"].copy()
        K[0, 2] -= left
        K[1, 2] -= top
        K[0] *= scale_x
        K[1] *= scale_y
        sample["K"] = K
        return sample


@dataclasses.dataclass
class RandomFlip:
    prob: float = 0.5

    def __call__(self, sample, rng):
        if rng.random() < self.prob:
            sample["image"] = sample["image"][:, ::-1].copy()
            if "depth" in sample:
                sample["depth"] = sample["depth"][:, ::-1].copy()
            if "validity" in sample:
                sample["validity"] = sample["validity"][:, ::-1].copy()
            K = sample["K"].copy()
            K[0, 2] = sample["image"].shape[1] - K[0, 2]
            sample["K"] = K
            sample["flip"] = not sample.get("flip", False)
        return sample


@dataclasses.dataclass
class RandomColorJitter:
    strength: float = 0.4
    prob: float = 0.8

    def __call__(self, sample, rng):
        if rng.random() >= self.prob:
            return sample
        img = _to_pil(sample["image"])
        for enhancer in (
            ImageEnhance.Brightness,
            ImageEnhance.Contrast,
            ImageEnhance.Color,
        ):
            f = 1.0 + float(rng.uniform(-self.strength, self.strength))
            img = enhancer(img).enhance(f)
        sample["image"] = np.asarray(img)
        return sample


@dataclasses.dataclass
class RandomGamma:
    strength: float = 0.2
    prob: float = 0.8

    def __call__(self, sample, rng):
        if rng.random() >= self.prob:
            return sample
        gamma = 1.0 + float(rng.uniform(-self.strength, self.strength))
        x = sample["image"].astype(np.float32) / 255.0
        sample["image"] = (np.power(x, gamma) * 255.0).clip(0, 255).astype(np.uint8)
        return sample


@dataclasses.dataclass
class GaussianBlur:
    radius: float = 2.0
    prob: float = 0.2

    def __call__(self, sample, rng):
        if rng.random() >= self.prob:
            return sample
        r = float(rng.uniform(0.1, self.radius))
        img = _to_pil(sample["image"]).filter(ImageFilter.GaussianBlur(r))
        sample["image"] = np.asarray(img)
        return sample


@dataclasses.dataclass
class RandomGrayscale:
    prob: float = 0.2

    def __call__(self, sample, rng):
        if rng.random() >= self.prob:
            return sample
        g = np.asarray(ImageOps.grayscale(_to_pil(sample["image"])))
        sample["image"] = np.repeat(g[..., None], 3, axis=-1)
        return sample


@dataclasses.dataclass
class KittiCrop:
    """Bottom-center crop to the KITTI benchmark size
    (reference transforms.py:272)."""

    crop_size: tuple[int, int] = (352, 1216)

    def __call__(self, sample, rng):
        h, w = sample["image"].shape[:2]
        ch, cw = self.crop_size
        top = h - ch
        left = (w - cw) // 2
        sample["image"] = sample["image"][top : top + ch, left : left + cw]
        if "depth" in sample:
            sample["depth"] = sample["depth"][top : top + ch, left : left + cw]
        if "validity" in sample:
            sample["validity"] = sample["validity"][top : top + ch, left : left + cw]
        K = sample["K"].copy()
        K[0, 2] -= left
        K[1, 2] -= top
        sample["K"] = K
        return sample


@dataclasses.dataclass
class AnnotationMask:
    """Validity mask from depth range + optional eval crop
    (reference pipelines/formating.py:70, garg/eigen crops kitti.py:146-162).
    """

    min_value: float = 0.0
    max_value: float | None = None
    crop: str | None = None  # None | 'garg' | 'eigen'

    def __call__(self, sample, rng):
        d = sample.get("depth")
        if d is None:
            return sample
        m = d > self.min_value
        if self.max_value is not None:
            m &= d <= self.max_value
        if self.crop is not None:
            h, w = d.shape[:2]
            cm = np.zeros_like(m)
            if self.crop == "garg":
                cm[
                    int(0.40810811 * h) : int(0.99189189 * h),
                    int(0.03594771 * w) : int(0.96405229 * w),
                ] = True
            elif self.crop == "eigen":
                cm[
                    int(0.3324324 * h) : int(0.91351351 * h),
                    int(0.03594771 * w) : int(0.96405229 * w),
                ] = True
            m &= cm
        sample["depth_mask"] = m
        return sample


@dataclasses.dataclass
class Normalize:
    mean: tuple[float, float, float]
    std: tuple[float, float, float]

    def __call__(self, sample, rng):
        x = sample["image"].astype(np.float32) / 255.0
        x = (x - np.asarray(self.mean, np.float32)) / np.asarray(self.std, np.float32)
        sample["image_norm"] = x
        return sample


@dataclasses.dataclass
class RandomSolarize:
    prob: float = 0.1
    threshold: int = 128

    def __call__(self, sample, rng):
        if rng.random() >= self.prob:
            return sample
        sample["image"] = np.asarray(
            ImageOps.solarize(_to_pil(sample["image"]), threshold=self.threshold)
        )
        return sample


@dataclasses.dataclass
class RandomPosterize:
    prob: float = 0.1
    bits: int = 4

    def __call__(self, sample, rng):
        if rng.random() >= self.prob:
            return sample
        sample["image"] = np.asarray(
            ImageOps.posterize(_to_pil(sample["image"]), bits=self.bits)
        )
        return sample


@dataclasses.dataclass
class RandomEqualize:
    prob: float = 0.1

    def __call__(self, sample, rng):
        if rng.random() >= self.prob:
            return sample
        sample["image"] = np.asarray(ImageOps.equalize(_to_pil(sample["image"])))
        return sample


@dataclasses.dataclass
class RandomMasking:
    """Zero out random square patches of the image (reference
    transforms.py:336): augmentation robustness to occlusions."""

    prob: float = 0.2
    mask_ratio: float = 0.1
    patch: int = 16

    def __call__(self, sample, rng):
        if rng.random() >= self.prob:
            return sample
        img = sample["image"].copy()
        h, w = img.shape[:2]
        n = int(self.mask_ratio * (h * w) / self.patch**2)
        for _ in range(n):
            y = int(rng.integers(0, max(1, h - self.patch)))
            x = int(rng.integers(0, max(1, w - self.patch)))
            img[y : y + self.patch, x : x + self.patch] = 0
        sample["image"] = img
        return sample


@dataclasses.dataclass
class RandomFiller:
    """Fill padded (invalid) border regions with noise/black/white/zero
    (reference transforms.py:1358). Operates where validity is False."""

    modes: tuple[str, ...] = ("noise", "black", "white")

    def __call__(self, sample, rng):
        v = sample.get("validity")
        if v is None or v.all():
            return sample
        img = sample["image"].copy()
        mode = self.modes[int(rng.integers(0, len(self.modes)))]
        inv = ~v
        if mode == "noise":
            img[inv] = rng.integers(0, 255, (int(inv.sum()), 3), dtype=np.uint8)
        elif mode == "white":
            img[inv] = 255
        else:
            img[inv] = 0
        sample["image"] = img
        return sample


def masked_nearest_fill(depth: np.ndarray, mask: np.ndarray, iters: int = 2) -> np.ndarray:
    """Propagate valid depth into invalid neighbors (cheap approximation of
    reference masked_nearest_interpolation, transforms.py:1046)."""
    d = depth.copy()
    m = mask.copy()
    for _ in range(iters):
        if m.all():
            break
        shifted = [
            (np.roll(d, s, axis=a), np.roll(m, s, axis=a))
            for a in (0, 1)
            for s in (1, -1)
        ]
        acc = np.zeros_like(d)
        cnt = np.zeros_like(d)
        for sd, sm in shifted:
            acc += np.where(sm, sd, 0.0)
            cnt += sm.astype(d.dtype)
        fill = np.divide(acc, np.maximum(cnt, 1), out=np.zeros_like(d))
        new = ~m & (cnt > 0)
        d[new] = fill[new]
        m = m | new
    return d
