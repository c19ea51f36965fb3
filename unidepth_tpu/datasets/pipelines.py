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


def resize_nearest_nd(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest resize for (H, W, C) float maps PIL can't hold (points,
    flow): pixel-center index gather."""
    h, w = arr.shape[:2]
    th, tw = size
    ri = np.clip(((np.arange(th) + 0.5) * h / th).astype(int), 0, h - 1)
    ci = np.clip(((np.arange(tw) + 0.5) * w / tw).astype(int), 0, w - 1)
    return arr[ri][:, ci]


@dataclasses.dataclass
class Compose:
    transforms: Sequence

    def __call__(self, sample, rng):
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


def _crop_with_padding(arr: np.ndarray, top: int, left: int, height: int, width: int, fill=0):
    """Crop a window that may extend beyond the array; out-of-image regions
    are filled (reference ContextCrop.crop, transforms.py:1181-1194)."""
    h, w = arr.shape[:2]
    out_shape = (height, width) + arr.shape[2:]
    out = np.full(out_shape, fill, dtype=arr.dtype)
    y0, y1 = max(top, 0), min(top + height, h)
    x0, x1 = max(left, 0), min(left + width, w)
    if y1 > y0 and x1 > x0:
        out[y0 - top : y1 - top, x0 - left : x1 - left] = arr[y0:y1, x0:x1]
    return out


@dataclasses.dataclass
class ContextCrop:
    """Context crop + resize into the target shape
    (reference transforms.py:1131-1355):

      * ``ctx`` >= 1 zooms OUT — the crop window is larger than the image
        and the borders become padded/invalid context; ctx < 1 zooms in;
      * the window matches the target aspect, stays (jittered-)centered,
        and is retried with ``ctx *= 0.96`` until >=50% of the window is
        real pixels and the implied FOV stays under 150 degrees;
      * image resampled bicubic+antialias; depth/validity nearest (valid-
        preserving); the camera is cropped then uniformly rescaled.
    """

    image_shape: tuple[int, int]
    train_ctx_range: tuple[float, float] = (0.5, 1.5)
    test_context: float = 1.0
    keep_original: bool = False
    test_mode: bool = False
    shape_mult: int = 14
    max_fov_deg: float = 150.0

    def _crop_shapes(self, image_shape, target, ctx):
        """(reference _get_crop_shapes, transforms.py:1211-1245)."""
        h, w = image_shape
        th, tw = target
        input_ratio = w / h
        output_ratio = tw / th
        if output_ratio <= input_ratio:
            if ctx >= 1:
                new_w = w * ctx**0.5
            elif output_ratio / input_ratio * ctx > 1:
                new_w = w * ctx
            else:
                new_w = w * (ctx * output_ratio / input_ratio) ** 0.5
            new_h = new_w / output_ratio
        else:
            if ctx >= 1:
                new_h = h * ctx**0.5
            elif input_ratio / output_ratio * ctx > 1:
                new_h = h * ctx
            else:
                new_h = h * (ctx * input_ratio / output_ratio) ** 0.5
            new_w = new_h * output_ratio
        import math

        return int(math.ceil(new_h - 0.5)), int(math.ceil(new_w - 0.5))

    def __call__(self, sample, rng: np.random.Generator, image_shape=None):
        h, w = sample["image"].shape[:2]
        # per-call shape override: the loader samples a global shape per
        # batch and worker threads must not mutate shared state
        th, tw = image_shape if image_shape is not None else self.image_shape
        ctx = (
            self.test_context
            if self.test_mode
            else float(rng.uniform(*self.train_ctx_range))
        )
        K = sample["K"]
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        max_fov = np.deg2rad(self.max_fov_deg)

        height = width = top = left = 0
        for _ in range(100):
            height, width = self._crop_shapes((h, w), (th, tw), ctx)
            top = (h - height) // 2
            left = (w - width) // 2
            if not self.test_mode:
                jit = self.shape_mult // 2
                left += int(rng.integers(-jit, jit + 1))
                top += int(rng.integers(-jit, jit + 1))
            pad_l = max(-left, 0)
            pad_t = max(-top, 0)
            pad_r = max(left + width - w, 0)
            pad_b = max(top + height - h, 0)
            valid_area = (
                h * w / (h + pad_t + pad_b) / (w + pad_l + pad_r)
            )
            new_hfov = 2.0 * np.arctan(cx / fx * width / w)
            new_vfov = 2.0 * np.arctan(cy / fy * height / h)
            if valid_area >= 0.5 and new_hfov < max_fov and new_vfov < max_fov:
                break
            ctx *= 0.96  # zoom in until enough real pixels / FOV ok

        zoom = th / height

        sample["image"] = resize_image(
            _crop_with_padding(sample["image"], top, left, height, width),
            (th, tw),
            mode="bicubic",
        )
        if "depth" in sample:
            d = _crop_with_padding(sample["depth"], top, left, height, width)
            sample["depth"] = resize_depth(d, (th, tw))
        v = sample.get("validity", np.ones((h, w), bool))
        v = _crop_with_padding(v.astype(np.uint8), top, left, height, width)
        sample["validity"] = resize_depth(v, (th, tw)).astype(bool)
        # optional dense maps: 3D point maps ride like depth; flow vectors
        # additionally scale with the zoom (pixel displacements)
        if "points" in sample:
            p = _crop_with_padding(sample["points"], top, left, height, width)
            sample["points"] = resize_nearest_nd(p, (th, tw))
        for fk in ("flow_fwd", "flow_bwd"):
            if fk in sample:
                fl = _crop_with_padding(sample[fk], top, left, height, width)
                sample[fk] = resize_nearest_nd(fl, (th, tw)) * (th / height)
            mk = fk + "_mask"
            if mk in sample:
                m = _crop_with_padding(
                    sample[mk].astype(np.uint8), top, left, height, width
                )
                sample[mk] = resize_depth(m, (th, tw)).astype(bool)

        K = K.copy()
        K[0, 2] -= left
        K[1, 2] -= top
        K[:2] *= zoom
        sample["K"] = K
        update_camera_params(
            sample,
            crop=(left, top, w - (left + width), h - (top + height)),
            factor=zoom,
        )
        sample["paddings"] = (
            int(pad_l * zoom), int(pad_r * zoom), int(pad_t * zoom), int(pad_b * zoom)
        )
        return sample


def update_camera_params(sample, *, crop=None, factor=None, flip_w=None):
    """Keep a full camera parameter vector in sync with the pipeline's K
    edits (samples from datasets with distorted/panoramic cameras carry
    ``camera_params``/``camera_model``). Generic models shift/scale
    params[:4] exactly like CameraBase.crop/resize; Spherical additionally
    tracks W/H/hfov/vfov (geometry/cameras.py Spherical.crop/resize,
    reference utils/camera.py:331-409).

    crop = (left, top, right, bottom) in current pixels; factor = isotropic
    resize factor; flip_w = image width for a horizontal flip.
    """
    cp = sample.get("camera_params")
    if cp is None:
        return
    cp = cp.copy()
    spherical = sample.get("camera_model") == "Spherical"
    if crop is not None:
        left, top, right, bottom = crop
        cp[2] -= left
        cp[3] -= top
        if spherical and cp.shape[0] >= 8:
            W, H = cp[4], cp[5]
            cp[6] *= (W - left - right) / W
            cp[7] *= (H - top - bottom) / H
            cp[4] -= left + right
            cp[5] -= top + bottom
    if factor is not None:
        cp[: 6 if spherical else 4] *= factor
    if flip_w is not None:
        cp[2] = flip_w - cp[2]
        # x-even distortion terms flip sign under the mirror (p2, s1, s2
        # for OpenCV/Fisheye624 at indices 11-13, p2 for MEI at 7); the
        # reference instead TRUNCATES flipped cameras to fx/fy/cx/cy
        # (utils/camera.py:100-110), corrupting them outright
        model = sample.get("camera_model")
        if model in ("OpenCV", "Fisheye624") and cp.shape[0] >= 14:
            cp[11] = -cp[11]
            cp[12] = -cp[12]
            cp[13] = -cp[13]
        elif model == "MEI" and cp.shape[0] >= 8:
            cp[7] = -cp[7]
    sample["camera_params"] = cp


@dataclasses.dataclass
class RandomFlip:
    prob: float = 0.5

    def __call__(self, sample, rng):
        if rng.random() < self.prob:
            sample["image"] = sample["image"][:, ::-1].copy()
            if "paddings" in sample:
                # the border pads mirror with the image: left <-> right
                pl_, pr_, pt_, pb_ = sample["paddings"]
                sample["paddings"] = (pr_, pl_, pt_, pb_)
            if "depth" in sample:
                sample["depth"] = sample["depth"][:, ::-1].copy()
            if "validity" in sample:
                sample["validity"] = sample["validity"][:, ::-1].copy()
            # dense GT maps ride like depth; flow u (and point-map x) flips
            # sign under a horizontal mirror (reference transforms.py:142-148
            # hflips every gt_field and negates the flow u component)
            if "points" in sample:
                p = sample["points"][:, ::-1].copy()
                p[..., 0] = -p[..., 0]
                sample["points"] = p
            for fk in ("flow_fwd", "flow_bwd"):
                if fk in sample:
                    fl = sample[fk][:, ::-1].copy()
                    fl[..., 0] = -fl[..., 0]
                    sample[fk] = fl
                if fk + "_mask" in sample:
                    sample[fk + "_mask"] = sample[fk + "_mask"][:, ::-1].copy()
            K = sample["K"].copy()
            K[0, 2] = sample["image"].shape[1] - K[0, 2]
            sample["K"] = K
            update_camera_params(sample, flip_w=sample["image"].shape[1])
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
        if h < ch or w < cw:
            raise ValueError(
                f"KittiCrop: image ({h}, {w}) smaller than crop {self.crop_size}"
            )
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
        update_camera_params(
            sample, crop=(left, top, w - (left + cw), h - (top + ch))
        )
        return sample


_IMAGENET_FILL = (124, 116, 104)  # reference transforms.py:503 img_fill_val


def _rotate_sample(sample, angle: float):
    """Nearest-neighbour rotation of image (ImageNet-mean fill) and
    depth/validity (zero fill), reference transforms.py:525-555."""
    img = _to_pil(sample["image"]).rotate(
        angle, resample=Image.NEAREST, fillcolor=_IMAGENET_FILL
    )
    sample["image"] = np.asarray(img)
    for k in ("depth", "validity"):
        if k in sample:
            arr = sample[k]
            rot = Image.fromarray(arr.astype(np.float32)).rotate(
                angle, resample=Image.NEAREST, fillcolor=0.0
            )
            sample[k] = np.asarray(rot).astype(arr.dtype)
    return sample


@dataclasses.dataclass
class Rotate:
    """Random rotation by ±angle (or a uniform draw from a range); depth and
    validity rotate with zero fill so rotated-in borders drop out of the
    loss (reference transforms.py:501-568)."""

    angle: float | tuple[float, float] = 5.0
    prob: float = 0.5

    def __call__(self, sample, rng):
        if rng.random() > self.prob:
            return sample
        if isinstance(self.angle, (int, float)):
            a = float(rng.choice([-1.0, 1.0])) * self.angle
        else:
            a = float(rng.uniform(self.angle[0], self.angle[1]))
        sample = _rotate_sample(sample, a)
        sample["rotation"] = a
        return sample


def _enhance(sample, enhancer, factor: float):
    img = enhancer(_to_pil(sample["image"])).enhance(factor)
    sample["image"] = np.asarray(img)
    return sample


@dataclasses.dataclass
class _LevelPhotometric:
    """Shared shape of the standalone photometric transforms: the level is
    log2 of the enhancement factor (reference transforms.py:592-762 use
    ``factor = 2 ** level``)."""

    level: float | tuple[float, float] = (-0.5, 0.5)
    prob: float = 0.5

    def _factor(self, rng) -> float:
        lv = (
            float(rng.uniform(self.level[0], self.level[1]))
            if not isinstance(self.level, (int, float))
            else float(self.level)
        )
        return 2.0**lv


class RandomSaturation(_LevelPhotometric):
    def __call__(self, sample, rng):
        if rng.random() > self.prob:
            return sample
        return _enhance(sample, ImageEnhance.Color, self._factor(rng))


class RandomSharpness(_LevelPhotometric):
    def __call__(self, sample, rng):
        if rng.random() > self.prob:
            return sample
        return _enhance(sample, ImageEnhance.Sharpness, self._factor(rng))


class RandomBrightness(_LevelPhotometric):
    def __call__(self, sample, rng):
        if rng.random() > self.prob:
            return sample
        return _enhance(sample, ImageEnhance.Brightness, self._factor(rng))


class RandomContrast(_LevelPhotometric):
    def __call__(self, sample, rng):
        if rng.random() > self.prob:
            return sample
        return _enhance(sample, ImageEnhance.Contrast, self._factor(rng))


@dataclasses.dataclass
class RandomColor:
    """Random hue rotation: ``level`` is the fraction of the full hue cycle,
    as in torchvision's adjust_hue (reference transforms.py:570-589)."""

    level: float | tuple[float, float] = (-0.05, 0.05)
    prob: float = 0.5

    def __call__(self, sample, rng):
        if rng.random() > self.prob:
            return sample
        f = (
            float(rng.uniform(self.level[0], self.level[1]))
            if not isinstance(self.level, (int, float))
            else float(self.level)
        )
        hsv = np.asarray(_to_pil(sample["image"]).convert("HSV")).copy()
        hsv[..., 0] = (hsv[..., 0].astype(np.int16) + int(f * 255)) % 256
        sample["image"] = np.asarray(Image.fromarray(hsv, "HSV").convert("RGB"))
        return sample


@dataclasses.dataclass
class RandomInvert:
    """Invert pixel values (reference transforms.py:764-775)."""

    prob: float = 0.5

    def __call__(self, sample, rng):
        if rng.random() > self.prob:
            return sample
        sample["image"] = 255 - sample["image"]
        return sample


@dataclasses.dataclass
class RandomAutoContrast:
    """Per-channel histogram stretch (reference transforms.py:777-790)."""

    prob: float = 0.5

    def __call__(self, sample, rng):
        if rng.random() > self.prob:
            return sample
        sample["image"] = np.asarray(ImageOps.autocontrast(_to_pil(sample["image"])))
        return sample


@dataclasses.dataclass
class RandomShear:
    """Random horizontal/vertical shear; image gets ImageNet-mean fill,
    depth/validity zero fill (reference transforms.py:793-863)."""

    magnitude: float | tuple[float, float] = (-0.2, 0.2)
    prob: float = 0.5
    horizontal: bool = True

    def __call__(self, sample, rng):
        if rng.random() > self.prob:
            return sample
        m = (
            float(rng.uniform(self.magnitude[0], self.magnitude[1]))
            if not isinstance(self.magnitude, (int, float))
            else float(self.magnitude) * float(rng.choice([-1.0, 1.0]))
        )
        coeffs = (1, m, 0, 0, 1, 0) if self.horizontal else (1, 0, 0, m, 1, 0)
        h, w = sample["image"].shape[:2]
        img = _to_pil(sample["image"]).transform(
            (w, h), Image.AFFINE, coeffs, resample=Image.NEAREST,
            fillcolor=_IMAGENET_FILL,
        )
        sample["image"] = np.asarray(img)
        for k in ("depth", "validity"):
            if k in sample:
                arr = sample[k]
                t = Image.fromarray(arr.astype(np.float32)).transform(
                    (w, h), Image.AFFINE, coeffs, resample=Image.NEAREST, fillcolor=0.0
                )
                sample[k] = np.asarray(t).astype(arr.dtype)
        return sample


@dataclasses.dataclass
class RandomTranslate:
    """Random pixel shift by a fraction of the image size; shifted-in
    borders are filled (image: ImageNet mean, depth/validity: 0), reference
    transforms.py:866-960."""

    magnitude: float | tuple[float, float] = (-0.1, 0.1)
    prob: float = 0.5
    horizontal: bool = True

    def __call__(self, sample, rng):
        if rng.random() > self.prob:
            return sample
        m = (
            float(rng.uniform(self.magnitude[0], self.magnitude[1]))
            if not isinstance(self.magnitude, (int, float))
            else float(self.magnitude) * float(rng.choice([-1.0, 1.0]))
        )
        h, w = sample["image"].shape[:2]
        dx = int(m * w) if self.horizontal else 0
        dy = 0 if self.horizontal else int(m * h)
        coeffs = (1, 0, -dx, 0, 1, -dy)
        img = _to_pil(sample["image"]).transform(
            (w, h), Image.AFFINE, coeffs, resample=Image.NEAREST,
            fillcolor=_IMAGENET_FILL,
        )
        sample["image"] = np.asarray(img)
        for k in ("depth", "validity"):
            if k in sample:
                arr = sample[k]
                t = Image.fromarray(arr.astype(np.float32)).transform(
                    (w, h), Image.AFFINE, coeffs, resample=Image.NEAREST, fillcolor=0.0
                )
                sample[k] = np.asarray(t).astype(arr.dtype)
        return sample


@dataclasses.dataclass
class PanoCrop:
    """Trim the polar bands of an equirectangular panorama: drop
    ``crop_v * H`` rows from the top and bottom and shift the principal
    point with the crop (reference transforms.py:15-55; composed before the
    resizer by the panoramic datasets, e.g. matterport3d.py:48)."""

    crop_v: float = 0.1

    def __call__(self, sample, rng):
        h = sample["image"].shape[0]
        t = int(h * self.crop_v)
        for k in ("image", "depth", "validity"):
            if k in sample:
                sample[k] = sample[k][t : h - t]
        K = sample["K"].copy()
        K[1, 2] -= t
        sample["K"] = K
        update_camera_params(sample, crop=(0, t, 0, t))
        return sample


@dataclasses.dataclass
class PanoRoll:
    """Random horizontal roll of a 360° panorama — a lossless augmentation
    on equirectangular images (reference transforms.py:58-74). Train-time
    only; the camera is unchanged (the roll is a yaw rotation)."""

    roll: tuple[float, float] = (-0.5, 0.5)
    test_mode: bool = False

    def __call__(self, sample, rng):
        if self.test_mode:
            return sample
        w = sample["image"].shape[1]
        r = int(rng.integers(int(w * self.roll[0]), int(w * self.roll[1]) + 1))
        for k in ("image", "depth", "validity"):
            if k in sample:
                sample[k] = np.roll(sample[k], r, axis=1)
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
