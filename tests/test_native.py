"""Native decode kernels vs numpy reference."""

import numpy as np

from unidepth_tpu import native


def test_unpack24_matches_numpy(rng):
    img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    scale = 512.0
    ref = (
        img[..., 2].astype(np.float64)
        + img[..., 1].astype(np.float64) * 255.0
        + img[..., 0].astype(np.float64) * 255.0 * 255.0
    ) / scale
    got = native.unpack24_scale(img, scale)
    np.testing.assert_allclose(got, ref.astype(np.float32), rtol=1e-6)


def test_scale_u16(rng):
    img = rng.integers(0, 65535, (20, 30), dtype=np.uint16)
    got = native.scale_u16(img, 256.0)
    np.testing.assert_allclose(got, img.astype(np.float64) / 256.0, rtol=1e-6)


def test_normalize_u8(rng):
    img = rng.integers(0, 255, (16, 20, 3), dtype=np.uint8)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    got = native.normalize_u8(img, mean, std)
    ref = (img.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(
        std, np.float32
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_fallback_paths(rng, monkeypatch):
    # force the numpy fallback and check identical results
    img = rng.integers(0, 255, (8, 9, 3), dtype=np.uint8)
    fast = native.unpack24_scale(img, 1000.0)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    slow = native.unpack24_scale(img, 1000.0)
    np.testing.assert_allclose(fast, slow, rtol=1e-6)


def test_png_unfilter_c_matches_numpy(rng, monkeypatch):
    """All five PNG filter types reconstruct identically in C and numpy."""
    h, stride, bpp = 9, 30, 6
    rows = []
    for y in range(h):
        rows.append(
            bytes([y % 5]) + rng.integers(0, 256, stride, dtype=np.uint8).tobytes()
        )
    raw = b"".join(rows)
    fast = native.png_unfilter(raw, h, stride, bpp)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    slow = native.png_unfilter(raw, h, stride, bpp)
    assert np.array_equal(fast, slow)
