"""Native host-side kernels (C, ctypes-bound; numpy fallback).

Build happens lazily at first import with the system compiler into
``~/.cache/unidepth_tpu``; every entry point degrades to numpy when the
toolchain is unavailable, so the package never hard-depends on it.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("depth_decode.c")
_LIB = None
_TRIED = False


def _build() -> ctypes.CDLL | None:
    global _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        src = _SRC.read_bytes()
        tag = hashlib.sha1(src).hexdigest()[:12]
        cache = Path(os.environ.get("UNIDEPTH_NATIVE_CACHE", Path.home() / ".cache/unidepth_tpu"))
        cache.mkdir(parents=True, exist_ok=True)
        so = cache / f"depth_decode_{tag}.so"
        if not so.exists():
            cc = os.environ.get("CC", "cc")
            subprocess.run(
                [cc, "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(so)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.unpack24_scale.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
        ]
        lib.scale_u16.argtypes = [
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
        ]
        lib.normalize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.png_unfilter.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        globals()["_LIB"] = lib
        return lib
    except Exception:
        return None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def unpack24_scale(img: np.ndarray, depth_scale: float) -> np.ndarray:
    """(H, W, 3) uint8 packed depth -> (H, W) float32 metric depth."""
    lib = _build()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if lib is None:
        v = (
            img[..., 2].astype(np.float64)
            + img[..., 1].astype(np.float64) * 255.0
            + img[..., 0].astype(np.float64) * 255.0 * 255.0
        )
        return (v / depth_scale).astype(np.float32)
    out = np.empty(img.shape[:2], np.float32)
    lib.unpack24_scale(
        _ptr(img, ctypes.c_uint8), _ptr(out, ctypes.c_float),
        out.size, 1.0 / depth_scale,
    )
    return out


def scale_u16(img: np.ndarray, depth_scale: float) -> np.ndarray:
    lib = _build()
    img = np.ascontiguousarray(img, dtype=np.uint16)
    if lib is None:
        return (img.astype(np.float64) / depth_scale).astype(np.float32)
    out = np.empty(img.shape, np.float32)
    lib.scale_u16(
        _ptr(img, ctypes.c_uint16), _ptr(out, ctypes.c_float),
        out.size, 1.0 / depth_scale,
    )
    return out


def normalize_u8(img: np.ndarray, mean, std) -> np.ndarray:
    """(H, W, 3) uint8 -> normalized float32 (fused /255, -mean, /std)."""
    lib = _build()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if lib is None:
        x = img.astype(np.float32) / 255.0
        return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    out = np.empty(img.shape, np.float32)
    m = np.asarray(mean, np.float32)
    si = (1.0 / np.asarray(std, np.float32)).astype(np.float32)
    lib.normalize_u8(
        _ptr(img, ctypes.c_uint8), _ptr(out, ctypes.c_float),
        img.shape[0] * img.shape[1], _ptr(m, ctypes.c_float), _ptr(si, ctypes.c_float),
    )
    return out


def png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct PNG scanlines (filters 0-4) -> (h, stride) uint8.
    Numpy fallback vectorizes filters 0/2 and scans Sub/Average/Paeth."""
    lib = _build()
    if lib is not None:
        src = np.frombuffer(raw, np.uint8, count=h * (stride + 1))
        src = np.ascontiguousarray(src)
        out = np.empty((h, stride), np.uint8)
        lib.png_unfilter(
            _ptr(src, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
            h, stride, bpp,
        )
        return out
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], np.uint8
        ).astype(np.uint16)
        if f == 0:
            cur = line
        elif f == 2:
            cur = (line + prev) & 0xFF
        else:
            cur = np.zeros(stride, np.uint16)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = int(a) + int(b) - int(c)
                    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pr) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out
