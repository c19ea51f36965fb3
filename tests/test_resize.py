"""Parity of ops.resize against torch.nn.functional.interpolate.

This is the highest-risk numerical surface in the rebuild (SURVEY.md §7
"hard parts" #1), so we test the full mode matrix on random inputs.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unidepth_tpu.ops.resize import flat_interpolate, resize

pytestmark = pytest.mark.smoke


def _torch_resize(x_nchw, size, mode, align_corners, antialias):
    kwargs = {}
    if mode in ("bilinear", "bicubic"):
        kwargs["align_corners"] = align_corners
        kwargs["antialias"] = antialias
    return F.interpolate(torch.from_numpy(x_nchw), size=size, mode=mode, **kwargs)


CASES = [
    # (in_hw, out_hw, mode, align_corners, antialias)
    ((17, 23), (34, 46), "bilinear", False, False),  # upsample
    ((17, 23), (35, 41), "bilinear", True, False),
    ((64, 48), (17, 23), "bilinear", False, False),  # downsample
    ((64, 48), (17, 23), "bilinear", False, True),  # antialias minify
    ((33, 44), (66, 88), "bilinear", False, True),  # antialias magnify
    ((37, 37), (16, 16), "bicubic", False, False),
    ((37, 37), (16, 16), "bicubic", False, True),
    ((14, 14), (30, 27), "bicubic", False, False),  # pos-embed style
    ((10, 12), (20, 24), "nearest", False, False),
    ((20, 24), (7, 9), "nearest", False, False),
    ((31, 29), (31, 29), "bilinear", False, True),  # identity
    ((8, 8), (128, 96), "bilinear", True, False),  # big upsample ac=True
]


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_resize_matches_torch(case, rng):
    (ih, iw), (oh, ow), mode, ac, aa = case
    x = rng.standard_normal((2, 3, ih, iw)).astype(np.float32)
    ref = _torch_resize(x, (oh, ow), mode, ac, aa).numpy()
    got = resize(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        (oh, ow),
        mode=mode,
        align_corners=ac,
        antialias=aa,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_flat_interpolate_matches_torch(rng):
    b, c = 2, 8
    old, new = (21, 28), (9, 13)
    x = rng.standard_normal((b, old[0] * old[1], c)).astype(np.float32)
    # reference utils/geometric.py:227-252
    xt = torch.from_numpy(x).view(b, old[0], old[1], c).permute(0, 3, 1, 2)
    ref = F.interpolate(
        xt, size=new, mode="bilinear", align_corners=False, antialias=True
    )
    ref = ref.reshape(b, c, -1).permute(0, 2, 1).numpy()
    got = np.asarray(flat_interpolate(jnp.asarray(x), old, new, antialias=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
