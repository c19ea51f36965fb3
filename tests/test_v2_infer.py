"""UniDepthV2.infer() pipeline behaviour (shapes, camera handling, caching)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.slow

from unidepth_tpu.models.unidepthv2.model import (
    UniDepthV2,
    get_paddings,
    get_resize_factor,
)

CFG = json.loads(
    (Path(__file__).resolve().parents[1] / "configs/config_v2_vits14.json").read_text()
)


@pytest.fixture(scope="module")
def tiny_model():
    # shrink pixel budget so CPU tests stay fast
    cfg = json.loads(json.dumps(CFG))
    m = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    m.shape_constraints["pixels_min"] = 4000
    m.shape_constraints["pixels_max"] = 10000
    m.init_params(seed=0, image_shape=(56, 70))
    return m


def test_preprocess_shape_math():
    # too-wide image gets vertical padding (reference unidepthv2.py:36-58)
    pads, (h, w) = get_paddings((100, 300), (0.5, 2.5))
    assert pads[:2] == (0, 0) and h == 120 and w == 300
    pads2, (h2, w2) = get_paddings((300, 100), (0.5, 2.5))
    assert pads2[2:] == (0, 0) and h2 == 300 and w2 == 150
    factor, (nh, nw) = get_resize_factor((480, 640), (200000, 600000))
    assert nh % 14 == 0 and nw % 14 == 0
    assert 200000 * 0.95 <= nh * nw


def test_infer_output_contract(tiny_model):
    rgb = np.random.default_rng(0).integers(0, 255, (1, 60, 90, 3), dtype=np.uint8)
    out = tiny_model.infer(rgb)
    assert out["depth"].shape == (1, 60, 90, 1)
    assert out["points"].shape == (1, 60, 90, 3)
    assert out["rays"].shape == (1, 60, 90, 3)
    assert out["confidence"].shape == (1, 60, 90, 1)
    assert out["intrinsics"].shape == (1, 3, 3)
    assert bool(jnp.all(out["depth"] > 0))
    assert bool(jnp.all(out["confidence"] > 0))
    n = np.linalg.norm(np.asarray(out["rays"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)
    # depth == z of points
    np.testing.assert_allclose(
        np.asarray(out["depth"][..., 0]), np.asarray(out["points"][..., 2]), rtol=1e-6
    )


def test_infer_outputs_filter(tiny_model):
    """Requesting a subset returns only those keys with identical values
    (XLA DCE's the dropped heads; numerics of kept outputs unchanged)."""
    rgb = np.random.default_rng(1).integers(0, 255, (1, 56, 84, 3), dtype=np.uint8)
    full = tiny_model.infer(rgb)
    sub = tiny_model.infer(rgb, outputs=("depth", "intrinsics"))
    assert set(sub) == {"depth", "intrinsics"}
    np.testing.assert_allclose(np.asarray(sub["depth"]), np.asarray(full["depth"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sub["intrinsics"]), np.asarray(full["intrinsics"]), rtol=1e-6
    )
    import pytest

    with pytest.raises(ValueError, match="unknown infer outputs"):
        tiny_model.infer(rgb, outputs=("depht",))


def test_infer_channel_first_and_3d_input(tiny_model):
    rgb = np.random.default_rng(1).integers(0, 255, (3, 60, 90), dtype=np.uint8)
    out = tiny_model.infer(rgb)
    assert out["depth"].shape == (1, 60, 90, 1)


def test_infer_with_gt_camera(tiny_model):
    # multiple-of-14 input inside the pixel budget -> resize factor exactly 1,
    # so output rays must match the pinhole unprojection of the GT K.
    # (At non-multiple sizes the reference itself introduces a small drift:
    # camera resized by the scalar factor while the image resizes to the
    # ceil-to-14 shape, unidepthv2.py:61-77 — mirrored here.)
    rgb = np.random.default_rng(2).integers(0, 255, (1, 56, 84, 3), dtype=np.uint8)
    K = np.array([[100.0, 0, 42.0], [0, 100.0, 28.0], [0, 0, 1]], np.float32)
    out = tiny_model.infer(rgb, camera=K)
    from unidepth_tpu.geometry.cameras import Pinhole

    rays_gt = Pinhole.from_K(jnp.asarray(K)).get_rays(56, 84)
    np.testing.assert_allclose(
        np.asarray(out["rays"][0]), np.asarray(rays_gt[0]), atol=1e-2
    )
    # intrinsics output stays the *predicted* K even with a GT camera
    # (reference unidepthv2.py:330-332) — only shape-checked here.
    assert out["intrinsics"].shape == (1, 3, 3)


def test_jit_cache_reuse(tiny_model):
    rgb = np.random.default_rng(3).integers(0, 255, (1, 60, 90, 3), dtype=np.uint8)
    tiny_model.infer(rgb)
    n = len(tiny_model._jit_cache)
    tiny_model.infer(rgb)
    assert len(tiny_model._jit_cache) == n  # same bucket, no recompile
    tiny_model.infer(np.random.default_rng(4).integers(0, 255, (1, 70, 84, 3), dtype=np.uint8))
    assert len(tiny_model._jit_cache) == n + 1


def test_resolution_level_changes_budget(tiny_model):
    tiny_model.resolution_level = 0
    lo = tiny_model._pixels_bounds()
    tiny_model.resolution_level = 9
    hi = tiny_model._pixels_bounds()
    assert hi[0] > lo[0]
    tiny_model.resolution_level = None
