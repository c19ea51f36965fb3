"""StableHLO export round-trip and hub factory."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unidepth_tpu.models.backbones.dinov2 import ViTConfig
from unidepth_tpu.models.unidepthv2.model import UniDepthV2
from unidepth_tpu.models.unidepthv2.export import export_forward

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = ViTConfig(
        embed_dim=64, depth=4, num_heads=2, pos_embed_size=8,
        output_idx=(1, 2, 3, 4), use_norm=True,
    )
    m = UniDepthV2(cfg, hidden_dim=32, out_dim=8, decoder_depths=(1, 1, 1),
                   num_heads=2, dtype=jnp.float32)
    m.init_params(seed=0, image_shape=(56, 70))
    return m


def test_export_roundtrip(tiny, tmp_path, rng):
    blob = export_forward(tiny, tiny.params, (56, 70), batch=1)
    assert len(blob) > 1000
    from jax import export as jax_export

    restored = jax_export.deserialize(blob)
    img = jnp.asarray(rng.standard_normal((1, 56, 70, 3)).astype(np.float32))
    pts, conf, K = restored.call(tiny.params, img)
    assert pts.shape == (1, 56, 70, 3)
    assert conf.shape == (1, 56, 70, 1)
    assert K.shape == (1, 3, 3)
    # matches the live forward
    out = tiny.encode_decode(tiny.params, img)
    # compiled separately -> different fusion, float-level drift only
    np.testing.assert_allclose(
        np.asarray(pts), np.asarray(out["points"]), rtol=1e-4, atol=1e-3
    )


def test_export_with_camera(tiny, rng):
    from jax import export as jax_export

    blob = export_forward(tiny, tiny.params, (56, 70), with_camera=True, batch=1)
    restored = jax_export.deserialize(blob)
    img = jnp.asarray(rng.standard_normal((1, 56, 70, 3)).astype(np.float32))
    rays = rng.standard_normal((1, 56 * 70, 3)).astype(np.float32)
    rays = jnp.asarray(rays / np.linalg.norm(rays, axis=-1, keepdims=True))
    pts, conf, K = restored.call(tiny.params, img, rays)
    assert np.isfinite(np.asarray(pts)).all()


def test_hub_factory_builds():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import hubconf

    m = hubconf.UniDepth("v2", "vits14")
    assert isinstance(m, UniDepthV2)
    assert m.encoder_cfg.embed_dim == 384


def test_camera_overlap_mask(rng):
    from unidepth_tpu.geometry.cameras import Pinhole
    from unidepth_tpu.geometry.coords import coords_grid

    cam = Pinhole(params=jnp.asarray([[100.0, 100.0, 16.0, 12.0]]))
    h, w = 24, 32
    idc = jnp.broadcast_to(coords_grid(h, w), (1, h, w, 2))
    # identity projection -> everything unmasked (flow < 1 everywhere)
    mask = cam.mask_overlap_projection(idc)
    assert bool(jnp.all(mask))
    rays = cam.get_pinhole_rays(h, w)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays), axis=-1), 1.0, rtol=1e-5
    )
