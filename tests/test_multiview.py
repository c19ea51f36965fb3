"""Multi-camera (NuScenes-style surround) inference: 6 views, 6 cameras,
one compiled program (BASELINE config #5)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from unidepth_tpu.geometry.cameras import BatchCamera, Pinhole
from unidepth_tpu.models.unidepthv2.model import UniDepthV2

CFG = json.loads(
    (Path(__file__).resolve().parents[1] / "configs/config_v2_vits14.json").read_text()
)


@pytest.mark.slow
def test_six_view_surround_infer():
    cfg = json.loads(json.dumps(CFG))
    m = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    m.shape_constraints["pixels_min"] = 4000
    m.shape_constraints["pixels_max"] = 10000
    m.init_params(seed=0, image_shape=(56, 70))

    rng = np.random.default_rng(0)
    views = rng.integers(0, 255, (6, 56, 84, 3), dtype=np.uint8)
    # six different cameras (one per view)
    params = np.stack(
        [
            np.array([100.0 + 5 * i, 100.0 + 5 * i, 42.0, 28.0], np.float32)
            for i in range(6)
        ]
    )
    cams = Pinhole(params=jnp.asarray(params))

    out = m.infer(views, camera=cams)
    assert out["depth"].shape == (6, 56, 84, 1)
    # each view conditioned on its own camera: rays differ between views
    rays = np.asarray(out["rays"])
    assert np.abs(rays[0] - rays[5]).max() > 1e-3
    # and only ONE program compiled for the whole surround batch
    assert len(m._jit_cache) == 1
    # second frame of the same rig: no recompile (streaming)
    out2 = m.infer(
        rng.integers(0, 255, (6, 56, 84, 3), dtype=np.uint8), camera=cams
    )
    assert len(m._jit_cache) == 1
    assert np.isfinite(np.asarray(out2["depth"])).all()
