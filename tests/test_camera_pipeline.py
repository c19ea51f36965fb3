"""Full camera models through the host pipeline and collate.

Sequence datasets can carry a camera model + params vector per frame
(reference sequence_dataset.py:26 'camera_params' -> utils_decode.py:61
decode_camera builds e.g. Fisheye624/Spherical). The pipeline keeps the
params in sync with every crop/resize/flip and collate builds rays with
the matching camera class via BatchCamera's lax.switch dispatch.
"""

import numpy as np

import jax.numpy as jnp

from unidepth_tpu.datasets.loader import collate
from unidepth_tpu.datasets.pipelines import (
    ContextCrop,
    KittiCrop,
    PanoCrop,
    RandomFlip,
    update_camera_params,
)
from unidepth_tpu.geometry.cameras import Fisheye624, Pinhole, Spherical


def _pano_sample(h=100, w=200):
    rng = np.random.default_rng(0)
    cp = np.asarray(
        [w / (2 * np.pi), h / np.pi, (w - 1) / 2, (h - 1) / 2, w, h, np.pi, np.pi / 2],
        np.float32,
    )
    return {
        "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(1, 5, (h, w)).astype(np.float32),
        "K": np.asarray(
            [[cp[0], 0, cp[2]], [0, cp[1], cp[3]], [0, 0, 1]], np.float32
        ),
        "camera_model": "Spherical",
        "camera_params": cp,
    }


def test_pano_crop_tracks_spherical_fov():
    s = _pano_sample()
    out = PanoCrop(crop_v=0.1)(dict(s), np.random.default_rng(0))
    cp = out["camera_params"]
    # 10 rows trimmed top+bottom: H 100 -> 80, vfov scaled by 0.8
    assert cp[5] == 80 and np.isclose(cp[7], 0.8 * np.pi / 2)
    assert cp[4] == 200 and np.isclose(cp[6], np.pi)  # width untouched
    assert np.isclose(cp[3], (100 - 1) / 2 - 10)


def test_context_crop_and_flip_track_params():
    s = _pano_sample()
    out = ContextCrop(image_shape=(48, 96), test_mode=True)(
        dict(s), np.random.default_rng(1)
    )
    cp = out["camera_params"]
    # W/H track the final shape; fx/cx stay consistent with K
    assert cp[4] == 96 and cp[5] == 48
    np.testing.assert_allclose(cp[0], out["K"][0, 0], rtol=1e-6)
    np.testing.assert_allclose(cp[2], out["K"][0, 2], rtol=1e-6)

    flipped = RandomFlip(prob=1.0)(dict(out), np.random.default_rng(2))
    assert np.isclose(flipped["camera_params"][2], 96 - cp[2])


def test_collate_dispatches_per_camera_model():
    h, w = 40, 80
    rng = np.random.default_rng(3)
    base = {
        "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(1, 5, (h, w)).astype(np.float32),
    }
    sph_cp = np.asarray(
        [w / (2 * np.pi), h / np.pi, (w - 1) / 2, (h - 1) / 2, w, h, np.pi, np.pi / 2],
        np.float32,
    )
    K = np.asarray([[60.0, 0, 40.0], [0, 60.0, 20.0], [0, 0, 1]], np.float32)
    fe_cp = np.concatenate([[60.0, 60.0, 40.0, 20.0], 1e-4 * np.ones(12)]).astype(
        np.float32
    )
    samples = [
        {**base, "K": K},  # pinhole via K
        {**base, "K": K, "camera_model": "Spherical", "camera_params": sph_cp},
        {**base, "K": K, "camera_model": "Fisheye624", "camera_params": fe_cp},
    ]
    batch = collate([dict(s) for s in samples])
    rays = batch["rays"].reshape(3, h, w, 3)
    assert np.isfinite(rays).all()
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-4)
    # each row matches its own camera class
    pin = np.asarray(Pinhole.from_K(jnp.asarray(K[None])).get_rays(h, w))[0]
    np.testing.assert_allclose(rays[0], pin, atol=1e-5)
    sph = np.asarray(Spherical(params=jnp.asarray(sph_cp[None])).get_rays(h, w))[0]
    np.testing.assert_allclose(rays[1], sph, atol=1e-5)
    assert np.abs(rays[1] - rays[0]).max() > 0.1  # switch actually dispatched
    fe = np.asarray(Fisheye624(params=jnp.asarray(np.pad(fe_cp, (0, 0))[None])).get_rays(h, w))[0]
    np.testing.assert_allclose(rays[2], fe, atol=1e-4)


def test_kitti_crop_tracks_params():
    h, w = 375, 1242
    rng = np.random.default_rng(4)
    s = {
        "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "K": np.asarray([[721.0, 0, 609.0], [0, 721.0, 172.0], [0, 0, 1]], np.float32),
        "camera_model": "OpenCV",
        "camera_params": np.concatenate(
            [[721.0, 721.0, 609.0, 172.0], 1e-3 * np.ones(8)]
        ).astype(np.float32),
    }
    out = KittiCrop()(dict(s), np.random.default_rng(0))
    cp = out["camera_params"]
    np.testing.assert_allclose(cp[2], out["K"][0, 2])
    np.testing.assert_allclose(cp[3], out["K"][1, 2])
    np.testing.assert_allclose(cp[4:], s["camera_params"][4:])  # distortion kept
