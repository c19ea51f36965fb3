"""Camera library invariants and parity checks."""

import numpy as np
import pytest

import jax.numpy as jnp

from unidepth_tpu.geometry.cameras import (
    EUCM,
    MEI,
    BatchCamera,
    Fisheye624,
    OpenCV,
    Pinhole,
    Spherical,
)
from unidepth_tpu.geometry.coords import coords_grid
from unidepth_tpu.geometry.rays import generate_rays, spherical_zbuffer_to_euclidean

pytestmark = pytest.mark.smoke


def _pinhole(b=2):
    params = np.array([[300.0, 310.0, 160.0, 120.0]] * b, np.float32)
    return Pinhole(params=jnp.asarray(params))


def test_pinhole_project_unproject_roundtrip():
    cam = _pinhole()
    h, w = 24, 32
    uv = jnp.broadcast_to(coords_grid(h, w), (2, h, w, 2))
    rays = cam.unproject(uv)
    uv2 = cam.project(rays * 5.0)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), rtol=1e-4, atol=1e-3)


def test_pinhole_reconstruct_depth_consistency():
    cam = _pinhole()
    depth = jnp.full((2, 16, 20, 1), 3.5)
    pts = cam.reconstruct(depth)
    np.testing.assert_allclose(np.asarray(pts[..., 2:3]), np.asarray(depth), rtol=1e-5)


def test_crop_resize_semantics():
    cam = _pinhole()
    c2 = cam.crop(-10, -4).resize(2.0)  # pad 10 left, 4 top, then 2x
    p = np.asarray(c2.params)
    np.testing.assert_allclose(p[0], [600.0, 620.0, 340.0, 248.0])


def test_get_rays_unit_norm():
    cam = _pinhole()
    rays = cam.get_rays(10, 12)
    n = np.linalg.norm(np.asarray(rays), axis=-1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-5)


def test_generate_rays_matches_camera():
    cam = _pinhole()
    rays, angles = generate_rays(cam.K, (10, 12))
    rays2 = cam.get_rays(10, 12).reshape(2, -1, 3)
    np.testing.assert_allclose(np.asarray(rays), np.asarray(rays2), atol=1e-5)
    th = np.asarray(angles)[..., 0]
    assert np.all(np.abs(th) < np.pi)


def test_spherical_zbuffer_roundtrip():
    rng = np.random.default_rng(0)
    theta = rng.uniform(-0.5, 0.5, (2, 8, 8)).astype(np.float32)
    phi = rng.uniform(1.0, 2.0, (2, 8, 8)).astype(np.float32)
    z = rng.uniform(1.0, 5.0, (2, 8, 8)).astype(np.float32)
    pts = spherical_zbuffer_to_euclidean(jnp.stack([theta, phi, z], axis=-1))
    np.testing.assert_allclose(np.asarray(pts[..., 2]), z, rtol=1e-5)


@pytest.mark.parametrize(
    "cam",
    [
        EUCM(params=jnp.asarray([[300.0, 300.0, 160.0, 120.0, 0.5, 1.0]])),
        OpenCV(
            params=jnp.asarray(
                [[300.0, 300.0, 160.0, 120.0, 0.05, -0.01, 0.001] + [0.0] * 3 + [0.01, -0.005] + [0.0] * 4]
            )
        ),
        Fisheye624(
            params=jnp.asarray(
                [[300.0, 300.0, 160.0, 120.0, 0.1, -0.02] + [0.0] * 10]
            )
        ),
        MEI(
            params=jnp.asarray(
                [[300.0, 300.0, 160.0, 120.0, 0.05, -0.01, 0.001, 0.0, 0.4]]
            )
        ),
    ],
    ids=["eucm", "opencv", "fisheye624", "mei"],
)
def test_distortion_models_project_unproject(cam):
    """unproject(project) != id at edges, but project(unproject) must hold
    for central pixels where distortion is invertible."""
    h, w = 40, 48
    uv = jnp.broadcast_to(coords_grid(h, w), (1, h, w, 2))
    rays = cam.unproject(uv)
    n = np.linalg.norm(np.asarray(rays), axis=-1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-4)
    uv2 = cam.project(rays)
    err = np.abs(np.asarray(uv2) - np.asarray(uv))
    # central crop: distortion inversion converges well away from edges
    c = err[:, 10:-10, 12:-12]
    assert np.median(c) < 0.05, np.median(c)


def test_batch_camera_heterogeneous():
    pin = _pinhole(1)
    eucm = EUCM(params=jnp.asarray([[300.0, 300.0, 160.0, 120.0, 0.5, 1.0]]))
    batch = BatchCamera.concat([pin, eucm])
    assert batch.params.shape == (2, 16)
    rays = batch.get_rays(8, 10)
    assert rays.shape == (2, 8, 10, 3)
    ray_pin = pin.get_rays(8, 10)
    ray_eucm = eucm.get_rays(8, 10)
    np.testing.assert_allclose(np.asarray(rays[0]), np.asarray(ray_pin[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rays[1]), np.asarray(ray_eucm[0]), atol=1e-5)


def test_batch_camera_mixed_affine_dispatch():
    """crop/resize/flip on a mixed Pinhole+Spherical batch must apply each
    member's own semantics (reference utils/camera.py:331-409 Spherical vs
    :115-130 base): sphere W/H/hfov/vfov update, pinhole cx/cy shift."""
    pin = _pinhole(1)
    # (fx, fy, cx, cy, W, H, hfov/2, vfov/2)
    sph = Spherical(
        params=jnp.asarray([[64.0, 64.0, 160.0, 120.0, 320.0, 240.0, np.pi, np.pi / 2]])
    )
    batch = BatchCamera.concat([pin, sph])

    cropped = batch.crop(10.0, 6.0, 4.0, 2.0)
    pin_c = pin.crop(10.0, 6.0, 4.0, 2.0)
    sph_c = sph.crop(10.0, 6.0, 4.0, 2.0)
    np.testing.assert_allclose(
        np.asarray(cropped.params[0, :4]), np.asarray(pin_c.params[0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cropped.params[1, :8]), np.asarray(sph_c.params[0]), rtol=1e-6
    )

    resized = batch.resize(0.5)
    sph_r = sph.resize(0.5)
    pin_r = pin.resize(0.5)
    np.testing.assert_allclose(
        np.asarray(resized.params[0, :4]), np.asarray(pin_r.params[0]), rtol=1e-6
    )
    # Spherical scales W/H (cols 4, 5) too; the base affine would leave them
    np.testing.assert_allclose(
        np.asarray(resized.params[1, :8]), np.asarray(sph_r.params[0]), rtol=1e-6
    )
    assert float(resized.params[1, 4]) == 160.0  # W rescaled, not corrupted

    flipped = batch.flip(240, 320)
    np.testing.assert_allclose(
        np.asarray(flipped.params[0, :4]),
        np.asarray(pin.flip(240, 320).params[0]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(flipped.params[1, :8]),
        np.asarray(sph.flip(240, 320).params[0]),
        rtol=1e-6,
    )

    # hfov/vfov dispatch: spherical reads params[..., 6:8], base arctan form
    np.testing.assert_allclose(float(batch.hfov[1]), float(sph.hfov[0]), rtol=1e-6)
    np.testing.assert_allclose(float(batch.hfov[0]), float(pin.hfov[0]), rtol=1e-6)
    np.testing.assert_allclose(float(batch.vfov[1]), float(sph.vfov[0]), rtol=1e-6)


def test_batch_camera_affine_matches_sequential_crop_resize():
    """The infer preprocessing chain camera.crop(-pl, -pt).resize(f) on a
    mixed batch equals each member's own chained ops (the data-pipeline
    pattern, datasets/pipelines.py ContextCrop)."""
    pin = _pinhole(1)
    sph = Spherical(
        params=jnp.asarray([[64.0, 64.0, 160.0, 120.0, 320.0, 240.0, np.pi, np.pi / 2]])
    )
    batch = BatchCamera.concat([pin, sph])
    out = batch.crop(-3.0, -5.0).resize(2.0)
    np.testing.assert_allclose(
        np.asarray(out.params[0, :4]),
        np.asarray(pin.crop(-3.0, -5.0).resize(2.0).params[0]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out.params[1, :8]),
        np.asarray(sph.crop(-3.0, -5.0).resize(2.0).params[0]),
        rtol=1e-6,
    )
