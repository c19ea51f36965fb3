"""Regression tests for the round-2 review findings (serving preprocess
padding, loader fault tolerance, flip of dense GT maps, LocalSSI kernel
conventions, flat-batch train step)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.smoke


def test_get_paddings_never_negative():
    """int() truncation used to produce a -1 pad for in-bounds ratios
    (e.g. 303x640), which jnp.pad rejects; the torch reference silently
    cropped a pixel through F.pad instead (reference unidepthv2.py:36-58)."""
    from unidepth_tpu.models.unidepthv2.model import get_paddings

    for h in range(100, 800, 7):
        for w in range(100, 800, 7):
            pads, (nh, nw) = get_paddings((h, w), (0.5, 2.5))
            assert all(p >= 0 for p in pads), (h, w, pads)
            assert nh >= h and nw >= w
            if 0.5 <= w / h <= 2.5:
                # in-bounds ratios are a no-op
                assert pads == (0, 0, 0, 0) and (nh, nw) == (h, w)
            else:
                assert 0.5 - 1e-9 <= nw / nh <= 2.5 + 1e-9


def test_loader_worker_survives_bad_samples():
    """A sample that raises (e.g. 'too few valid depth points',
    base.py:206) must be retried with a fresh index instead of killing the
    worker thread — the reference retries inside __getitem__
    (image_dataset.py:161-171), but the Loader calls get_single_item
    directly."""
    from unidepth_tpu.datasets.loader import Loader, WeightedConcat

    class Flaky:
        def __init__(self):
            self.calls = 0

        def __len__(self):
            return 16

        def get_single_item(self, idx, rng, image_shape=None):
            self.calls += 1
            if idx % 2 == 0:  # half the samples are broken
                raise IndexError("too few valid depth points")
            return {
                "image": np.zeros((8, 8, 3), np.float32),
                "depth": np.ones((8, 8, 1), np.float32),
                "K": np.eye(3, dtype=np.float32),
            }

    class Concat:
        def __init__(self, ds):
            self.ds = ds

        def sample(self, rng):
            # always start on a BROKEN index; retry must recover
            return self.ds, 0

    ds = Flaky()
    loader = Loader(Concat(ds), batch_size=2, num_threads=0, seed=0)
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 8, 8, 3)
    assert ds.calls > 2  # retries happened


def test_random_flip_flips_points_and_flow():
    """Horizontal flip must mirror dense GT maps and negate the x/u
    component (reference transforms.py:142-148)."""
    from unidepth_tpu.datasets.pipelines import RandomFlip

    h, w = 6, 8
    rng_np = np.random.default_rng(0)
    sample = {
        "image": rng_np.random((h, w, 3)).astype(np.float32),
        "depth": rng_np.random((h, w, 1)).astype(np.float32),
        "K": np.asarray([[10.0, 0, 4.0], [0, 10.0, 3.0], [0, 0, 1]], np.float32),
        "points": rng_np.random((h, w, 3)).astype(np.float32),
        "flow_fwd": rng_np.random((h, w, 2)).astype(np.float32),
        "flow_fwd_mask": rng_np.random((h, w, 1)) > 0.5,
    }
    orig = {k: np.array(v) for k, v in sample.items()}
    out = RandomFlip(prob=1.1)(dict(sample), rng_np)

    np.testing.assert_array_equal(out["image"], orig["image"][:, ::-1])
    np.testing.assert_array_equal(out["points"][..., 1:], orig["points"][:, ::-1][..., 1:])
    np.testing.assert_array_equal(out["points"][..., 0], -orig["points"][:, ::-1][..., 0])
    np.testing.assert_array_equal(out["flow_fwd"][..., 0], -orig["flow_fwd"][:, ::-1][..., 0])
    np.testing.assert_array_equal(out["flow_fwd"][..., 1], orig["flow_fwd"][:, ::-1][..., 1])
    np.testing.assert_array_equal(out["flow_fwd_mask"], orig["flow_fwd_mask"][:, ::-1])


def test_local_ssi_pixel_patch_size_stays_local():
    """patch_size in pixels (the default (32, 32)) must produce 32-pixel
    kernels, not a degenerate whole-image kernel; fractional sizes keep
    the reference formula (local_ssi.py:132: fraction * min(H, W))."""
    from unidepth_tpu.training.losses import LocalSSI

    h = w = 64
    rng_np = np.random.default_rng(0)
    inp = jnp.asarray(rng_np.random((2, h, w, 1)), jnp.float32)
    tgt = inp * 1.7 + 0.3  # perfect up to scale/shift -> local SSI ~ 0
    mask = jnp.ones((2, h, w, 1), bool)

    loss_px = LocalSSI(weight=1.0, patch_size=(32, 32))(inp, tgt, mask)
    assert np.all(np.isfinite(np.asarray(loss_px)))
    # near-zero up to the 95%-CI-trimmed ssi normalization tails and the
    # sqrt(eps) floor of the output transform
    assert float(np.asarray(loss_px).mean()) < 0.05

    # fractional convention: kernels fraction*min(h,w), still valid
    loss_fr = LocalSSI(weight=1.0, patch_size=(0.25, 0.75))(inp, tgt, mask)
    assert np.all(np.isfinite(np.asarray(loss_fr)))

    # a prediction that violates local structure scores worse than the
    # (scale/shift-explained) perfect one
    bad = jnp.asarray(rng_np.random((2, h, w, 1)), jnp.float32)
    loss_bad = LocalSSI(weight=1.0, patch_size=(32, 32))(bad, tgt, mask)
    assert float(np.asarray(loss_bad).mean()) > float(np.asarray(loss_px).mean())


def test_spherical_project_batch_gt_one():
    """B>1 used to raise a broadcast ValueError ((B,1) against (B,H,W))."""
    from unidepth_tpu.geometry.cameras import Spherical

    # hfov < 2*pi so no longitude wraparound ambiguity in the round-trip
    p = np.tile(
        np.asarray(
            [[100.0, 100.0, 4.0, 3.0, 8.0, 6.0, np.pi / 2, np.pi / 4]], np.float32
        ),
        (2, 1),
    )
    cam = Spherical(params=jnp.asarray(p))
    rays = cam.get_rays(6, 8)
    uv = cam.project(rays)
    assert uv.shape == (2, 6, 8, 2)
    # project(unproject(grid)) returns the grid (mutually consistent)
    from unidepth_tpu.geometry.coords import coords_grid

    grid = np.broadcast_to(np.asarray(coords_grid(6, 8)), (2, 6, 8, 2))
    np.testing.assert_allclose(np.asarray(uv), grid, atol=1e-3)


def test_newton_guard_preserves_det_sign():
    """sign(det)*1e-12 + 1e-12 mapped tiny NEGATIVE determinants to exactly
    0 and produced inf through the division; the guard must keep the sign."""
    from unidepth_tpu.geometry.cameras import OpenCV

    # strong distortion so the Jacobian determinant can go negative
    params = np.zeros((1, 16), np.float32)
    params[0, :4] = (50.0, 50.0, 32.0, 24.0)
    params[0, 4] = -5.0  # aggressive k1
    cam = OpenCV(params=jnp.asarray(params))
    rays = np.asarray(cam.get_rays(48, 64))
    assert np.all(np.isfinite(rays))


def test_distorted_flip_mirrors_rays():
    """Horizontal flip of an OpenCV camera must negate the x-even
    distortion terms (p2, s1, s2) so flipped rays mirror exactly; the
    reference instead truncates params to fx/fy/cx/cy on flip
    (reference utils/camera.py:100-110)."""
    from unidepth_tpu.geometry.cameras import OpenCV

    H, W = 24, 32
    params = np.zeros((1, 16), np.float32)
    params[0, :4] = (40.0, 40.0, W / 2, H / 2)
    params[0, 4] = -0.05  # k1
    params[0, 10] = 0.01  # p1
    params[0, 11] = 0.02  # p2
    params[0, 12] = 0.005  # s1
    cam = OpenCV(params=jnp.asarray(params))
    flipped = cam.flip(H, W)
    rays = np.asarray(cam.get_rays(H, W))
    rays_f = np.asarray(flipped.get_rays(H, W))
    # mirrored column order, x negated; y/z identical
    np.testing.assert_allclose(rays_f[..., 0], -rays[:, :, ::-1, 0], atol=1e-5)
    np.testing.assert_allclose(rays_f[..., 1], rays[:, :, ::-1, 1], atol=1e-5)
    np.testing.assert_allclose(rays_f[..., 2], rays[:, :, ::-1, 2], atol=1e-5)


def test_confidence_empty_mask_no_nan():
    """A sample whose mask is entirely False must not NaN the batch loss
    (NaN median from nanquantile used to propagate)."""
    from unidepth_tpu.training.losses import Confidence

    rng = np.random.default_rng(0)
    b, h, w = 2, 8, 8
    conf = jnp.asarray(rng.random((b, h, w, 1)), jnp.float32)
    pred = jnp.asarray(rng.uniform(1, 5, (b, h, w, 1)), jnp.float32)
    gt = jnp.asarray(rng.uniform(1, 5, (b, h, w, 1)), jnp.float32)
    mask = np.ones((b, h, w, 1), bool)
    mask[1] = False  # second sample: empty mask
    out = Confidence.build({"weight": 0.1})(conf, pred, gt, jnp.asarray(mask))
    assert np.all(np.isfinite(np.asarray(out)))


def test_self_distill_per_sample_order():
    """The (B,) loss vector must stay aligned with the interleaved
    [s0c0, s0c1, s1c0, s1c1] batch order for per-sample weighting."""
    from unidepth_tpu.training.losses import SelfDistill

    rng = np.random.default_rng(0)
    b, h, w = 4, 16, 16  # 2 pairs
    depth = jnp.asarray(rng.uniform(1, 5, (b, h, w, 1)), jnp.float32)
    mask = jnp.ones((b, h, w, 1), bool)
    # identity crops: both copies see the same frame
    K = jnp.broadcast_to(
        jnp.asarray([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]]), (b, 3, 3)
    )
    flips = jnp.zeros((b,), bool)
    loss = SelfDistill(weight=0.1)(depth, K, mask, flips)
    assert loss.shape == (b,)
