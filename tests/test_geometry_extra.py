"""project_points / morphology / validation-driver behaviour."""

import numpy as np

import jax.numpy as jnp

from unidepth_tpu.geometry.cameras import Pinhole
from unidepth_tpu.geometry.rays import (
    dilate,
    downsample_min,
    erode,
    iou,
    project_points,
)
from unidepth_tpu.utils.validation import MetricAccumulator


def test_project_points_roundtrip(rng):
    """reconstruct(depth) then project_points re-renders the same depth."""
    h, w = 16, 20
    K = jnp.asarray([[[20.0, 0, 10.0], [0, 20.0, 8.0], [0, 0, 1]]])
    cam = Pinhole.from_K(K[0])
    depth = jnp.asarray(rng.uniform(2, 5, (1, h, w, 1)).astype(np.float32))
    pts = cam.reconstruct(depth).reshape(1, -1, 3)
    rendered = project_points(pts, K, (h, w))
    m = np.asarray(rendered[..., 0]) > 0
    assert m.mean() > 0.8  # most pixels hit
    np.testing.assert_allclose(
        np.asarray(rendered[..., 0])[m], np.asarray(depth[..., 0])[m], rtol=1e-4
    )


def test_downsample_min_ignores_zeros():
    d = np.zeros((1, 4, 4, 1), np.float32)
    d[0, 0, 0, 0] = 5.0
    d[0, 1, 1, 0] = 3.0
    out = downsample_min(jnp.asarray(d), 2)
    assert float(out[0, 0, 0, 0]) == 3.0  # min of nonzeros
    assert float(out[0, 1, 1, 0]) == 0.0  # all-zero block stays invalid


def test_dilate_erode_iou():
    m = np.zeros((1, 9, 9, 1), np.float32)
    m[0, 4, 4, 0] = 1.0
    d = dilate(jnp.asarray(m), 3)
    assert float(d.sum()) == 9.0
    e = erode(d, 3)
    assert float(e.sum()) == 1.0 and float(e[0, 4, 4, 0]) == 1.0
    assert float(iou(d, d)) == 1.0
    assert 0.0 < float(iou(d, jnp.asarray(m))) < 1.0


def test_metric_accumulator(rng):
    acc = MetricAccumulator("dummy")
    gt = jnp.asarray(rng.uniform(1, 5, (2, 12, 14, 1)).astype(np.float32))
    pred = gt * 1.05
    mask = jnp.ones_like(gt, bool)
    acc.accumulate(gt, pred, mask)
    acc.accumulate(gt, pred, mask)
    out = acc.get_evaluation()
    assert 0.99 <= out["d1"] <= 1.0
    assert out["arel"] < 0.06
    assert not acc._values  # cleared after evaluation
