"""Evaluation metric parity vs direct torch/numpy computation."""

import numpy as np
import torch

import jax.numpy as jnp

from unidepth_tpu.ops.knn import chamfer_distance, nn_distances
from unidepth_tpu.utils.evaluation import eval_3d, eval_depth

import pytest

pytestmark = pytest.mark.smoke


def test_depth_metrics_match_reference_definitions(rng):
    gt = rng.uniform(0.5, 10, (2, 24, 32, 1)).astype(np.float32)
    pred = (gt * rng.uniform(0.7, 1.4, gt.shape)).astype(np.float32)
    mask = rng.random(gt.shape) > 0.25

    out = eval_depth(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask))

    for i in range(2):
        g = torch.from_numpy(gt[i, ..., 0][mask[i, ..., 0]])
        p = torch.from_numpy(pred[i, ..., 0][mask[i, ..., 0]])
        d1 = (torch.maximum(g / p, p / g) < 1.25).float().mean()
        rmse = torch.sqrt(((g - p) ** 2).mean())
        arel = ((g - p).abs() / g).mean()
        silog = 100 * torch.std(torch.log(p) - torch.log(g))
        medlog = 100 * (torch.log(p) - torch.log(g)).median().abs()
        np.testing.assert_allclose(float(out["d1"][i]), d1, rtol=1e-5)
        np.testing.assert_allclose(float(out["rmse"][i]), rmse, rtol=1e-4)
        np.testing.assert_allclose(float(out["arel"][i]), arel, rtol=1e-4)
        np.testing.assert_allclose(float(out["silog"][i]), silog, rtol=1e-3)
        np.testing.assert_allclose(float(out["medianlog"][i]), medlog, rtol=1e-3, atol=1e-3)


def test_ssi_si_variants_handle_affine_offsets(rng):
    gt = rng.uniform(1, 10, (1, 16, 16, 1)).astype(np.float32)
    pred = (0.5 * gt + 2.0).astype(np.float32)  # affine-related prediction
    mask = np.ones_like(gt, bool)
    out = eval_depth(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask))
    assert float(out["d1"][0]) < 1.0  # raw fails
    np.testing.assert_allclose(float(out["d1_ssi"][0]), 1.0)  # ssi recovers
    assert float(out["arel_ssi"][0]) < 1e-5


def test_nn_distances_matches_bruteforce(rng):
    x = rng.standard_normal((300, 3)).astype(np.float32)
    y = rng.standard_normal((200, 3)).astype(np.float32)
    d2, idx = nn_distances(jnp.asarray(x), jnp.asarray(y), chunk=128)
    brute = ((x[:, None] - y[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), brute.min(1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), brute.argmin(1))


def test_nn_distances_respects_validity(rng):
    x = rng.standard_normal((50, 3)).astype(np.float32)
    y = np.concatenate([x + 100.0, x], axis=0).astype(np.float32)
    yv = np.concatenate([np.ones(50, bool), np.zeros(50, bool)])
    d2, _ = nn_distances(jnp.asarray(x), jnp.asarray(y), y_valid=jnp.asarray(yv))
    # only the far copy is valid: matches brute force over the valid half
    brute = ((x[:, None] - y[None, :50]) ** 2).sum(-1).min(1)
    np.testing.assert_allclose(np.asarray(d2), brute, rtol=1e-4)


def test_eval_3d_perfect_prediction(rng):
    pts = rng.standard_normal((1, 12, 16, 3)).astype(np.float32)
    mask = np.ones((1, 12, 16, 1), bool)
    th = jnp.asarray(np.linspace(0.01, 1.0, 10).astype(np.float32))
    out = eval_3d(jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(mask), th)
    np.testing.assert_allclose(float(out["chamfer"][0]), 0.0, atol=1e-4)
    # reference F1-AUC normalizes trapz by len(thresholds)
    # (evaluation_depth.py:90-91): perfect score is (T-1)/T.
    np.testing.assert_allclose(float(out["F1"][0]), 9.0 / 10.0, atol=1e-3)


def test_knn_points_general_k_matches_numpy(rng):
    """K in {1, 3, 8} with variable lengths vs a brute-force numpy reference
    (reference ops/knn/functions/knn.py:113 knn_points semantics: ascending
    sq-dists, padded queries zeroed)."""
    from unidepth_tpu.ops.knn import knn_gather, knn_points

    B, P1, P2, D = 2, 57, 83, 3
    x = rng.standard_normal((B, P1, D)).astype(np.float32)
    y = rng.standard_normal((B, P2, D)).astype(np.float32)
    len1 = np.array([P1, 41])
    len2 = np.array([P2, 29])
    xv = np.arange(P1)[None, :] < len1[:, None]
    yv = np.arange(P2)[None, :] < len2[:, None]

    for K in (1, 3, 8):
        d2, idx = knn_points(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(xv), jnp.asarray(yv), k=K
        )
        d2, idx = np.asarray(d2), np.asarray(idx)
        assert d2.shape == (B, P1, K) and idx.shape == (B, P1, K)
        for b in range(B):
            full = ((x[b, :, None, :] - y[b, None, :, :]) ** 2).sum(-1)
            full[:, ~yv[b]] = np.inf
            order = np.argsort(full, axis=-1, kind="stable")[:, :K]
            ref_d = np.take_along_axis(full, order, axis=-1)
            for i in range(P1):
                if not xv[b, i]:
                    assert np.all(d2[b, i] == 0.0)
                    continue
                np.testing.assert_allclose(d2[b, i], ref_d[i], rtol=1e-4, atol=1e-5)
                # indices must point at equally-near neighbors (ties may
                # reorder between top_k and argsort)
                np.testing.assert_allclose(
                    ((x[b, i] - y[b][idx[b, i]]) ** 2).sum(-1),
                    ref_d[i],
                    rtol=1e-4,
                    atol=1e-5,
                )

        gathered = np.asarray(
            knn_gather(jnp.asarray(y), jnp.asarray(idx))
        )
        assert gathered.shape == (B, P1, K, D)
        for b in range(B):
            np.testing.assert_allclose(gathered[b], y[b][idx[b]], atol=0)


def test_knn_points_underfull_cloud_zero_fills(rng):
    """A cloud with fewer than k valid points must zero-fill the surplus
    dists/idx slots (PyTorch3D padding semantics, reference
    ops/knn/functions/knn.py:113) instead of returning inf distances and
    indices into padding rows."""
    from unidepth_tpu.ops.knn import knn_points

    B, P1, P2, D, K = 1, 11, 9, 3, 8
    x = rng.standard_normal((B, P1, D)).astype(np.float32)
    y = rng.standard_normal((B, P2, D)).astype(np.float32)
    n_valid = 3  # < K
    yv = np.arange(P2)[None, :] < n_valid

    d2, idx = knn_points(jnp.asarray(x), jnp.asarray(y), y_valid=jnp.asarray(yv), k=K)
    d2, idx = np.asarray(d2), np.asarray(idx)
    assert np.all(np.isfinite(d2))
    assert np.all(d2[:, :, n_valid:] == 0.0)
    assert np.all(idx[:, :, n_valid:] == 0)
    # the leading n_valid slots still hold the true neighbors
    full = ((x[0, :, None, :] - y[0, None, :n_valid, :]) ** 2).sum(-1)
    ref = np.sort(full, axis=-1)
    np.testing.assert_allclose(d2[0, :, :n_valid], ref, rtol=1e-4, atol=1e-5)
    assert np.all(idx[:, :, :n_valid] < n_valid)
