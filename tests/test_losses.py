"""Loss parity vs torch re-implementations and invariance properties."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.smoke

from unidepth_tpu.training.losses import (
    FNS,
    Confidence,
    EdgeGuidedLocalSSI,
    LocalSSI,
    Regression,
    SelfDistill,
    SILog,
    masked_mean_var,
    masked_median,
    ssi_normalize,
)


def _torch_masked_mean_var(data, mask, dim):
    mask = mask.float()
    s = torch.sum(mask, dim=dim, keepdim=True)
    mean = torch.sum(data * mask, dim=dim, keepdim=True) / s.clamp(min=1.0)
    var = torch.sum(mask * (data - mean) ** 2, dim=dim, keepdim=True) / s.clamp(min=1.0)
    return mean, var


def test_masked_mean_var_matches_torch(rng):
    x = rng.standard_normal((2, 10, 12, 1)).astype(np.float32)
    m = rng.random((2, 10, 12, 1)) > 0.3
    mt, vt = _torch_masked_mean_var(torch.from_numpy(x), torch.from_numpy(m), [1, 2])
    mj, vj = masked_mean_var(jnp.asarray(x), jnp.asarray(m), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(mj), mt.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vj), vt.numpy(), rtol=1e-5, atol=1e-6)


def test_silog_matches_torch(rng):
    pred = rng.uniform(0.5, 10, (2, 16, 20, 1)).astype(np.float32)
    gt = rng.uniform(0.5, 10, (2, 16, 20, 1)).astype(np.float32)
    m = rng.random((2, 16, 20, 1)) > 0.2
    si = np.array([0.0, 1.0], np.float32)

    # torch reference math (losses/silog.py:28-56)
    pt, gtt, mt = map(torch.from_numpy, (pred, gt, m))
    err = torch.log(pt + 1e-4) - torch.log(gtt + 1e-4)
    mean, var = _torch_masked_mean_var(err, mt, [1, 2])
    mean = mean.squeeze(1).squeeze(1)
    var = var.squeeze(1).squeeze(1)
    var = var.mean(dim=-1)
    mean = mean.mean(dim=-1)
    var = var + 0.15 * mean**2 * (1 - torch.from_numpy(si))
    expected = torch.sqrt(var + 1e-4)

    loss = SILog(weight=1.0, input_fn="log", output_fn="sqrt", integrated=0.15)
    got = loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(m), si=jnp.asarray(si))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=1e-5, atol=1e-6)


def test_regression_l2(rng):
    pred = rng.standard_normal((3, 50, 3)).astype(np.float32)
    gt = rng.standard_normal((3, 50, 3)).astype(np.float32)
    loss = Regression(weight=1.0, fn="l2", gamma=1.0, alpha=1.0, output_fn="sqrt")
    got = np.asarray(loss(jnp.asarray(pred), jnp.asarray(gt)))
    exp = np.sqrt(np.mean(np.mean((pred - gt) ** 2, axis=-1), axis=-1) + 1e-4)
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_confidence_rescale_invariance(rng):
    """Median-rescale makes the loss invariant to global scale of pred."""
    gt = rng.uniform(1, 5, (2, 12, 14, 1)).astype(np.float32)
    pred = gt * rng.uniform(0.8, 1.2, (2, 12, 14, 1)).astype(np.float32)
    conf = rng.uniform(0.1, 1.0, (2, 12, 14, 1)).astype(np.float32)
    m = np.ones((2, 12, 14, 1), bool)
    loss = Confidence(weight=1.0, input_fn="linear", output_fn="sqrt")
    a = np.asarray(loss(jnp.asarray(conf), jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(m)))
    b = np.asarray(
        loss(jnp.asarray(conf), jnp.asarray(pred * 7.3), jnp.asarray(gt), jnp.asarray(m))
    )
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_masked_median():
    x = jnp.asarray([[1.0, 2.0, 100.0, 3.0]])
    m = jnp.asarray([[True, True, False, True]])
    assert float(masked_median(x, m, axis=-1)[0]) == 2.0


def test_ssi_normalize_scale_shift_invariance(rng):
    x = rng.uniform(1, 5, (2, 200)).astype(np.float32)
    t = (2.5 * x + 1.0).astype(np.float32)
    m = jnp.ones((2, 200), bool)
    xn, tn, stable = ssi_normalize(jnp.asarray(x), jnp.asarray(t), m, axis=-1)
    # after normalization the affine relation collapses: xn ~= tn
    d = np.abs(np.asarray(xn) - np.asarray(tn))[np.asarray(stable)]
    assert d.max() < 1e-4


def test_self_distill_zero_for_identical_views(rng):
    """Identical pairs with identical intrinsics must give ~zero loss."""
    d = rng.uniform(1, 5, (1, 16, 16, 1)).astype(np.float32)
    depth = np.concatenate([d, d], axis=0)
    K = np.broadcast_to(
        np.array([[[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]]], np.float32), (2, 3, 3)
    )
    mask = np.ones((2, 16, 16, 1), bool)
    flips = np.zeros(2, bool)
    loss = SelfDistill(weight=1.0, output_fn="sqrt")
    out = np.asarray(
        loss(jnp.asarray(depth), jnp.asarray(K.copy()), jnp.asarray(mask), jnp.asarray(flips))
    )
    np.testing.assert_allclose(out, np.sqrt(1e-5 + 1e-4), atol=1e-4)


def test_self_distill_flip_consistency(rng):
    """View0 flipped copy of view1 -> zero loss when flip flag set."""
    d = rng.uniform(1, 5, (1, 16, 16, 1)).astype(np.float32)
    depth = np.concatenate([d[:, :, ::-1], d], axis=0)
    K = np.broadcast_to(
        np.array([[[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]]], np.float32), (2, 3, 3)
    )
    mask = np.ones((2, 16, 16, 1), bool)
    flips = np.array([True, False])
    loss = SelfDistill(weight=1.0, output_fn="sqrt")
    out = np.asarray(
        loss(jnp.asarray(depth), jnp.asarray(K.copy()), jnp.asarray(mask), jnp.asarray(flips))
    )
    np.testing.assert_allclose(out, np.sqrt(1e-5 + 1e-4), atol=1e-3)


def test_local_ssi_perfect_prediction(rng):
    gt = rng.uniform(1, 5, (2, 64, 64, 1)).astype(np.float32)
    m = np.ones((2, 64, 64, 1), bool)
    loss = LocalSSI(weight=1.0, patch_size=(16, 32), num_levels=2)
    out = np.asarray(loss(jnp.asarray(gt), jnp.asarray(gt), jnp.asarray(m)))
    # error is exactly 0 -> output_fn(eps-clamped) floor
    assert np.all(out < np.sqrt(1e-5 + 1e-4) + 1e-4)


def test_edge_guided_ssi_runs_and_orders(rng):
    gt = rng.uniform(1, 5, (2, 56, 56, 1)).astype(np.float32)
    img = rng.random((2, 56, 56, 3)).astype(np.float32)
    m = np.ones((2, 56, 56, 1), bool)
    vm = np.ones((2, 56, 56, 1), np.float32)
    loss = EdgeGuidedLocalSSI(weight=1.0, num_patches=16)
    perfect = np.asarray(
        loss(jnp.asarray(gt), jnp.asarray(gt), jnp.asarray(m), jnp.asarray(img), jnp.asarray(vm))
    )
    noisy_pred = gt * rng.uniform(0.3, 3.0, gt.shape).astype(np.float32)
    noisy = np.asarray(
        loss(jnp.asarray(noisy_pred), jnp.asarray(gt), jnp.asarray(m), jnp.asarray(img), jnp.asarray(vm))
    )
    assert np.all(perfect < noisy)
    assert np.isfinite(noisy).all()
