"""Schedules, optimizer grouping, and EMA semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from unidepth_tpu.training.ema import ema_init, ema_update
from unidepth_tpu.training.optim import build_optimizer, lr_scale_tree, wd_mask_tree
from unidepth_tpu.training.schedules import betas_schedule, cosine_warmup

import pytest

pytestmark = pytest.mark.smoke


def test_cosine_warmup_endpoints():
    s = cosine_warmup(1e-4, 1e-6, warmup_iters=100, total_iters=1000, init_value=0.0)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(99)), 1e-4, rtol=1e-2)
    np.testing.assert_allclose(float(s(100)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(1000)), 1e-6, rtol=1e-5)
    np.testing.assert_allclose(float(s(5000)), 1e-6, rtol=1e-5)  # clamped
    # halfway through cosine: mean of base and final
    np.testing.assert_allclose(float(s(550)), (1e-4 + 1e-6) / 2, rtol=1e-3)


def test_betas_cycle():
    b = betas_schedule(True, warmup_iters=10, total_iters=100)
    np.testing.assert_allclose(float(b(0)), 0.95, rtol=1e-5)
    np.testing.assert_allclose(float(b(10)), 0.85, rtol=1e-5)
    np.testing.assert_allclose(float(b(100)), 0.95, rtol=1e-5)
    flat = betas_schedule(False, 10, 100)
    np.testing.assert_allclose(float(flat(37)), 0.9, rtol=1e-6)


def _toy_params():
    return {
        "encoder": {
            "stage_0": {"qkv": {"kernel": jnp.ones((2, 4, 12)), "bias": jnp.ones((2, 12))}},
            "cls_token": jnp.ones((1, 1, 4)),
            "norm": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
        },
        "decoder": {
            "to_latents": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)},
            "level_embeds": jnp.ones((4, 4)),
            "ups_0": {"convs_0": {"gamma": jnp.ones(4)}},
        },
    }


def test_wd_mask_and_lr_scales():
    p = _toy_params()
    mask = wd_mask_tree(p)
    assert mask["decoder"]["to_latents"]["kernel"] is True
    assert mask["decoder"]["to_latents"]["bias"] is False  # 1-D
    assert mask["decoder"]["level_embeds"] is False  # keyword-skipped
    assert mask["encoder"]["cls_token"] is False
    assert mask["encoder"]["stage_0"]["qkv"]["kernel"] is True  # rank-2 after stack
    assert mask["encoder"]["stage_0"]["qkv"]["bias"] is False

    scales = lr_scale_tree(p, encoder_lr_scale=0.02, ld=1.0, num_layers=2)
    assert scales["encoder"]["stage_0"]["qkv"]["kernel"] == 0.02
    assert scales["decoder"]["to_latents"]["kernel"] == 1.0

    # layer decay: per-block array along the stacked axis
    scales_ld = lr_scale_tree(p, 0.02, ld=0.5, num_layers=2)
    arr = np.asarray(scales_ld["encoder"]["stage_0"]["qkv"]["kernel"]).reshape(-1)
    np.testing.assert_allclose(arr, [0.02 * 0.5, 0.02 * 1.0], rtol=1e-6)


def test_optimizer_applies_lr_scales():
    p = _toy_params()
    opt = build_optimizer(
        p, lr=1.0, lr_final=1.0, encoder_lr=0.5, wd=0.0, warmup_iters=0,
        total_iters=10, num_encoder_layers=2, clipping=1e9, cycle_betas=False,
    )
    state = opt.init(p)
    grads = jax.tree.map(jnp.ones_like, p)
    updates, _ = opt.update(grads, state, p)
    enc = float(np.asarray(updates["encoder"]["stage_0"]["qkv"]["kernel"]).ravel()[0])
    dec = float(np.asarray(updates["decoder"]["to_latents"]["kernel"]).ravel()[0])
    np.testing.assert_allclose(enc / dec, 0.5, rtol=1e-4)


def test_ema_ramp():
    p = {"w": jnp.zeros(3)}
    s = ema_init(p)
    # before update_after_step: shadow snaps to params (decay 0)
    s = ema_update(s, {"w": jnp.ones(3)}, decay=0.999, update_after_step=5, tau=10)
    np.testing.assert_allclose(np.asarray(s.shadow["w"]), 1.0)
    # later: decay ramps via tanh
    s = s._replace(num_updates=jnp.asarray(100, jnp.int32))
    s2 = ema_update(s, {"w": jnp.full(3, 2.0)}, decay=0.999, update_after_step=5, tau=10)
    d = float(np.tanh((101 - 5 - 1) / 10) * 0.999)
    np.testing.assert_allclose(np.asarray(s2.shadow["w"]), 1.0 * d + 2.0 * (1 - d), rtol=1e-5)


def test_ema_interval_gating():
    """Reference cadence: with every=10 the shadow moves ONLY on steps
    divisible by 10, with the folded decay (reference scripts/train.py:41,
    474-475); off-interval steps leave it untouched."""
    p0 = {"w": jnp.zeros(2)}
    s = ema_init(p0)
    # past the delay: place the counter just before an interval boundary
    s = s._replace(num_updates=jnp.asarray(98, jnp.int32), shadow={"w": jnp.ones(2)})
    live = {"w": jnp.full(2, 3.0)}
    s99 = ema_update(s, live, decay=0.995, update_after_step=1, tau=2, every=10)
    # step 99: off-interval, shadow unchanged
    np.testing.assert_allclose(np.asarray(s99.shadow["w"]), 1.0)
    s100 = ema_update(s99, live, decay=0.995, update_after_step=1, tau=2, every=10)
    # step 100: interval step, update count 10 -> epoch 8, d=tanh(8/2)*0.995
    d = float(np.tanh(8 / 2) * 0.995)
    np.testing.assert_allclose(
        np.asarray(s100.shadow["w"]), 1.0 * d + 3.0 * (1 - d), rtol=1e-6
    )


def test_train_batch_images_are_normalized():
    """The loader ships raw 0..255 floats; the train step must ImageNet-
    normalize them before encode_decode — a train step on raw pixels and
    one on pre-normalized pixels must see the SAME loss (regression for
    the unnormalized-training bug)."""
    from unidepth_tpu.utils.misc import normalize_rgb

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (2, 4, 4, 3)), jnp.float32
    )
    n = np.asarray(normalize_rgb(x))
    # spot-check the transform itself against the serving constants
    ref = (np.asarray(x) - np.asarray([0.485, 0.456, 0.406]) * 255.0) / (
        np.asarray([0.229, 0.224, 0.225]) * 255.0
    )
    np.testing.assert_allclose(n, ref, rtol=1e-6, atol=1e-6)
    # typical raw pixels land in the unit-scale regime after normalization
    assert np.abs(n).max() < 3.0
