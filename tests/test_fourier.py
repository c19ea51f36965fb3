"""Parity tests for Fourier features and sine positional embeddings."""

import math

import numpy as np
import torch

import jax.numpy as jnp

from unidepth_tpu.ops.fourier import generate_fourier_features, position_embedding_sine

import pytest

pytestmark = pytest.mark.smoke


def _torch_fourier(x, dim, max_freq, use_cos=False, use_log=False, cat_orig=False):
    # re-implementation of reference utils/positional_embedding.py:218-256
    x_orig = x
    input_dim = x.shape[-1]
    num_bands = dim // (2 * input_dim) if use_cos else dim // input_dim
    if use_log:
        scales = 2.0 ** torch.linspace(0.0, math.log2(max_freq), steps=num_bands)
    else:
        scales = torch.linspace(1.0, max_freq / 2, num_bands)
    x = x.unsqueeze(-1)
    scales = scales[(*((None,) * (len(x.shape) - 1)), Ellipsis)]
    x = x * scales * math.pi
    x = torch.cat([x.sin(), x.cos()] if use_cos else [x.sin()], dim=-1)
    x = x.flatten(-2)
    if cat_orig:
        return torch.cat((x, x_orig), dim=-1)
    return x


def _torch_pos_sine(h, w, num_pos_feats, normalize=True):
    # re-implementation of reference layers/positional_encoding.py:28-57
    mask = torch.zeros((1, h, w), dtype=torch.bool)
    not_mask = ~mask
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    scale = 2 * math.pi
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack(
        (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4
    ).flatten(3)
    pos_y = torch.stack(
        (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4
    ).flatten(3)
    pos = torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)
    return pos


def test_fourier_features_match(rng):
    x = rng.uniform(-2.0, 2.0, size=(2, 50, 2)).astype(np.float32)
    for use_cos in (False, True):
        for use_log in (False, True):
            ref = _torch_fourier(
                torch.from_numpy(x), 512, 32, use_cos=use_cos, use_log=use_log
            ).numpy()
            got = np.asarray(
                generate_fourier_features(
                    jnp.asarray(x), 512, 32, use_cos=use_cos, use_log=use_log
                )
            )
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fourier_cat_orig(rng):
    x = rng.uniform(-1, 1, size=(4, 7, 3)).astype(np.float32)
    ref = _torch_fourier(torch.from_numpy(x), 96, 16, use_log=True, cat_orig=True)
    got = generate_fourier_features(jnp.asarray(x), 96, 16, use_log=True, cat_orig=True)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_position_embedding_sine_matches():
    h, w, f = 19, 27, 128
    ref = _torch_pos_sine(h, w, f, normalize=True)[0].permute(1, 2, 0).numpy()
    got = np.asarray(position_embedding_sine(h, w, num_pos_feats=f, normalize=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
