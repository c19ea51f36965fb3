"""Tap-stacked Pallas conv kernel correctness (TPU-interpret mode on CPU).

The kernel is a measured-neutral experiment at serving shapes (see
docs/PERF.md round-2 lever study) kept as the double-buffered-DMA
reference implementation; on-chip correctness was verified on v5e
(exact match vs XLA at Cout=32, bf16-accumulation-order drift at 128->64).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from unidepth_tpu.ops.conv_kernels import _xla_conv3x3, conv3x3_lowchannel


@pytest.mark.parametrize(
    "shape,mode",
    [
        ((2, 21, 37, 16, 8), "reflect"),
        ((1, 10, 40, 32, 16), "zeros"),
        ((1, 9, 13, 8, 4), "replicate"),
    ],
)
def test_conv3x3_lowchannel_matches_xla(shape, mode, rng):
    b, h, w, cin, cout = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    ref = _xla_conv3x3(x, wk, bias, mode)
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_lowchannel(x, wk, bias, mode, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_conv3x3_lowchannel_grad_matches_xla(rng):
    b, h, w, cin, cout = 1, 8, 12, 8, 4
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    def loss_pallas(x, wk, bias):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv3x3_lowchannel(x, wk, bias, "zeros", 4) ** 2)

    def loss_xla(x, wk, bias):
        return jnp.sum(_xla_conv3x3(x, wk, bias, "zeros") ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, wk, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, wk, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)
