"""Exponential moving average of parameters as a pure pytree transform.

Parity with reference unidepth/utils/ema_torch.py:56-341: tanh decay ramp
``decay_t = tanh(max(updates - update_after_step - 1, 0) / tau) * decay``
and delayed start. State is a pytree — it shards and jits like params.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    shadow: Any  # param pytree
    num_updates: jnp.ndarray  # scalar int32


def ema_init(params) -> EMAState:
    # materialize copies: the shadow must not alias the live params, or
    # donating a train state would donate the same buffer twice
    return EMAState(
        shadow=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        num_updates=jnp.zeros((), jnp.int32),
    )


def ema_update(
    state: EMAState,
    params,
    decay: float = 0.9995,
    update_after_step: int = 7500,
    tau: int = 20000,
    every: int = 1,
) -> EMAState:
    """One (possibly gated) EMA step. With ``every`` > 1 this reproduces
    the reference's interval cadence exactly: the shadow moves only on
    steps divisible by ``every`` (reference scripts/train.py:474
    ``if step % EMA_INTERVAL == 0``), and ``update_after_step``/``tau``
    are in UPDATE units (reference train.py:172-173 divides both by the
    interval). Calling with the folded interval decay on EVERY step would
    shrink the averaging horizon by ~``every``^2."""
    n = state.num_updates + 1
    updates = (n // every).astype(jnp.float32)
    epoch = jnp.maximum(updates - update_after_step - 1, 0.0)
    d = jnp.where(epoch <= 0, 0.0, jnp.tanh(epoch / tau) * decay)
    # off-interval steps keep the shadow untouched (d = 1)
    d = jnp.where(n % every == 0, d, 1.0)
    shadow = jax.tree.map(
        lambda s, p: s - (1.0 - d) * (s - p), state.shadow, params
    )
    return EMAState(shadow=shadow, num_updates=n)
