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
) -> EMAState:
    n = state.num_updates + 1
    epoch = jnp.maximum(n.astype(jnp.float32) - update_after_step - 1, 0.0)
    d = jnp.where(epoch <= 0, 0.0, jnp.tanh(epoch / tau) * decay)
    shadow = jax.tree.map(
        lambda s, p: s - (1.0 - d) * (s - p), state.shadow, params
    )
    return EMAState(shadow=shadow, num_updates=n)
