"""Warmup + cosine schedules (reference unidepth/ops/scheduler.py:61-122).

The reference precomputes numpy tables per optimizer param group; here each
schedule is a pure function of the step, usable directly inside a jitted
optimizer via ``optax.inject_hyperparams``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cosine_warmup", "betas_schedule"]


def cosine_warmup(
    base_value: float,
    final_value: float,
    warmup_iters: int,
    total_iters: int,
    init_value: float | None = None,
):
    """Linear ``init -> base`` over ``warmup_iters`` then half-cosine
    ``base -> final`` over the remainder; clamps past ``total_iters``."""
    if init_value is None:
        init_value = base_value
    main_len = max(total_iters - warmup_iters, 1)

    def schedule(step):
        step = jnp.minimum(step, total_iters)
        warm = init_value + (base_value - init_value) * (
            step / jnp.maximum(warmup_iters - 1, 1)
        )
        t = (step - warmup_iters) / main_len
        cos = final_value + 0.5 * (base_value - final_value) * (
            1.0 + jnp.cos(jnp.pi * jnp.clip(t, 0.0, 1.0))
        )
        return jnp.where(step < warmup_iters, warm, cos)

    return schedule


def betas_schedule(cycle: bool, warmup_iters: int, total_iters: int):
    """beta1 cycling 0.95 -> 0.85 -> 0.95 when enabled
    (reference scripts/train.py:356-364), else constant 0.9."""
    if not cycle:
        return lambda step: jnp.asarray(0.9)
    return cosine_warmup(0.85, 0.95, warmup_iters, total_iters, init_value=0.95)
