"""Probe the chip's int8 MXU rate vs bf16 at the model's own GEMM shapes.

Decides whether an int8 serving mode is worth building: v5e datasheet says
394 int8 TOPS vs 197 bf16 TFLOP/s. This measures what XLA actually delivers
for int8 x int8 -> int32 dot_general at ViT-L serving shapes, including the
cost of dynamic per-row activation quantization (abs-max + scale + cast),
with the same chained-fori_loop + value-fetch methodology as bench.py
(host-side timing of single dispatches is unreliable through the tunnel).

Run: python scripts/int8_probe.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# ViT-L serving GEMM shapes at B=8, 518px -> 10952 tokens (8 x 1369)
M, K, N_UP = 10960, 1024, 4096


def _time_chained(step, x0, iters=30, reps=3, flops_per_iter=0.0):
    """Best-of-reps time per iteration of x -> step(x) chained in fori_loop."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda _, x: step(x), x)

    run(x0).block_until_ready()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(x0).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    rate = flops_per_iter / best / 1e12 if flops_per_iter else 0.0
    return best, rate


def main():
    rng = np.random.default_rng(0)
    w_up = jnp.asarray(rng.standard_normal((K, N_UP)) * 0.02, jnp.bfloat16)
    w_dn = jnp.asarray(rng.standard_normal((N_UP, K)) * 0.02, jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    flops = 2 * M * K * N_UP * 2  # up + down projection per iter

    # --- bf16 reference chain (the bench.py calibration shape) -----------
    def bf16_step(x):
        h = jnp.dot(x, w_up, preferred_element_type=jnp.float32)
        y = jnp.dot(h.astype(jnp.bfloat16), w_dn, preferred_element_type=jnp.float32)
        return (y / N_UP).astype(jnp.bfloat16)  # keep magnitudes sane

    t, r = _time_chained(bf16_step, x0, flops_per_iter=flops)
    print(f"bf16   MLP up/down: {t * 1e3:8.3f} ms  {r:7.1f} TFLOP/s")

    # --- pure int8 chain (weights + activations pre-quantized; upper bound)
    w_up_q = jnp.asarray(rng.integers(-127, 127, (K, N_UP)), jnp.int8)
    w_dn_q = jnp.asarray(rng.integers(-127, 127, (N_UP, K)), jnp.int8)
    x0_q = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)

    dot_i8 = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    def int8_pure_step(x):
        h = dot_i8(x, w_up_q)
        h8 = (h >> 12).astype(jnp.int8)  # cheap requantize stand-in
        y = dot_i8(h8, w_dn_q)
        return (y >> 12).astype(jnp.int8)

    t, r = _time_chained(int8_pure_step, x0_q, flops_per_iter=flops)
    print(f"int8   pure (pre-quantized, shift requant): {t * 1e3:8.3f} ms  {r:7.1f} TOP/s")

    # --- realistic serving step: bf16 activation -> dynamic per-row quant
    #     -> int8 GEMM -> dequant (per-row x per-col scales) -> bf16
    w_up_scale = jnp.max(jnp.abs(w_up.astype(jnp.float32)), axis=0) / 127.0
    w_up_qr = jnp.clip(
        jnp.round(w_up.astype(jnp.float32) / w_up_scale), -127, 127
    ).astype(jnp.int8)
    w_dn_scale = jnp.max(jnp.abs(w_dn.astype(jnp.float32)), axis=0) / 127.0
    w_dn_qr = jnp.clip(
        jnp.round(w_dn.astype(jnp.float32) / w_dn_scale), -127, 127
    ).astype(jnp.int8)

    def quant_rows(x):
        s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        return q, s

    def int8_dyn_step(x):
        q, s = quant_rows(x)
        h = dot_i8(q, w_up_qr).astype(jnp.float32) * (s * w_up_scale[None, :])
        h = h.astype(jnp.bfloat16)
        q2, s2 = quant_rows(h)
        y = dot_i8(q2, w_dn_qr).astype(jnp.float32) * (s2 * w_dn_scale[None, :])
        return (y / N_UP).astype(jnp.bfloat16)

    t, r = _time_chained(int8_dyn_step, x0, flops_per_iter=flops)
    print(f"int8   dynamic per-row quant + dequant:     {t * 1e3:8.3f} ms  {r:7.1f} TOP/s")

    # --- mixed: int8 weights x bf16 activations (weight-only; MXU stays bf16)
    def w8a16_step(x):
        h = jnp.dot(
            x, (w_up_qr.astype(jnp.bfloat16) * w_up_scale.astype(jnp.bfloat16)),
            preferred_element_type=jnp.float32,
        )
        y = jnp.dot(
            h.astype(jnp.bfloat16),
            (w_dn_qr.astype(jnp.bfloat16) * w_dn_scale.astype(jnp.bfloat16)),
            preferred_element_type=jnp.float32,
        )
        return (y / N_UP).astype(jnp.bfloat16)

    t, r = _time_chained(w8a16_step, x0, flops_per_iter=flops)
    print(f"w8a16  (weight-only int8, bf16 MXU):        {t * 1e3:8.3f} ms  {r:7.1f} TFLOP/s")

    # --- numerics: dynamic-int8 vs fp32 on one GEMM pair -----------------
    x_small = jnp.asarray(rng.standard_normal((256, K)), jnp.float32)
    ref = jnp.dot(
        jnp.dot(x_small, w_up.astype(jnp.float32)), w_dn.astype(jnp.float32)
    )
    got = int8_dyn_step(x_small.astype(jnp.bfloat16)).astype(jnp.float32) * N_UP
    rel = jnp.abs(got - ref) / (jnp.abs(ref) + 1e-3)
    print(
        f"numerics dyn-int8 vs fp32: mean rel {float(jnp.mean(rel)):.4f} "
        f"p99 {float(jnp.quantile(rel, 0.99)):.4f}"
    )


if __name__ == "__main__":
    main()
