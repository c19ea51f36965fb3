"""Benchmark: UniDepthV2 ViT-L/14 518x518 full-pipeline inference
throughput per chip — the documented serving configuration: the jitted
``infer()`` program ('full' granularity, depth-only outputs), i.e.
normalize/pad/resize + encoder + decoder + postprocess in one XLA program
(models/unidepthv2/model.py:_build_run).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: N forward passes are chained *inside one jitted fori_loop*
(each iteration's input depends on the previous output, so XLA cannot
elide or overlap them) and the single call is timed end-to-end. This is
robust against async-dispatch timing artifacts on remote/tunneled devices.

The reference publishes no images/sec numbers (BASELINE.md), so the
headline ratio is reported against two targets:

  * ``vs_baseline`` — analytic roofline: model FLOPs / (v5e bf16 datasheet
    peak * 45% assumed MXU utilization). The 45% is an assumption; the
    r2 lever study (docs/PERF.md) measured this chip's practical dense
    ceiling well below it.
  * ``vs_calibrated`` — the same model FLOPs against the dense-GEMM rate
    MEASURED on this chip at startup (~1 s: chained large bf16 matmuls in
    one jitted fori_loop). This is the honest speed-of-light for these
    numerics on this part; >1.0 means the pipeline beats plain-GEMM
    throughput (the flash kernel's fused softmax does exactly that).
"""

import json
import time
import warnings
from pathlib import Path

_ROOT = Path(__file__).resolve().parent


def _model_flops(tokens: int) -> float:
    """ViT-L/14 encoder FLOPs per image (+~35% decoder factor)."""
    d = 1024
    mlp_qkvo_flops = 24 * (12 * d * d) * 2 * tokens
    attn_flops = 24 * 2 * 2 * tokens * tokens * d
    return (mlp_qkvo_flops + attn_flops) * 1.35


def _roofline_target(tokens: int) -> float:
    """Analytic images/sec at 45% of the v5e bf16 datasheet peak."""
    peak = 197e12  # v5e bf16 peak FLOP/s
    util = 0.45
    return peak * util / _model_flops(tokens)


def _measure_dense_rate(jax, jnp) -> float:
    """Measured bf16 dense-GEMM FLOP/s on this chip AT THE MODEL'S OWN GEMM
    SHAPES: chained ViT-L MLP up/down projections ((B*N, d) @ (d, 4d) then
    @ (4d, d)) inside one jitted fori_loop — each iteration consumes the
    previous output, so XLA cannot elide them; value-fetch barrier.

    Shape choice matters doubly here: an ideal square 4096^3 chain runs at
    ~165 TFLOP/s on this part while the model-shaped d=1024 projections run
    at ~73-75 — calibrating against the former would claim a "ceiling" no
    program built from these layers can reach. And the chain must run
    ~0.5 s: at a 30-40 ms run the host->device tunnel round-trip (~10 ms)
    biases the measured rate low by ~25%."""
    import numpy as np

    m, d, iters = 8 * 1369, 1024, 192  # B=8 x 37x37 tokens, ViT-L width
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, d)) / d**0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, 4 * d)) / d**0.5, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * d, d)) / (4 * d) ** 0.5, jnp.bfloat16)

    @jax.jit
    def chain(x, w1, w2):
        def body(_, x):
            h = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
            return jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)

        out = jax.lax.fori_loop(0, iters, body, x)
        return jnp.float32(out[0, 0])

    float(chain(x, w1, w2))  # compile + warmup
    dt = min(
        _timed(lambda: float(chain(x, w1, w2))) for _ in range(3)
    )  # best-of-3: host jitter through the tunnel must not skew the ceiling
    return iters * 2 * 2 * m * d * 4 * d / dt


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax

    from unidepth_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax)
    import jax.numpy as jnp
    import numpy as np

    from unidepth_tpu.models.unidepthv2.model import UniDepthV2

    warnings.filterwarnings("ignore")
    cfg = json.loads((_ROOT / "configs/config_v2_vitl14.json").read_text())
    model = UniDepthV2.from_config(cfg)  # bf16 compute on TPU
    B, H, W = 8, 518, 518
    model.init_params(seed=0, image_shape=(126, 126))
    params = model._serving_params()  # bf16-cast weights (serving path)
    rgb = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, 3)), jnp.float32
    )

    # The deployment flow's conversion-time step: audit max |prescaled
    # attention logit| on this input (scripts/convert.py --verify does the
    # same for real checkpoints). Serving only traces the max-free softmax
    # kernel when the audited bound clears the margin — for these weights
    # the bound is O(1), far under the clamp at 80.
    model.audit_attention_logits(model._audit_preprocess(rgb[:1]))

    # The EXACT serving shape bucket infer() would select for this input
    # (resolution_level unset -> full pixel bounds), depth-only outputs —
    # shared helper, so the bench can't drift from the real serving program.
    key = model.serving_shape_key((H, W), outputs=("depth",))
    run = model._build_run(key)

    # ~4 s of chained forwards per timed call: long enough that the tunnel
    # round-trip and the scalar value-fetch barrier cost <0.3% of the
    # measurement (at N=10 they shaved ~1% off the reported throughput).
    N = 30

    @jax.jit
    def bench_fn(params, x):
        def body(_, carry):
            x_i, acc = carry
            out = run(params, x_i, None)
            s = jnp.mean(out["depth"]) * 1e-12  # chain dependency
            return (x_i + s, acc + s)

        return jax.lax.fori_loop(0, N, body, (x, jnp.float32(0.0)))

    # compile + warmup. NOTE: on tunneled devices block_until_ready can
    # return before remote execution finishes; fetching the scalar value is
    # the only reliable completion barrier.
    _, acc = bench_fn(params, rgb)
    float(acc)

    t0 = time.perf_counter()
    _, acc = bench_fn(params, rgb)
    float(acc)
    dt = time.perf_counter() - t0
    ips = B * N / dt

    new_hw = key[4]  # network resolution selected by the bucket
    tokens = (new_hw[0] // 14) * (new_hw[1] // 14)
    target = _roofline_target(tokens)
    dense_rate = _measure_dense_rate(jax, jnp)
    calibrated_target = dense_rate / _model_flops(tokens)
    print(
        json.dumps(
            {
                "metric": "unidepthv2_vitl14_518px_full_infer",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / target, 4),
                "vs_calibrated": round(ips / calibrated_target, 4),
                "calibrated_dense_tflops": round(dense_rate / 1e12, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
