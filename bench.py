"""Benchmark: UniDepthV2 ViT-L/14 518x518 inference throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: N forward passes are chained *inside one jitted fori_loop*
(each iteration's input depends on the previous output, so XLA cannot
elide or overlap them) and the single call is timed end-to-end. This is
robust against async-dispatch timing artifacts on remote/tunneled devices.

The reference publishes no images/sec numbers (BASELINE.md), so
``vs_baseline`` reports the ratio against an analytic roofline target:
model FLOPs / (v5e bf16 peak * 45% assumed MXU utilization).
"""

import json
import time
import warnings


def _roofline_target(tokens: int) -> float:
    """Analytic images/sec for ViT-L/14 (+decoder ~35%) at assumed util."""
    d = 1024
    mlp_qkvo_flops = 24 * (12 * d * d) * 2 * tokens
    attn_flops = 24 * 2 * 2 * tokens * tokens * d
    vit = mlp_qkvo_flops + attn_flops
    total = vit * 1.35
    peak = 197e12  # v5e bf16 peak FLOP/s
    util = 0.45
    return peak * util / total


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from unidepth_tpu.models.unidepthv2.model import UniDepthV2

    warnings.filterwarnings("ignore")
    cfg = json.loads(open("configs/config_v2_vitl14.json").read())
    model = UniDepthV2.from_config(cfg)  # bf16 compute on TPU
    B, H, W = 8, 518, 518
    model.init_params(seed=0, image_shape=(126, 126))
    params = model._serving_params()  # bf16-cast weights (serving path)
    rgb = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, 3)), jnp.float32
    )

    N = 10

    @jax.jit
    def bench_fn(params, x):
        def body(_, carry):
            x_i, acc = carry
            out = model.encode_decode(params, x_i)
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

    tokens = (H // 14) * (W // 14)
    target = _roofline_target(tokens)
    print(
        json.dumps(
            {
                "metric": "unidepthv2_vitl14_518px_infer",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
