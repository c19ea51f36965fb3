"""Benchmark: UniDepthV2 ViT-L/14 518x518 inference throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no images/sec numbers (BASELINE.md), so
``vs_baseline`` reports the ratio against a fixed roofline-derived target
for this chip (see _roofline_target): 1.0 means we hit the analytic
speed-of-light estimate for the model's FLOPs at the chip's peak bf16
throughput and a 45% MXU utilization assumption.
"""

import json
import time

import numpy as np


def _roofline_target(batch: int, tokens: int) -> float:
    """Analytic images/sec at assumed utilization for ViT-L/14 + V2 decoder."""
    # ViT-L: 24 blocks, d=1024: per token ~ 12*d^2 matmul MACs + attention
    d = 1024
    per_token_flops = 24 * (12 * d * d) * 2
    attn_flops = 24 * 2 * 2 * tokens * d * 2  # qk^T + av per token
    vit = tokens * per_token_flops + tokens * attn_flops
    decoder = 0.35 * vit  # measured decoder share is roughly a third
    total = vit + decoder
    peak = 394e12  # v5e bf16 peak FLOP/s
    util = 0.45
    return peak * util / total


def main():
    import jax
    import jax.numpy as jnp

    from unidepth_tpu.models.unidepthv2.model import UniDepthV2

    cfg = json.loads(open("configs/config_v2_vitl14.json").read())
    model = UniDepthV2.from_config(cfg)  # bf16 compute on TPU
    model.resolution_level = 9

    B, H, W = 8, 518, 518
    params = model.init_params(seed=0, image_shape=(126, 126))
    rgb = np.random.default_rng(0).integers(0, 255, (B, H, W, 3), dtype=np.uint8)

    # warmup / compile
    out = model.infer(rgb)
    jax.block_until_ready(out["depth"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = model.infer(rgb)
    jax.block_until_ready(out["depth"])
    dt = time.perf_counter() - t0
    ips = B * iters / dt

    tokens = (H // 14) * (W // 14)
    target = _roofline_target(B, tokens)
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
