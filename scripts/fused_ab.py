"""A/B microbench for the r5 fused encoder-block kernels (VERDICT r4 #1).

PERF.md's r4 roofline left ~17 ms of the 518px B=8 serving step as encoder
elementwise traffic between GEMMs (LN round trips + the slice/pad/unslice
copies around the opaque attention pallas_call). This measures the r5
levers at the ViT-L serving shape with the chained-fori_loop methodology
(best-of-3, value-fetch barrier; see docs/PERF.md "Calibration"):

  block level (one ViTBlock forward, B=8 N=1370 C=1024 H=16 bf16):
    block_base   — r4 production path (fused="off")
    block_fused  — fused ln_qkv + QKV-direct ragged attention + ln_fc1_gelu

  op level:
    ln_qkv_xla / ln_qkv_fused       — LN1 -> qkv GEMM (F=3072)
    ln_fc1_xla / ln_fc1_fused       — LN2 -> fc1 GEMM + exact GELU (F=4096)
    attn_padded / attn_qkv_ragged   — packed tr kernel: sliced+padded
                                      operands vs direct (B,N,3C) reads

Run on the real chip: python scripts/fused_ab.py [--iters 150]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))

import jax
import jax.numpy as jnp

from unidepth_tpu.utils.cache import setup_compile_cache

setup_compile_cache(jax)

from unidepth_tpu.models.backbones.dinov2 import ViTBlock
from unidepth_tpu.ops.flash_attention import (
    flash_attention_packed,
    flash_attention_qkv,
)
from unidepth_tpu.ops.fused_block import _xla_ln_dense, ln_dense


def time_chained(fn, x, iters, extra=()):
    """Chain ``iters`` calls of fn inside one jit; the output perturbs the
    next input so nothing folds; a scalar fetch is the completion barrier."""

    @jax.jit
    def loop(x):
        def body(_, carry):
            xx, acc = carry
            out = fn(xx, *extra)
            s = jnp.mean(out[..., : x.shape[-1]].reshape(x.shape[0], -1)).astype(
                jnp.float32
            )
            return ((xx + s * 1e-12).astype(xx.dtype), acc + s)

        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))

    _, acc = loop(x)
    float(acc)
    print(f"[{time.strftime('%H:%M:%S')}]   chain compiled", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _, acc = loop(x)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=1370)
    ap.add_argument("--c", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=16)
    args = ap.parse_args()
    b, n, c, h = args.b, args.n, args.c, args.heads
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    x = jnp.asarray(rng.standard_normal((b, n, c)) * 0.5, dt)

    # ---- block level --------------------------------------------------
    results = {}
    blocks = {
        "block_base": ViTBlock(dim=c, num_heads=h, fused="off", dtype=dt),
        "block_fused": ViTBlock(dim=c, num_heads=h, fused="on", dtype=dt),
    }
    params = blocks["block_base"].init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params
    )
    ref_out = None
    for name, blk in blocks.items():
        print(f"[{time.strftime('%H:%M:%S')}] compiling {name}...", flush=True)
        fn = lambda xx, blk=blk: blk.apply(params, xx)[0]
        out = jax.jit(fn)(x)
        out.block_until_ready()
        print(f"[{time.strftime('%H:%M:%S')}] {name} forward done", flush=True)
        if ref_out is None:
            ref_out = out.astype(jnp.float32)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref_out)))
        dt_s = time_chained(fn, x, args.iters)
        results[name] = dt_s
        print(f"{name:>16}: {dt_s*1e3:7.3f} ms  max-abs-err {err:.2e}", flush=True)

    # ---- op level: LN -> GEMM -----------------------------------------
    for fdim, act, tag in ((3 * c, None, "ln_qkv"), (4 * c, "gelu", "ln_fc1")):
        w = jnp.asarray(rng.standard_normal((c, fdim)) * 0.02, dt)
        bb = jnp.zeros((fdim,), jnp.float32)
        g = jnp.ones((c,), jnp.float32)
        bt = jnp.zeros((c,), jnp.float32)
        xla_fn = lambda xx, w=w, bb=bb, act=act: _xla_ln_dense(
            xx, w, bb, g, bt, 1e-6, act
        )
        fus_fn = lambda xx, w=w, bb=bb, act=act: ln_dense(xx, w, bb, g, bt, 1e-6, act)
        e = float(
            jnp.max(jnp.abs(fus_fn(x).astype(jnp.float32) - xla_fn(x).astype(jnp.float32)))
        )
        for nm, fn in ((f"{tag}_xla", xla_fn), (f"{tag}_fused", fus_fn)):
            dt_s = time_chained(fn, x, args.iters)
            results[nm] = dt_s
            print(f"{nm:>16}: {dt_s*1e3:7.3f} ms  (fused-vs-xla err {e:.2e})", flush=True)

    # ---- op level: attention feed -------------------------------------
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)) * 0.3, dt)
    scale = (c // h) ** -0.5

    def padded(t):
        return flash_attention_packed(
            t[..., :c], t[..., c : 2 * c], t[..., 2 * c :], h, scale
        )

    def ragged(t):
        # contract: q pre-scaled — fold into the q lanes here
        tq = jnp.concatenate([t[..., :c] * scale, t[..., c:]], axis=-1).astype(t.dtype)
        return flash_attention_qkv(tq, h)

    def ragged_prescaled(t):
        return flash_attention_qkv(t, h)

    e = float(
        jnp.max(jnp.abs(ragged(qkv).astype(jnp.float32) - padded(qkv).astype(jnp.float32)))
    )
    for nm, fn in (
        ("attn_padded", padded),
        ("attn_qkv_ragged", ragged),
        ("attn_qkv_presc", ragged_prescaled),
    ):
        dt_s = time_chained(fn, qkv, args.iters)
        results[nm] = dt_s
        print(f"{nm:>16}: {dt_s*1e3:7.3f} ms  (ragged-vs-padded err {e:.2e})", flush=True)

    speedup = results["block_base"] / results["block_fused"]
    est = 24 * (results["block_base"] - results["block_fused"]) * 1e3
    print(
        f"\nblock speedup {speedup:.3f}x; est. 24-layer serving saving ~{est:.1f} ms"
    )


if __name__ == "__main__":
    main()
