"""A/B microbench for r4 packed flash-kernel variants (VERDICT r3 #3).

The r3 packed kernel runs 50.9 TFLOP/s at the serving shape
(B=8, H=16, N=1370, D=64) vs a ~109 TFLOP/s d=64 composite ceiling;
docs/PERF.md names the remaining gap as the fp32 score-slab VPU chain
(mask select, row max, exp, row sum). This script measures the named
levers with the chained-fori_loop methodology (best-of-3, chained calls
inside one jit):

  base      — shipped _packed_kernel
  bf16p     — exp output cast to bf16 before l-sum and PV (halves p slab
              traffic; SAME rounded p feeds numerator and denominator, so
              softmax stays an exact weighted average of v rows)
  lmxu      — row sum l computed on the MXU as p @ ones instead of a VPU
              reduce pass
  bf16p+lmxu— both
  noexp     — exp replaced by identity (invalid numerics; transcendental
              cost bound)
  nomax     — row-max pass skipped, constant shift 0 (valid ONLY when all
              scores <= ~80; padded k columns give score exactly 0 so the
              shift is stability-safe for nonpositive score rows; measured
              for the bound, not shipped without a guard)

Run on the real chip: python scripts/kernel_ab.py [--iters 100]
Accuracy is reported against fp32 XLA attention for every variant.
"""

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unidepth_tpu.ops.flash_attention import (
    _pick_blk_q_packed,
    _xla_attention_packed,
    flash_attention_packed,
)

_NEG_INF = -1e30


def make_kernel(variant: str, n_real: int, d: int):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        n_pad = k_ref.shape[1]
        blk_c = q_ref.shape[2]
        blk_q = q_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (blk_q, n_pad), 1)
        for off in range(0, blk_c, d):
            q = q_ref[0, :, off : off + d]
            if variant == "qk_only":
                s = jax.lax.dot_general(
                    q, k_ref[0, :, off : off + d],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[0, :, off : off + d] = s[:, :d].astype(o_ref.dtype)
                continue
            if variant == "pv_only":
                p = (q[:, :1] * jnp.ones((1, n_pad), q.dtype)).astype(v_ref.dtype)
                acc = jax.lax.dot_general(
                    p, v_ref[0, :, off : off + d],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[0, :, off : off + d] = acc.astype(o_ref.dtype)
                continue
            if variant.startswith("tr"):
                # all-transposed: sT = k @ qT has full-width (blk_q) output
                # lanes; transposed PV contracts 1408 with (64, blk_q)
                # output — no MXU output-lane padding anywhere. Softmax
                # runs over the SUBLANE axis.
                k_b = k_ref[0, :, off : off + d]  # (n_pad, d)
                sT = jax.lax.dot_general(
                    k_b, q,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (n_pad, blk_q)
                vT = v_ref[0, :, off : off + d].T  # (d, n_pad)
                if variant == "tr_gemmonly":
                    pT = sT.astype(v_ref.dtype)
                    accT = jax.lax.dot_general(
                        vT, pT,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    o_ref[0, :, off : off + d] = accT.T.astype(o_ref.dtype)
                    continue
                rowi = jax.lax.broadcasted_iota(jnp.int32, (n_pad, blk_q), 0)
                if variant == "tr_max":
                    # SAFE numerics: per-query max over the sublane axis
                    sT = jnp.where(rowi < n_real, sT, _NEG_INF)
                    m = jnp.max(sT, axis=0, keepdims=True)  # (1, blk_q)
                    pT32 = jnp.exp(sT - m)
                else:
                    sT = jnp.where(rowi < n_real, jnp.minimum(sT, 80.0), _NEG_INF)
                    pT32 = jnp.exp(sT)
                pT = pT32.astype(v_ref.dtype)
                if variant == "tr_lmxu":
                    ones = jnp.ones((1, n_pad), v_ref.dtype)
                    l = jax.lax.dot_general(
                        ones, pT,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, blk_q)
                else:
                    l = jnp.sum(pT32, axis=0, keepdims=True)  # (1, blk_q)
                accT = jax.lax.dot_general(
                    vT, pT,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (d, blk_q)
                outT = accT / jnp.maximum(l, 1e-30)
                o_ref[0, :, off : off + d] = outT.T.astype(o_ref.dtype)
                continue
            if variant in ("kt", "kt_guard"):
                kt = k_ref[0, :, off : off + d].T  # (d, n_pad) in-kernel relayout
                s = jax.lax.dot_general(
                    q, kt,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if variant == "kt_guard":
                    s = jnp.where(col < n_real, jnp.minimum(s, 80.0), _NEG_INF)
                    p32 = jnp.exp(s)
                    l = jnp.sum(p32, axis=-1, keepdims=True)
                    p = p32.astype(v_ref.dtype)
                    acc = jax.lax.dot_general(
                        p, v_ref[0, :, off : off + d],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    o_ref[0, :, off : off + d] = (
                        acc / jnp.maximum(l, 1e-30)
                    ).astype(o_ref.dtype)
                    continue
                o_ref[0, :, off : off + d] = s[:, :d].astype(o_ref.dtype)
                continue
            s = jax.lax.dot_general(
                q, k_ref[0, :, off : off + d],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if variant == "gemmonly":
                # GEMM floor: no mask/max/exp/sum — invalid numerics
                p = s.astype(v_ref.dtype)
                acc = jax.lax.dot_general(
                    p, v_ref[0, :, off : off + d],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[0, :, off : off + d] = acc.astype(o_ref.dtype)
                continue
            if variant == "nomax_guard":
                # raw exp, no row-max pass; clamp is the fp32-overflow guard
                # (exp safe to s<=88; trained prescaled ViT logits are <30).
                # padded cols -> -inf -> exp 0, so l needs no correction.
                s = jnp.where(col < n_real, jnp.minimum(s, 80.0), _NEG_INF)
                m = jnp.zeros((blk_q, 1), jnp.float32)
            else:
                s = jnp.where(col < n_real, s, _NEG_INF)
                if variant == "nomax":
                    m = jnp.zeros((blk_q, 1), jnp.float32)
                else:
                    m = jnp.max(s, axis=-1, keepdims=True)
            if variant == "noexp":
                p32 = s - m
            else:
                p32 = jnp.exp(s - m)
            if variant in ("bf16p", "bf16p+lmxu"):
                p = p32.astype(v_ref.dtype)
                if variant == "bf16p+lmxu":
                    ones = jnp.ones((n_pad, 1), v_ref.dtype)
                    l = jax.lax.dot_general(
                        p, ones,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    l = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            elif variant == "lmxu":
                p = p32.astype(v_ref.dtype)
                ones = jnp.ones((n_pad, 1), v_ref.dtype)
                l = jax.lax.dot_general(
                    p, ones,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                l = jnp.sum(p32, axis=-1, keepdims=True)
                p = p32.astype(v_ref.dtype)
            acc = jax.lax.dot_general(
                p, v_ref[0, :, off : off + d],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, off : off + d] = (acc / jnp.maximum(l, 1e-30)).astype(
                o_ref.dtype
            )

    return kernel


def make_bd_kernel(n_real: int, d: int, l_on_mxu: bool):
    """Block-diagonal head-pair kernel: one QK GEMM with 128-deep
    contraction and 2*n_pad-wide output covers BOTH heads of the 128-lane
    group (the off-diagonal zero blocks of K_bd kill cross-head terms),
    and one PV GEMM with 2*n_pad-deep contraction and 128-wide output.
    Both GEMMs run at full MXU width/depth at the cost of 2x padded MACs."""

    def kernel(q_ref, kbd_ref, vbd_ref, mask_ref, o_ref):
        n2 = kbd_ref.shape[2]  # 2 * n_pad
        blk_q = q_ref.shape[1]
        qb = q_ref[0]  # (blk_q, 128) pre-scaled
        s = jax.lax.dot_general(
            qb, kbd_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, 2*n_pad)
        # guard + pad mask in one fused elementwise pass: mask_ref is a
        # precomputed (1, 2*n_pad) 0/1 row
        p32 = jnp.exp(jnp.minimum(s, 80.0)) * mask_ref[0]
        p = p32.astype(vbd_ref.dtype)
        half = n2 // 2
        if l_on_mxu:
            # both half-sums as ONE (blk_q, 2) GEMM: p @ [[1,0]...[0,1]]
            # (row r column c is 1 iff key r belongs to head-half c)
            row = jax.lax.broadcasted_iota(jnp.int32, (n2, 2), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (n2, 2), 1)
            ones2 = ((row < half) == (col == 0)).astype(vbd_ref.dtype)
            lb = jax.lax.dot_general(
                p, ones2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (blk_q, 2)
            l0, l1 = lb[:, :1], lb[:, 1:]
        else:
            l0 = jnp.sum(p32[:, :half], axis=-1, keepdims=True)  # (blk_q, 1)
            l1 = jnp.sum(p32[:, half:], axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p, vbd_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, 128)
        div = jnp.concatenate(
            [
                jnp.broadcast_to(l0, (blk_q, d)),
                jnp.broadcast_to(l1, (blk_q, d)),
            ],
            axis=-1,
        )
        o_ref[0] = (acc / jnp.maximum(div, 1e-30)).astype(o_ref.dtype)

    return kernel


def run_bd(q, k, v, num_heads, scale, blk_q=None, l_on_mxu=False):
    b, nq, c = q.shape
    d = c // num_heads
    g = c // 128
    nk = k.shape[1]
    n_pad_k = -(-nk // 128) * 128
    qs = (q * jnp.asarray(scale, jnp.float32)).astype(q.dtype)
    if blk_q is None:
        blk_q = _pick_blk_q_packed(nq, 2 * n_pad_k)
    n_pad_q = -(-nq // blk_q) * blk_q
    qp = jnp.pad(qs, ((0, 0), (0, n_pad_q - nq), (0, 0)))
    # K_bd/V_bd: (B, G, 2*n_pad, 128) block-diagonal per head pair
    def bd(x):
        xp = jnp.pad(x, ((0, 0), (0, n_pad_k - nk), (0, 0)))
        xh = xp.reshape(b, n_pad_k, g, 2, d)  # head pair split
        z = jnp.zeros((b, n_pad_k, g, 2, d), x.dtype)
        top = jnp.concatenate([xh[..., 0, :], z[..., 0, :]], axis=-1)  # h0 | 0
        bot = jnp.concatenate([z[..., 1, :], xh[..., 1, :]], axis=-1)  # 0 | h1
        out = jnp.stack([top, bot], axis=2)  # (b, n_pad, 2, g, 128)
        return out.transpose(0, 3, 2, 1, 4).reshape(b, g, 2 * n_pad_k, 128)

    kbd, vbd = bd(k), bd(v)
    maskrow = (
        (np.arange(2 * n_pad_k) % n_pad_k) < nk
    ).astype(np.float32).reshape(1, -1)
    maskrow = jnp.asarray(maskrow)
    grid = (b, g, n_pad_q // blk_q)
    out = pl.pallas_call(
        make_bd_kernel(nk, d, l_on_mxu),
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, blk_q, 128), lambda b, g, i: (b, i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * n_pad_k, 128), lambda b, g, i: (b, g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * n_pad_k, 128), lambda b, g, i: (b, g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * n_pad_k), lambda b, g, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, 128), lambda b, g, i: (b, i, g), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad_q, c), q.dtype),
    )(qp, kbd, vbd, maskrow)
    return out[:, :nq]


def run_variant(variant, q, k, v, num_heads, scale):
    if variant == "base":
        return flash_attention_packed(q, k, v, num_heads, scale)
    if variant.startswith("bd"):
        blk = None
        if "352" in variant:
            blk = 352
        if "176" in variant:
            blk = 176
        return run_bd(q, k, v, num_heads, scale, blk_q=blk, l_on_mxu="lmxu" in variant)
    b, nq, c = q.shape
    d = c // num_heads
    nk = k.shape[1]
    qs = (q * jnp.asarray(scale, jnp.float32)).astype(q.dtype)
    blk_q = _pick_blk_q_packed(nq, -(-nk // 128) * 128)
    if variant == "oneblk":  # single q block (ignores the VMEM budget)
        blk_q = -(-nq // 16) * 16
        variant = "nomax_guard"
    n_pad_q = -(-nq // blk_q) * blk_q
    n_pad_k = -(-nk // 128) * 128
    qp = jnp.pad(qs, ((0, 0), (0, n_pad_q - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad_k - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad_k - nk), (0, 0)))
    grid = (b, c // 128, n_pad_q // blk_q)
    out = pl.pallas_call(
        make_kernel(variant, nk, d),
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, blk_q, 128), lambda b, g, i: (b, i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, 128), lambda b, g, i: (b, 0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, 128), lambda b, g, i: (b, 0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, 128), lambda b, g, i: (b, i, g), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad_q, c), q.dtype),
    )(qp, kp, vp)
    return out[:, :nq]


def time_chained(fn, q, k, v, iters):
    @jax.jit
    def loop(q, k, v):
        def body(_, carry):
            x, acc = carry
            out = fn(x, k, v)
            s = jnp.mean(out).astype(jnp.float32)
            return ((x + s * 1e-12).astype(x.dtype), acc + s)

        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0.0)))

    _, acc = loop(q, k, v)
    float(acc)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _, acc = loop(q, k, v)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--n", type=int, default=1370)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument(
        "--variants",
        default="base,bf16p,lmxu,bf16p+lmxu,noexp,nomax",
    )
    args = ap.parse_args()

    b, h, n, d = args.b, args.heads, args.n, args.d
    c = h * d
    scale = d**-0.5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    ref = _xla_attention_packed(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        scale, h,
    )
    flops = 4 * n * n * d * b * h
    print(f"shape B={b} H={h} N={n} D={d}; {flops/1e9:.1f} GFLOP/call")
    for variant in args.variants.split(","):
        fn = functools.partial(run_variant, variant, num_heads=h, scale=scale)
        run = lambda q, k, v: fn(q, k, v)
        out = run(q, k, v)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        dt = time_chained(run, q, k, v, args.iters)
        print(
            f"{variant:>11}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TFLOP/s  "
            f"max-abs-err {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
