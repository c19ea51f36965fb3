"""ConvNeXt-L serving-path anatomy (VERDICT r4 task 6).

Decomposes the `config_v1_cnvnxtl` encoder (53.5 ms of the 81.6 ms B=8
batch at the fixed 462x616 network shape, scripts/profile.py) into
stem / per-stage / per-op-class components, and A/Bs candidate
formulations for the two non-GEMM op classes (the 7x7 depthwise conv and
the fp32 LayerNorm feeding each pointwise MLP), using the chained
fori_loop methodology from docs/PERF.md.

Usage:
  python scripts/convnext_anatomy.py [--batch 8] [--iters 20] [--what all]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--what", default="all", choices=["all", "stages", "block", "dwconv", "fused"]
    )
    args = ap.parse_args()

    import jax

    from unidepth_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax)
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from unidepth_tpu.models.backbones.convnext import (
        CONVNEXT_PRESETS,
        ConvNeXt,
        ConvNeXtBlock,
    )

    dtype = jnp.bfloat16
    cfg = CONVNEXT_PRESETS["convnext_large"]
    B, H, W = args.batch, 462, 616
    N = args.iters
    rng = np.random.default_rng(0)

    def timed(name, fn, *xs, flops=None):
        """Chained fori_loop: each iteration's first input depends on the
        previous scalar; every output leaf feeds the carry (no DCE)."""

        @jax.jit
        def loop(*a):
            def body(_, acc):
                a2 = list(a)
                a2[0] = jax.tree.map(
                    lambda t: t + (acc * 1e-12).astype(t.dtype), a2[0]
                )
                out = fn(*a2)
                s = sum(
                    jnp.sum(l[..., :1].astype(jnp.float32))
                    for l in jax.tree.leaves(out)
                )
                return acc + s * 1e-12

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        float(loop(*xs))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(loop(*xs))
            best = min(best, (time.time() - t0) / N)
        rate = f"  {flops / best / 1e12:7.1f} TFLOP/s" if flops else ""
        print(f"{name:>44s}: {best * 1e3:8.3f} ms{rate}")
        return best

    def randn(*shape, d=dtype):
        return jnp.asarray(rng.standard_normal(shape), d)

    # ---- whole encoder + stem + per-stage scans --------------------------
    if args.what in ("all", "stages"):
        enc = ConvNeXt(cfg=cfg, stacking="max_cls", dtype=dtype)
        img = randn(B, H, W, 3, d=jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), img)["params"]
        timed("full encoder (max_cls)", lambda p, x: enc.apply({"params": p}, x), params, img)
        enc_last = ConvNeXt(cfg=cfg, stacking="last", dtype=dtype)
        timed(
            "full encoder (stacking=last)",
            lambda p, x: enc_last.apply({"params": p}, x),
            params,
            img,
        )

        # stem
        def stem(p, x):
            y = nn.Conv(
                cfg.dims[0], kernel_size=(4, 4), strides=(4, 4), padding="VALID",
                dtype=dtype, name="stem_conv",
            ).apply({"params": p["stem_conv"]}, x.astype(dtype))
            return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_norm").apply(
                {"params": p["stem_norm"]}, y
            ).astype(dtype)

        timed("stem (4x4 s4 conv + LN)", stem, params, img)

        # per-stage scans at the stage's true input shape
        shapes = [(115, 154), (57, 77), (28, 38), (14, 19)]
        for si, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
            h, w = shapes[si]
            Scanned = nn.scan(
                nn.remat(ConvNeXtBlock),
                variable_axes={"params": 0},
                split_rngs={"params": True, "droppath": True},
                length=depth,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            mod = Scanned(dim=dim, use_grn=cfg.use_grn, dtype=dtype)
            x = randn(B, h, w, dim)
            sp = params[f"stage_{si}"]
            gemm_flops = 16 * dim * dim * h * w * B * depth
            dw_flops = 2 * 49 * dim * h * w * B * depth
            timed(
                f"stage_{si}: {depth} blocks @ C={dim} {h}x{w}",
                lambda p, x, mod=mod: mod.apply({"params": p}, x, None),
                sp,
                x,
                flops=gemm_flops + dw_flops,
            )

    # ---- one stage-2 block, op by op ------------------------------------
    h2, w2, C = 28, 38, 768
    M = B * h2 * w2
    if args.what in ("all", "block"):
        x = randn(B, h2, w2, C)
        wdw = randn(7, 7, 1, C)
        bdw = randn(C)
        g, bta = randn(C, d=jnp.float32), randn(C, d=jnp.float32)
        w1, b1 = randn(C, 4 * C), randn(4 * C)
        w2k, b2 = randn(4 * C, C), randn(C)
        gam = randn(C)

        def dwconv(x, w, b):
            return (
                jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(3, 3), (3, 3)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=C,
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
                + b
            )

        def ln(x, g, b):
            x32 = x.astype(jnp.float32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            xc = x32 - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            return xc * jax.lax.rsqrt(var + 1e-6) * g + b

        def pw1(x, w, b):
            return jax.nn.gelu(
                (jnp.dot(x.astype(dtype), w, preferred_element_type=jnp.float32) + b),
                approximate=False,
            ).astype(dtype)

        def pw2(y, w, b, gam, inp):
            z = jnp.dot(y, w, preferred_element_type=jnp.float32) + b
            return inp + (z * gam).astype(dtype)

        def full_block(x, wdw, bdw, g, bta, w1, b1, w2k, b2, gam):
            y = dwconv(x, wdw, bdw)
            y = ln(y, g, bta)
            y = pw1(y, w1, b1)
            return pw2(y, w2k, b2, gam, x)

        nblk = 27
        timed(
            f"stage-2 full block x{nblk} (XLA, production math)",
            lambda *a: full_block(*a),
            x, wdw, bdw, g, bta, w1, b1, w2k, b2, gam,
            flops=(16 * C * C + 98 * C) * M,
        )
        timed("  dwconv 7x7 (XLA fgc NHWC)", dwconv, x, wdw, bdw, flops=98 * C * M)
        timed("  LN fp32 (round trip)", ln, x, g, bta)
        timed("  pw1 GEMM + exact GELU", pw1, x, w1, b1, flops=8 * C * C * M)
        y4 = randn(B, h2, w2, 4 * C)
        timed(
            "  pw2 GEMM + gamma + residual",
            lambda y, w, b, gm, i: pw2(y, w, b, gm, i),
            y4, w2k, b2, gam, x,
            flops=8 * C * C * M,
        )
        timed(
            "  GEMM-only floor (pw1+pw2, no LN/dw/act)",
            lambda x, w1, w2k: jnp.dot(
                jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(dtype),
                w2k,
                preferred_element_type=jnp.float32,
            ).astype(dtype),
            x, w1, w2k,
            flops=16 * C * C * M,
        )

    # ---- dwconv formulations ---------------------------------------------
    if args.what in ("all", "dwconv"):
        x = randn(B, h2, w2, C)
        wdw = randn(7, 7, 1, C)
        bdw = randn(C)

        def dw_xla(x, w, b):
            return (
                jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(3, 3), (3, 3)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=C,
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
                + b
            )

        def dw_shift(x, w, b):
            """49 shifted elementwise multiply-adds (pure VPU)."""
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
            acc = jnp.zeros(x.shape, jnp.float32)
            for dy in range(7):
                for dx in range(7):
                    acc = acc + (
                        xp[:, dy : dy + h2, dx : dx + w2, :].astype(jnp.float32)
                        * w[dy, dx, 0].astype(jnp.float32)
                    )
            return (acc + b).astype(dtype)

        def dw_nchw(x, w, b):
            xt = x.transpose(0, 3, 1, 2)
            wt = w.transpose(3, 2, 0, 1)  # OIHW
            y = jax.lax.conv_general_dilated(
                xt, wt, (1, 1), [(3, 3), (3, 3)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=C,
                preferred_element_type=jnp.float32,
            )
            return y.transpose(0, 2, 3, 1).astype(dtype) + b

        a = timed("dwconv A: XLA fgc NHWC (production)", dw_xla, x, wdw, bdw)
        timed("dwconv B: 49 shifted VPU MACs", dw_shift, x, wdw, bdw)
        timed("dwconv C: XLA fgc NCHW (+transposes)", dw_nchw, x, wdw, bdw)
        ref = np.asarray(dw_xla(x, wdw, bdw), np.float32)
        for name, f in [("B", dw_shift), ("C", dw_nchw)]:
            err = np.abs(np.asarray(f(x, wdw, bdw), np.float32) - ref).max()
            print(f"    {name} max abs err vs A: {err:.2e}")
        print(f"    (stage-2 totals: x27 blocks -> A = {27 * a * 1e3:.2f} ms)")

    # ---- fused LN+pw1(+GELU) via ops.fused_block.ln_dense ----------------
    if args.what in ("all", "fused"):
        from unidepth_tpu.ops.fused_block import ln_dense

        x = randn(B, h2, w2, C)
        g, bta = randn(C, d=jnp.float32), randn(C, d=jnp.float32)
        w1, b1 = randn(C, 4 * C), randn(4 * C)

        def xla_ln_pw1(x, g, b, w, bb):
            x32 = x.astype(jnp.float32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            xc = x32 - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            y = (xc * jax.lax.rsqrt(var + 1e-6) * g + b).astype(dtype)
            return jax.nn.gelu(
                jnp.dot(y, w, preferred_element_type=jnp.float32) + bb,
                approximate=False,
            ).astype(dtype)

        timed("LN->pw1->GELU, XLA", xla_ln_pw1, x, g, bta, w1, b1, flops=8 * C * C * M)
        timed(
            "LN->pw1->GELU, Pallas ln_dense",
            lambda x, g, b, w, bb: ln_dense(x, w, bb, g, b, 1e-6, "gelu"),
            x, g, bta, w1, b1,
            flops=8 * C * C * M,
        )
        ref = np.asarray(xla_ln_pw1(x, g, bta, w1, b1), np.float32)
        got = np.asarray(ln_dense(x, w1, b1, g, bta, 1e-6, "gelu"), np.float32)
        print(f"    ln_dense max abs err vs XLA: {np.abs(got - ref).max():.2e}")


if __name__ == "__main__":
    main()
