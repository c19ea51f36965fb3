"""Serving benchmark suite — every BASELINE.json config, one chip.

`bench.py` owns the headline number (ViT-L/14 518px full-infer throughput,
self-calibrated baseline); this suite times the OTHER serving
configurations BASELINE.json enumerates so the whole published surface has
a measured number:

  1. UniDepthV2 ViT-S/14 single-image infer        (latency-bound)
  2. UniDepthV2 ViT-B/14 batched infer, B=8 @ 518px
  3. UniDepthV1 ConvNeXt-L, B=8 (conv encoder + V1 decoder path)
  4. UniDepthV2 ViT-L/14 all outputs (depth + intrinsics + 3D points +
     confidence) at full resolution
  5. Multi-camera surround: 6 views/frame (NuScenes-style), streamed as
     one B=6 batch per frame — reported in frames/sec
  6. UniDepthV2 ViT-L/14 int8 serving mode (opt-in; headline stays bf16)

Methodology is bench.py's: N iterations of the REAL jitted serving
program chained inside one jitted fori_loop (each iteration's input
depends on the previous output, so XLA can neither elide nor overlap
them), timed end-to-end with a scalar value-fetch barrier — host-side
per-dispatch timing is unreliable through the tunneled device.

Prints one JSON line per config and a final summary line; pass
``--update-doc`` to rewrite the results table in docs/BENCH_SUITE.md.

Usage:
  python scripts/bench_suite.py [--iters 20] [--only vits_single,...]
      [--update-doc]
"""

import argparse
import json
import sys
import time
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_ROOT = Path(__file__).resolve().parents[1]


def _load_v2(config_name: str):
    import json as _json

    from unidepth_tpu.models.unidepthv2.model import UniDepthV2

    cfg = _json.loads((_ROOT / "configs" / config_name).read_text())
    model = UniDepthV2.from_config(cfg)
    model.init_params(seed=0, image_shape=(126, 126))
    return model


def _time_chained(jax, jnp, run, params, rgb, camera, iters, *, pick):
    """Time ``iters`` chained executions of ``run`` inside one jitted
    fori_loop; ``pick`` selects the output leaf that feeds the carry (and
    keeps every consumed head alive against DCE)."""

    @jax.jit
    def loop(params, x):
        def body(_, carry):
            x_i, acc = carry
            out = run(params, x_i, camera)
            s = pick(out, jnp)
            return (x_i + s * 1e-12, acc + s)

        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))

    _, acc = loop(params, rgb)
    float(acc)  # compile + warmup; value fetch is the completion barrier
    t0 = time.perf_counter()
    _, acc = loop(params, rgb)
    float(acc)
    return (time.perf_counter() - t0) / iters


def _pick_depth(out, jnp):
    return jnp.mean(out["depth"]).astype(jnp.float32)


def _pick_all(out, jnp):
    # consume one element of every output so no head is dead-code-eliminated
    return sum(
        jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32))
        for leaf in out.values()
    )


def bench_v2(model, B, size, outputs, iters, jax, jnp, np):
    key = model.serving_shape_key((size, size), outputs=outputs)
    run = model._build_run(key)
    params = model._serving_params()
    rgb = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, size, size, 3)), jnp.float32
    )
    pick = _pick_depth if outputs == ("depth",) else _pick_all
    dt = _time_chained(jax, jnp, run, params, rgb, None, iters, pick=pick)
    return dt, B / dt


def bench_v1(config_name, B, hw, iters, jax, jnp, np):
    import json as _json

    from unidepth_tpu.models.unidepthv1.model import (
        UniDepthV1,
        _v1_paddings,
        _v1_shapes,
    )

    cfg = _json.loads((_ROOT / "configs" / config_name).read_text())
    model = UniDepthV1.from_config(cfg)
    model.init_params(seed=0)
    H, W = hw
    scaled, ratio = _v1_shapes((H, W), model.image_shape)
    pads = _v1_paddings(scaled, model.image_shape)
    key = (H, W, scaled, pads, ratio, False, False, True)
    fn = model._infer_fn(key)  # jitted; traced inline under the outer jit
    params = (
        model._serving_params() if hasattr(model, "_serving_params") else model.params
    )
    rgb = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, 3)) * 0.2 + 0.5,
        jnp.float32,
    )
    dt = _time_chained(
        jax, jnp, lambda p, x, _c: fn(p, x, None), params, rgb, None, iters,
        pick=_pick_depth,
    )
    return dt, B / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default=None, help="comma-separated config keys")
    ap.add_argument("--update-doc", action="store_true")
    args = ap.parse_args()

    import jax

    from unidepth_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax)
    import jax.numpy as jnp
    import numpy as np

    warnings.filterwarnings("ignore")
    results = {}

    def record(name, unit, dt, rate, note):
        results[name] = {
            "metric": name,
            "ms_per_batch": round(dt * 1e3, 2),
            "value": round(rate, 2),
            "unit": unit,
            "note": note,
        }
        print(json.dumps(results[name]))

    known = {
        "vits_single",
        "vitb_batch8",
        "v1_convnext",
        "vitl_all_outputs",
        "multicam",
        "vitl_int8",
    }
    only = set(args.only.split(",")) if args.only else None
    if only is not None and only - known:
        raise SystemExit(
            f"unknown --only keys {sorted(only - known)}; known: {sorted(known)}"
        )

    def want(k):
        return only is None or k in only

    if want("vits_single"):
        model = _load_v2("config_v2_vits14.json")
        dt, rate = bench_v2(model, 1, 518, ("depth",), args.iters, jax, jnp, np)
        record(
            "v2_vits14_518px_single_image",
            "images/sec/chip",
            dt,
            rate,
            "B=1 latency config (BASELINE.json configs[0])",
        )
        del model

    if want("vitb_batch8"):
        model = _load_v2("config_v2_vitb14.json")
        dt, rate = bench_v2(model, 8, 518, ("depth",), args.iters, jax, jnp, np)
        record(
            "v2_vitb14_518px_batch8",
            "images/sec/chip",
            dt,
            rate,
            "B=8 batched infer (BASELINE.json configs[1])",
        )
        del model

    if want("v1_convnext"):
        dt, rate = bench_v1(
            "config_v1_cnvnxtl.json", 8, (462, 616), args.iters, jax, jnp, np
        )
        record(
            "v1_convnext_large_batch8",
            "images/sec/chip",
            dt,
            rate,
            "conv encoder + V1 decoder, fixed 462x616 network shape "
            "(BASELINE.json configs[2])",
        )

    if want("vitl_all_outputs"):
        model = _load_v2("config_v2_vitl14.json")
        dt, rate = bench_v2(model, 8, 518, None, args.iters, jax, jnp, np)
        record(
            "v2_vitl14_518px_all_outputs",
            "images/sec/chip",
            dt,
            rate,
            "depth + intrinsics + 3D points + confidence "
            "(BASELINE.json configs[3])",
        )
        del model

    if want("multicam"):
        model = _load_v2("config_v2_vitl14.json")
        # one NuScenes-style surround frame = 6 views, streamed as a B=6
        # batch through the same compiled bucket every frame
        dt, rate = bench_v2(model, 6, 518, ("depth",), args.iters, jax, jnp, np)
        record(
            "v2_vitl14_surround_6view",
            "frames/sec/chip",
            dt,
            1.0 / dt,
            "6 views per frame in one batch (BASELINE.json configs[4]); "
            f"{rate:.1f} views/sec",
        )
        del model

    if want("vitl_int8"):
        # opt-in int8 serving mode (ops/quant.py): per-channel int8 weights
        # + per-token dynamic int8 activations on the MXU's double-rate
        # path. Same bucket as the bench.py headline, different numerics —
        # reported here, never as the headline (docs/SERVING.md "Int8").
        model = _load_v2("config_v2_vitl14.json")
        model.set_serving_precision("int8")
        dt, rate = bench_v2(model, 8, 518, ("depth",), args.iters, jax, jnp, np)
        record(
            "v2_vitl14_518px_int8",
            "images/sec/chip",
            dt,
            rate,
            "opt-in int8 encoder GEMMs (set_serving_precision); "
            "headline config runs bf16",
        )
        del model

    print(json.dumps({"suite": "bench_suite", "results": list(results.values())}))

    if args.update_doc:
        # Merge into the sidecar JSON (source of truth) so a --only rerun
        # refreshes its rows without discarding prior full-run rows, then
        # regenerate the markdown table from the merged state.
        sidecar = _ROOT / "docs" / "bench_suite_results.json"
        merged = json.loads(sidecar.read_text()) if sidecar.exists() else {}
        merged.update(results)
        sidecar.write_text(json.dumps(merged, indent=1) + "\n")
        doc = _ROOT / "docs" / "BENCH_SUITE.md"
        lines = [
            "# Serving benchmark suite (BASELINE.json configs)",
            "",
            "Measured by `scripts/bench_suite.py` (chained-fori_loop",
            "methodology, random weights — throughput is weight-agnostic) on",
            "one TPU v5e chip. The headline ViT-L/14 depth-only number lives",
            "in `bench.py` / BENCH_r*.json.",
            "",
            "| config | ms/batch | value | unit | note |",
            "|---|---|---|---|---|",
        ]
        for r in merged.values():
            lines.append(
                f"| {r['metric']} | {r['ms_per_batch']} | {r['value']} | "
                f"{r['unit']} | {r['note']} |"
            )
        doc.write_text("\n".join(lines) + "\n")
        print(f"wrote {doc}")


if __name__ == "__main__":
    main()
