"""Per-part serving profiler (encoder / decoder / full pipeline).

Methodology (see docs/PERF.md):
  * N iterations chained through the timing carry inside ONE jitted
    fori_loop — each iteration's input depends on the previous scalar, so
    XLA can neither hoist the body (loop-invariant code motion) nor
    overlap iterations; robust on remote/tunneled devices where
    block_until_ready is unreliable.
  * every output leaf feeds the carry — nothing is dead-code-eliminated
    (consuming a single output lets XLA silently drop whole heads; the
    bench's depth-only number is ~10% faster than all-outputs for exactly
    that reason).
  * params are passed as jit arguments, not closure constants (closure
    constants exceed the remote-compile request limit).

Usage:
  python scripts/profile.py [--config configs/config_v2_vitl14.json]
      [--batch 8] [--size 518] [--iters 10] [--platform cpu]
"""

import argparse
import json
import sys
import time
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/config_v2_vitl14.json")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from unidepth_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax)
    import jax.numpy as jnp
    import numpy as np

    from unidepth_tpu.models.unidepthv2.model import UniDepthV2

    warnings.filterwarnings("ignore")
    cfg = json.loads(Path(args.config).read_text())
    is_v1 = cfg.get("model", {}).get("name") == "UniDepthV1"
    if is_v1:
        from unidepth_tpu.models.unidepthv1.model import UniDepthV1

        model = UniDepthV1.from_config(cfg)
        model.init_params(seed=0)
        params = (
            model._serving_params() if hasattr(model, "_serving_params") else model.params
        )
        B, N = args.batch, max(1, args.iters)
        # V1 runs at its fixed network shape (reference unidepthv1.py:309)
        H, W = model.image_shape
    else:
        model = UniDepthV2.from_config(cfg)
        model.init_params(seed=0, image_shape=(126, 126))
        params = model._serving_params()
        B, H, W, N = args.batch, args.size, args.size, max(1, args.iters)
    rgb = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, 3)), jnp.float32
    )

    def timed(name, fn, p, *xs):
        @jax.jit
        def loop(p, *a):
            def body(_, acc):
                a2 = list(a)
                a2[0] = jax.tree.map(
                    lambda t: t + (acc * 1e-12).astype(t.dtype), a2[0]
                )
                out = fn(p, *a2)
                s = sum(
                    jnp.sum(l[..., :1].astype(jnp.float32))
                    for l in jax.tree.leaves(out)
                )
                return acc + s * 1e-12

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        float(loop(p, *xs))  # compile + warm
        t0 = time.time()
        float(loop(p, *xs))
        dt = (time.time() - t0) / N
        print(f"{name:>24s}: {dt * 1e3:8.2f} ms/iter  {B / dt:8.1f} img/s")
        return dt

    img = rgb.astype(model.dtype)
    enc = timed(
        "encoder",
        lambda p, x: model.encoder.apply({"params": p}, x),
        params["encoder"],
        img,
    )
    feats, cls_tokens = jax.jit(
        lambda p, x: model.encoder.apply({"params": p}, x)
    )(params["encoder"], img)
    dec = timed(
        "decoder",
        lambda p, f, c: model.decoder.apply({"params": p}, f, c, (H, W)),
        params["decoder"],
        feats,
        cls_tokens,
    )
    full = timed(
        "full encode_decode",
        lambda p, x: model.encode_decode(p, x),
        params,
        rgb,
    )
    print(
        f"\nencoder {enc*1e3:.1f} + decoder {dec*1e3:.1f} = "
        f"{(enc + dec)*1e3:.1f} ms vs full {full*1e3:.1f} ms "
        f"(composition overhead {max(0.0, full - enc - dec)*1e3:.1f} ms)"
    )


if __name__ == "__main__":
    main()
