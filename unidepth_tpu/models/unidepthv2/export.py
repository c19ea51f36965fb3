"""Serialized model export (the reference's ONNX exporter analogue,
unidepth/models/unidepthv2/export.py).

The reference exports a pre/post-processing-free forward to ONNX opset 14;
the TPU-native equivalent serializes the same stripped forward with
``jax.export`` (StableHLO) — loadable from any JAX process or compiled
ahead-of-time, with an optional GT-rays input mirroring
``UniDepthV2ONNXcam``.

Usage:
  python -m unidepth_tpu.models.unidepthv2.export --config-file \
      configs/config_v2_vitl14.json --shape 462 616 --output model.stablehlo
"""

from __future__ import annotations

import argparse
import json
import threading
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_EXPORT_LOCK = threading.Lock()


def export_forward(model, params, shape: tuple[int, int], with_camera: bool = False, batch: int = 1):
    """Returns a serialized StableHLO bytes blob of the stripped forward:
    (image [, rays]) -> (points, confidence, intrinsics).

    The export traces with the pure-XLA attention formulation (no Pallas
    custom calls), so the artifact contains only standard StableHLO ops
    and loads in any XLA/PJRT runtime — the portability analogue of the
    reference selecting plain Attention over MemEffAttention when
    export=True (reference backbones/dinov2.py:396). Numerics match the
    kernel path to float tolerance (tests/test_flash_attention.py)."""
    import os

    from jax import export as jax_export

    h, w = shape

    def fwd(params, image, rays=None):
        out = model.encode_decode(params, image, rays_gt=rays)
        return out["points"], out["confidence"], out["intrinsics"]

    img_spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    # The xla-attention forcing below mutates process state (env var +
    # model.encoder) for the duration of the trace; serialize exports and
    # keep serving traces out of this window (a concurrent trace would be
    # captured with the swapped encoder / env).
    with _EXPORT_LOCK:
        prev_encoder = model.encoder
        prev_env = os.environ.get("UNIDEPTH_ATTN_IMPL")
        model.encoder = prev_encoder.clone(attn_impl="xla")
        os.environ["UNIDEPTH_ATTN_IMPL"] = "xla"  # decoder attention dispatcher
        try:
            if with_camera:
                rays_spec = jax.ShapeDtypeStruct((batch, h * w, 3), jnp.float32)
                exported = jax_export.export(jax.jit(fwd))(params, img_spec, rays_spec)
            else:
                exported = jax_export.export(
                    jax.jit(lambda p, x: fwd(p, x))
                )(params, img_spec)
        finally:
            model.encoder = prev_encoder
            if prev_env is None:
                os.environ.pop("UNIDEPTH_ATTN_IMPL", None)
            else:
                os.environ["UNIDEPTH_ATTN_IMPL"] = prev_env
    return exported.serialize()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--shape", type=int, nargs=2, default=(462, 616))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--with-camera", action="store_true")
    ap.add_argument("--output", default="unidepthv2.stablehlo")
    args = ap.parse_args()

    from unidepth_tpu.models.unidepthv2.model import UniDepthV2

    config = json.loads(Path(args.config_file).read_text())
    if args.checkpoint:
        model = UniDepthV2.from_pretrained(args.checkpoint)
    else:
        model = UniDepthV2.from_config(config)
        model.init_params(seed=0, image_shape=(126, 126))
    h, w = args.shape
    h, w = (h // 14) * 14, (w // 14) * 14
    blob = export_forward(model, model.params, (h, w), args.with_camera, args.batch)
    Path(args.output).write_bytes(blob)
    print(f"exported ({len(blob) / 1e6:.1f} MB) -> {args.output}")


if __name__ == "__main__":
    main()
