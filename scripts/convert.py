"""Checkpoint conversion drill: torch -> native orbax, optionally verified.

One documented command between "weights downloaded" and "ARel gate
executed" (reference gate: scripts/demo.py prints `ARel: 7.45%` with the
released UniDepthV2-ViT-L/14 weights, /root/reference/README.md:101):

  python scripts/convert.py \
      --input /path/to/hf_dir_or_pytorch_model.bin \
      --config configs/config_v2_vitl14.json \
      --output checkpoints/v2_vitl14_native \
      --verify

* --input: a HF snapshot dir (config.json + pytorch_model.bin /
  model.safetensors), a bare checkpoint file, or a HF repo id (needs a
  populated hub cache; this env has zero egress).
* --output: written as  output/config.json + output/params (orbax pytree);
  loadable by `UniDepthV2.from_pretrained(output)` / `scripts/demo.py
  --checkpoint output` with no torch dependency.
* --verify: runs the bundled-asset demo pipeline (assets/demo/*) on the
  converted weights and prints ARel; with the real released V2-ViT-L
  weights and the reference photo assets this is the 7.45% gate.

Key-layout tolerance is inherited from io/convert.py: `module.` prefixes,
chunked or flat DINOv2 block naming, FB/CLIP/timm ConvNeXt layouts
(reference unidepthv2.py:381-394, backbones/dinov2.py:316-347,
convnext.py:512-566). Tested end-to-end against synthetic full-scale
state_dicts for all shipped configs in tests/test_convert_cli.py.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="torch checkpoint (dir/file/repo id)")
    ap.add_argument("--output", required=True, help="output dir for the native checkpoint")
    ap.add_argument("--version", type=int, default=None,
                    help="model generation 1|2 (default: from config model.name)")
    ap.add_argument("--config", default=None,
                    help="config JSON override (else input dir config.json / inferred)")
    ap.add_argument("--verify", action="store_true",
                    help="after converting, run the demo-asset ARel check")
    ap.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from unidepth_tpu.io.checkpoint import save_params
    from unidepth_tpu.io.hub import load_checkpoint

    config_override = None
    if args.config:
        config_override = json.loads(Path(args.config).read_text())
    in_path = Path(args.input)
    version = args.version
    if version is None:
        # generation from (in order): --config override, the input
        # checkpoint dir's own config.json, else V2
        cfg_for_name = config_override
        if cfg_for_name is None and in_path.is_dir() and (in_path / "config.json").exists():
            cfg_for_name = json.loads((in_path / "config.json").read_text())
        name = (cfg_for_name or {}).get("model", {}).get("name", "UniDepthV2")
        version = 1 if name == "UniDepthV1" else 2

    if config_override is not None and in_path.is_dir() and not (in_path / "config.json").exists():
        # bare weight dir + explicit config: point at the weight file directly
        for cand in ("model.safetensors", "pytorch_model.bin", "model.bin"):
            if (in_path / cand).exists():
                in_path = in_path / cand
                break

    config, params = load_checkpoint(
        str(in_path), version=version, config=config_override
    )

    out = Path(args.output).absolute()
    out.mkdir(parents=True, exist_ok=True)
    (out / "config.json").write_text(json.dumps(config, indent=2))
    save_params(out / "params", params)
    n_params = sum(int(np.prod(np.shape(x))) for x in
                   __import__("jax").tree.leaves(params))
    print(f"converted {n_params/1e6:.1f}M params -> {out}")

    if args.verify:
        rc = verify(out)
        if rc:
            sys.exit(rc)


def verify(ckpt_dir: Path) -> int:
    """Round-trip load the converted checkpoint and run the demo-asset ARel
    check (reference scripts/demo.py:28-41)."""
    from PIL import Image

    from unidepth_tpu.models import UniDepthV1, UniDepthV2, UniDepthV2old

    config = json.loads((Path(ckpt_dir) / "config.json").read_text())
    name = config.get("model", {}).get("name", "UniDepthV2")
    cls = {"UniDepthV1": UniDepthV1, "UniDepthV2old": UniDepthV2old}.get(
        name, UniDepthV2
    )
    model = cls.from_pretrained(str(ckpt_dir))

    root = Path(__file__).resolve().parents[1]
    rgb_p = root / "assets/demo/rgb.png"
    depth_p = root / "assets/demo/depth.png"
    K_p = root / "assets/demo/intrinsics.npy"
    for p in (rgb_p, depth_p, K_p):
        if not p.exists():
            print(f"verify: missing {p}; run scripts/make_demo_assets.py")
            return 2
    rgb = np.asarray(Image.open(rgb_p).convert("RGB"))
    gt = np.asarray(Image.open(depth_p)).astype(np.float32) / 1000.0
    K = np.load(K_p)

    # --- attention-logit audit --------------------------------------
    # The serving-default max-free softmax kernel clamps prescaled logits
    # at 80 and saturates instead of NaN-ing (ops/flash_attention.
    # _packed_kernel_tr). Serving only trusts it for checkpoints whose
    # audited bound clears LOGIT_AUDIT_MARGIN, so conversion measures
    # max |prescaled logit| over every attention call on the demo input
    # and stores it in the checkpoint config. A bound at/above the margin
    # is a conversion FAILURE signal (rc=3): the checkpoint still loads
    # and serves, but only through the row-max kernels.
    bound = model.audit_attention_logits(model._audit_preprocess(rgb))
    config["model"]["attention_logit_bound"] = round(bound, 3)
    (Path(ckpt_dir) / "config.json").write_text(json.dumps(config, indent=2))
    margin = type(model).LOGIT_AUDIT_MARGIN
    kernel = "max-free (fast)" if bound < margin else "row-max (safe)"
    print(f"attention logit bound: {bound:.2f} (margin {margin:g}) -> {kernel}")

    out = model.infer(rgb, camera=K)
    pred = np.asarray(out["depth"])[0, ..., 0]
    mask = gt > 0
    arel = float(np.mean(np.abs(pred[mask] - gt[mask]) / gt[mask]))
    print(f"ARel: {100 * arel:.2f}%")
    # the 7.45% headline is for the released V2-ViT-L weights on the
    # reference photo asset; on the bundled synthetic scene any properly
    # converted real checkpoint should still land well under 100%
    return 3 if bound >= margin else 0


if __name__ == "__main__":
    main()
