"""Golden-path smoke test (reference scripts/demo.py): load a checkpoint,
infer on the demo assets, report ARel vs GT depth (expected ~7.45% for
UniDepthV2 ViT-L/14 with the released weights).

Usage:
  python scripts/demo.py --checkpoint /path/to/ckpt_dir_or_file \
      [--rgb assets/demo/rgb.png --depth assets/demo/depth.png \
       --intrinsics assets/demo/intrinsics.npy] [--version 2]

Assets follow the reference layout: depth PNG is uint16 millimeters.
Without --checkpoint it runs with random weights (pipeline check only).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--version", type=int, default=2)
    ap.add_argument("--config", default=None, help="config JSON (random-weight mode)")
    ap.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    ap.add_argument("--rgb", default="assets/demo/rgb.png")
    ap.add_argument("--depth", default="assets/demo/depth.png")
    ap.add_argument("--intrinsics", default="assets/demo/intrinsics.npy")
    ap.add_argument("--output", default="assets/demo/output.png")
    args = ap.parse_args()

    from PIL import Image

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from unidepth_tpu.models import UniDepthV1, UniDepthV2
    from unidepth_tpu.utils.visualization import colorize, image_grid

    cls = UniDepthV2 if args.version == 2 else UniDepthV1
    if args.checkpoint:
        model = cls.from_pretrained(args.checkpoint)
    else:
        import json

        print("!! no checkpoint: random weights, ARel will be meaningless !!")
        name = args.config or (
            "configs/config_v2_vitl14.json" if args.version == 2 else "configs/config_v1_vitl14.json"
        )
        model = cls.from_config(json.loads(Path(name).read_text()))
        if args.version == 2:
            model.init_params(seed=0, image_shape=(126, 126))
        else:
            model.init_params(seed=0)

    def _resolve(p):
        # fall back to the reference demo assets if not present locally
        cand = Path(p)
        if cand.exists():
            return cand
        alt = Path("/root/reference") / p
        return alt if alt.exists() else cand

    rgb_path = _resolve(args.rgb)
    args.depth = str(_resolve(args.depth))
    args.intrinsics = str(_resolve(args.intrinsics))
    if rgb_path.exists():
        rgb = np.asarray(Image.open(rgb_path).convert("RGB"))
    else:
        print(f"{rgb_path} missing; using a synthetic image")
        rgb = np.random.default_rng(0).integers(0, 255, (480, 640, 3), dtype=np.uint8)

    K = None
    if Path(args.intrinsics).exists():
        K = np.load(args.intrinsics)

    if args.version == 2:
        out = model.infer(rgb, camera=K)
    else:
        out = model.infer(rgb, intrinsics=K)
    depth_pred = np.asarray(out["depth"])[0, ..., 0]

    if Path(args.depth).exists():
        gt = np.asarray(Image.open(args.depth)).astype(float) / 1000.0
        if gt.shape != depth_pred.shape:
            # possible when the RGB asset was missing and a synthetic image
            # stood in — the GT no longer matches the prediction grid
            print(
                f"GT depth {gt.shape} does not match prediction "
                f"{depth_pred.shape}; skipping ARel"
            )
        else:
            valid = gt > 0
            arel = np.abs(gt[valid] - depth_pred[valid]) / gt[valid]
            print(f"ARel: {arel.mean() * 100:.2f}%")
    else:
        print("no GT depth; skipping ARel")

    panel = image_grid(
        [rgb, colorize(depth_pred), colorize(np.asarray(out["confidence"])[0, ..., 0]) if "confidence" in out else colorize(depth_pred)],
        1,
        3,
    )
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(panel).save(args.output)
    print(f"saved {args.output}; predicted K:\n{np.asarray(out['intrinsics'][0])}")


if __name__ == "__main__":
    main()
