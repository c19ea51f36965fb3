"""Batch / multi-camera inference CLI.

Streams images (or NuScenes-style 6-view frames grouped by subfolder)
through one compiled program per shape bucket; saves depth (16-bit PNG,
millimeters), optional colorized panels and PLY point clouds.

Usage:
  python scripts/infer.py --input imgs/ --output out/ \
      [--checkpoint ckpt] [--intrinsics K.npy] [--resolution-level 9]
      [--batch 8] [--save-ply]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--version", type=int, default=2)
    ap.add_argument("--intrinsics", default=None)
    ap.add_argument("--resolution-level", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--save-ply", action="store_true")
    ap.add_argument("--save-panel", action="store_true")
    args = ap.parse_args()

    from PIL import Image

    from unidepth_tpu.models import UniDepthV1, UniDepthV2
    from unidepth_tpu.utils.visualization import colorize, image_grid, save_point_cloud

    cls = UniDepthV2 if args.version == 2 else UniDepthV1
    if args.checkpoint:
        model = cls.from_pretrained(args.checkpoint)
    else:
        import json

        model = cls.from_config(
            json.loads(Path("configs/config_v2_vitl14.json").read_text())
        )
        model.init_params(seed=0, image_shape=(126, 126))
        print("!! random weights (no --checkpoint)")
    if args.resolution_level is not None:
        if args.version == 1:
            # V1 runs at its fixed network shape (reference unidepthv1.py:309)
            print("WARNING: --resolution-level has no effect on UniDepthV1")
        model.resolution_level = args.resolution_level

    K = np.load(args.intrinsics) if args.intrinsics else None
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    paths = sorted(
        p for p in Path(args.input).rglob("*") if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    # group equal-size images into batches (one compiled program per bucket)
    by_size: dict[tuple, list] = {}
    for p in paths:
        with Image.open(p) as im:
            by_size.setdefault(im.size, []).append(p)

    n_done = 0
    t0 = time.time()
    for size, group in by_size.items():
        for i in range(0, len(group), args.batch):
            chunk = group[i : i + args.batch]
            imgs = np.stack([np.asarray(Image.open(p).convert("RGB")) for p in chunk])
            kw = {"camera": K} if args.version == 2 else {"intrinsics": K}
            out = model.infer(imgs, **kw)
            depth = np.asarray(out["depth"])[..., 0]
            for j, p in enumerate(chunk):
                # name outputs by the path relative to the input root so
                # same-named files in different subfolders (the NuScenes
                # 6-view layout) don't overwrite each other
                rel = p.relative_to(args.input).with_suffix("")
                stem = "_".join(rel.parts)
                d16 = np.clip(depth[j] * 1000.0, 0, 65535).astype(np.uint16)
                Image.fromarray(d16).save(out_dir / f"{stem}_depth.png")
                if args.save_panel:
                    panel = image_grid([imgs[j], colorize(depth[j])], 1, 2)
                    Image.fromarray(panel).save(out_dir / f"{stem}_panel.png")
                if args.save_ply:
                    pts = np.asarray(out["points"])[j].reshape(-1, 3)
                    cols = imgs[j].reshape(-1, 3)
                    save_point_cloud(str(out_dir / f"{stem}.ply"), pts, cols)
            n_done += len(chunk)
            rate = n_done / (time.time() - t0)
            print(f"{n_done}/{len(paths)} images ({rate:.2f} img/s)")


if __name__ == "__main__":
    main()
