"""Evaluation CLI (the reference's validate() entry point as a script).

Runs the full depth metric suite (+optional 3D chamfer/F1) over validation
datasets and prints a per-dataset table.

Usage:
  python scripts/eval.py --config-file configs/config_v2_vitl14.json \
      --checkpoint CKPT [--data-root $DATAROOT] [--datasets IBims KITTI]
      [--max-iters N] [--dummy-data]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--datasets", nargs="*", default=None)
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dummy-data", action="store_true")
    ap.add_argument(
        "--eval-3d",
        action="store_true",
        help="also compute Chamfer distance + F1-AUC on unprojected points",
    )
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from unidepth_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax)

    import jax.numpy as jnp

    from unidepth_tpu.datasets.base import make_dataset
    from unidepth_tpu.datasets.dummy import Dummy
    from unidepth_tpu.datasets.loader import collate
    from unidepth_tpu.datasets.samplers import ShardedEvalSampler
    from unidepth_tpu.models.unidepthv2.model import UniDepthV2
    from unidepth_tpu.utils.validation import validate

    config = json.loads(Path(args.config_file).read_text())
    # resolve the model family from config model.name like train.py does
    # (reference train.py:111 resolves the class by string)
    model_name = config.get("model", {}).get("name", "UniDepthV2")
    if model_name == "UniDepthV1":
        from unidepth_tpu.models.unidepthv1.model import UniDepthV1 as ModelCls
    elif model_name == "UniDepthV2old":
        from unidepth_tpu.models.unidepthv2.old import UniDepthV2old as ModelCls
    else:
        ModelCls = UniDepthV2
    if args.checkpoint:
        model = ModelCls.from_pretrained(args.checkpoint)
    else:
        model = ModelCls.from_config(config)
        if model_name == "UniDepthV1":
            model.init_params(seed=0)
        else:
            model.init_params(seed=0, image_shape=(126, 126))
        print("!! random weights (no --checkpoint): metrics are meaningless")

    names = args.datasets or config["data"].get("val_datasets", [])
    mult = config["data"].get("augmentations", {}).get("shape_constraints", {}).get("shape_mult", 14)
    raw = config["data"].get("image_shape", (480, 640))
    image_shape = tuple((s // mult) * mult for s in raw)

    loaders = {}
    for name in names or (["Dummy"] if args.dummy_data else []):
        if args.dummy_data or name == "Dummy":
            ds = Dummy(image_shape=image_shape, length=32)
            get = lambda ds, i: ds[i]
        else:
            ds = make_dataset(
                name, data_root=args.data_root, test_mode=True, image_shape=image_shape
            )
            get = lambda ds, i: ds[i]

        def loader(ds=ds, get=get):
            sampler = ShardedEvalSampler(len(ds), 1, 0)
            batch = []
            for i in sampler:
                batch.append(get(ds, i))
                if len(batch) == args.batch:
                    yield collate(batch)
                    batch = []
            if batch:
                yield collate(batch)

        loaders[name] = loader()

    from unidepth_tpu.datasets.specs import SPECS

    ranges = {
        n: (SPECS[n].min_depth, SPECS[n].max_depth) for n in loaders if n in SPECS
    }
    results = validate(
        model,
        model.params,
        loaders,
        max_iters=args.max_iters,
        with_3d=args.eval_3d,
        depth_ranges=ranges,
    )
    for name, metrics in results.items():
        print(f"\n== {name} ==")
        for k in sorted(metrics):
            print(f"  {k:>12s}: {metrics[k]:.4f}")


if __name__ == "__main__":
    main()
