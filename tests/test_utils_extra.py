"""Coverage for the utility tail: visualization, logging, misc helpers,
and the sharded eval sampler."""

import json

import numpy as np

import jax.numpy as jnp

from unidepth_tpu.datasets.samplers import ShardedEvalSampler
from unidepth_tpu.utils.logging import MetricLogger
from unidepth_tpu.utils.misc import (
    match_gt,
    match_intrinsics,
    profile_method,
    remove_padding,
)
from unidepth_tpu.utils.visualization import colorize, image_grid, save_point_cloud


def test_colorize_and_grid(rng):
    d = rng.uniform(1.0, 10.0, (12, 16)).astype(np.float32)
    img = colorize(d)
    assert img.shape == (12, 16, 3) and img.dtype == np.uint8
    # invalid (<= vmin) pixels render black
    d2 = d.copy()
    d2[0, 0] = 0.0
    img2 = colorize(d2, vmin=0.5)
    assert tuple(img2[0, 0]) == (0, 0, 0)
    grid = image_grid([img, img2, img, img2], rows=2, cols=2)
    assert grid.shape == (24, 32, 3)


def test_save_point_cloud_ply(tmp_path, rng):
    pts = rng.standard_normal((20, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (20, 3), dtype=np.uint8)
    p = tmp_path / "cloud.ply"
    save_point_cloud(str(p), pts, cols)
    text = p.read_bytes()
    assert text.startswith(b"ply")
    assert b"element vertex 20" in text


def test_metric_logger_jsonl_and_nan_clamp(tmp_path):
    logger = MetricLogger(run_name="t", out_dir=str(tmp_path))
    ema = logger.log({"loss": 2.0}, step=1)
    assert abs(ema["train/loss"] - 2.0) < 1e-6
    # NaN must not poison the EMA but still lands in the JSONL record
    ema = logger.log({"loss": float("nan")}, step=2)
    assert ema["train/loss"] == ema["train/loss"]  # not NaN
    lines = (tmp_path / "t.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2 and json.loads(lines[0])["step"] == 1


def test_match_gt_and_intrinsics():
    pred = jnp.arange(2 * 10 * 12 * 1, dtype=jnp.float32).reshape(2, 10, 12, 1)
    out = match_gt(pred, (8, 8), padding1=(2, 2, 1, 1))
    assert out.shape == (2, 8, 8, 1)
    # un-padding alone: the interior survives exactly
    interior = remove_padding(pred, (2, 2, 1, 1))
    assert interior.shape == (2, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(interior), atol=1e-4)

    K = jnp.asarray([[[100.0, 0, 6.0], [0, 100.0, 5.0], [0, 0, 1]]])
    K2 = match_intrinsics(K, (10, 12), (16, 16), padding1=(2, 2, 1, 1))
    # cx shifts by -left then scales by 16/8
    assert float(K2[0, 0, 2]) == (6.0 - 2) * 2.0
    assert float(K2[0, 1, 2]) == (5.0 - 1) * 2.0
    assert float(K2[0, 0, 0]) == 100.0 * 2.0


def test_profile_method_decorator():
    calls = []

    class M:
        @profile_method()
        def fwd(self, x):
            calls.append(x)
            return x + 1

    m = M()
    assert m.fwd(1) == 2 and calls == [1]


def test_sharded_eval_sampler_no_duplicates():
    # 10 items over 3 shards: every index exactly once, trailing shard short
    seen = []
    lens = []
    for shard in range(3):
        s = ShardedEvalSampler(10, 3, shard)
        idxs = list(s)
        lens.append(len(idxs))
        seen.extend(idxs)
    assert sorted(seen) == list(range(10))
    # no padding duplicates (reference DistributedSamplerNoDuplicate)
    assert max(lens) - min(lens) <= 1


def test_log_train_artifacts_grid_and_metric_logger_image(tmp_path, rng):
    """Training image artifacts (reference visualization.py:136-199): grid of
    rgb / colorized GT / ssi-rescaled pred, saved as a PNG artifact via
    MetricLogger.log_image (the wandb.Image replacement)."""
    from unidepth_tpu.utils.logging import MetricLogger
    from unidepth_tpu.utils.visualization import log_train_artifacts

    h, w, n = 24, 32, 3
    rgbs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n)]
    gts = [rng.uniform(0.5, 10.0, (h, w, 1)).astype(np.float32) for _ in range(n)]
    preds = [2.0 * g + 1.0 for g in gts]  # affine-off preds: ssi must realign
    grid = log_train_artifacts(rgbs, gts, preds)
    assert grid.shape == (3 * h, n * w, 3) and grid.dtype == np.uint8
    # rgb row is passed through untouched
    np.testing.assert_array_equal(grid[:h, :w], rgbs[0])
    # ssi alignment makes pred row match the gt row's colorization closely
    gt_row = grid[h : 2 * h].astype(np.int32)
    pred_row = grid[2 * h :].astype(np.int32)
    assert np.abs(gt_row - pred_row).mean() < 8.0

    # extra info rows and the no-GT branch
    grid2 = log_train_artifacts(rgbs, [], preds, infos={"err": gts})
    assert grid2.shape == (3 * h, n * w, 3)

    logger = MetricLogger(run_name="t", out_dir=str(tmp_path))
    path = logger.log_image("val_training", grid, step=7)
    logger.close()
    assert path is not None and path.endswith("val_training_7.png")
    from PIL import Image

    assert Image.open(path).size == (n * w, 3 * h)
    recs = [json.loads(l) for l in open(tmp_path / "t.jsonl")]
    assert any("image/val_training" in r for r in recs)
