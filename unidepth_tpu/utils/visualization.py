"""Visualization helpers (reference unidepth/utils/visualization.py).

matplotlib-free colorization (fixed colormaps as lookup tables) so the
library has no plotting dependency; ``image_grid`` composes comparison
panels; ``save_point_cloud`` writes an ASCII PLY.
"""

from __future__ import annotations

import numpy as np

__all__ = ["colorize", "image_grid", "log_train_artifacts", "save_point_cloud"]


def _magma_lut(n: int = 256) -> np.ndarray:
    # compact piecewise-linear fit of matplotlib's magma endpoints
    anchors = np.asarray(
        [
            (0.001462, 0.000466, 0.013866),
            (0.316654, 0.071690, 0.485380),
            (0.716387, 0.214982, 0.475290),
            (0.986700, 0.535582, 0.382210),
            (0.987053, 0.991438, 0.749504),
        ]
    )
    xs = np.linspace(0, 1, len(anchors))
    xi = np.linspace(0, 1, n)
    return np.stack(
        [np.interp(xi, xs, anchors[:, c]) for c in range(3)], axis=-1
    )


_LUTS = {"magma": _magma_lut(), "magma_r": _magma_lut()[::-1]}


def colorize(
    value: np.ndarray,
    vmin: float | None = None,
    vmax: float | None = None,
    cmap: str = "magma_r",
) -> np.ndarray:
    """(H, W) depth/err map -> (H, W, 3) uint8. Invalid (<=0) pixels black."""
    value = np.asarray(value, np.float64).squeeze()
    invalid = ~np.isfinite(value) | (value <= 0)
    valid = ~invalid
    if vmin is None:
        vmin = np.percentile(value[valid], 2) if valid.any() else 0.0
    if vmax is None:
        vmax = np.percentile(value[valid], 98) if valid.any() else 1.0
    x = np.clip((value - vmin) / max(vmax - vmin, 1e-9), 0.0, 1.0)
    lut = _LUTS.get(cmap, _LUTS["magma_r"])
    rgb = lut[(x * (len(lut) - 1)).astype(np.int32)]
    rgb[invalid] = 0.0
    return (rgb * 255).astype(np.uint8)


def image_grid(images: list[np.ndarray], rows: int, cols: int) -> np.ndarray:
    """Stack equal-size (H, W, 3) images into a (rows*H, cols*W, 3) grid."""
    h, w = images[0].shape[:2]
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, img in enumerate(images[: rows * cols]):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
    return grid


def log_train_artifacts(
    rgbs, gts, preds, out_path: str | None = None, infos: dict | None = None
) -> np.ndarray:
    """Compose the training-artifact comparison grid: one column per sample,
    rows = rgb / colorized GT / SSI-rescaled colorized prediction /
    extra maps (reference utils/visualization.py:136-199
    ``log_train_artifacts``; the wandb image upload is replaced by an
    optional PNG on disk — pair with MetricLogger.log_image).

    rgbs: list/array of (H, W, 3) uint8 or float images; gts/preds:
    (H, W[, 1]) depth maps (gts may be empty); infos: {name: list of
    (H, W[, 3]) arrays} appended as extra rows. Returns the uint8 grid.
    """
    from unidepth_tpu.utils.misc import ssi_helper

    def to_u8(img):
        img = np.asarray(img)
        if img.dtype != np.uint8:
            if img.min() < 0:  # [-1, 1]-normalized (reference convention)
                img = (127.5 * (img + 1.0)).clip(0, 255)
            elif img.max() <= 1.0 + 1e-6:
                img = img * 255.0
            img = img.clip(0, 255).astype(np.uint8)
        return img

    rgbs = [to_u8(r) for r in rgbs]
    cols = len(rgbs)
    gts = [np.asarray(g).squeeze() for g in gts]
    preds = [np.asarray(p).squeeze() for p in preds]
    gt_rows, pred_rows = [], []
    if len(gts):
        for gt, pred in zip(gts, preds):
            valid = gt > 0
            if valid.any():
                # align pred onto the GT scale (reference ssi_helper(gt, pred)
                # solves pred*scale+shift ~= gt; repo ssi_helper aligns its
                # first arg onto its second)
                scale, shift = ssi_helper(pred[valid], gt[valid])
                scale = float(np.asarray(scale).reshape(-1)[0])
                shift = float(np.asarray(shift).reshape(-1)[0])
                pred = pred * scale + shift
                vmin, vmax = float(gt[valid].min()), float(gt.max())
            else:
                vmin, vmax = 0.0, 0.1
            gt_rows.append(colorize(gt, vmin=vmin, vmax=vmax))
            pred_rows.append(colorize(pred, vmin=vmin, vmax=vmax))
    else:
        pred_rows = [colorize(p, 0.0, 80.0) for p in preds]

    extra = []
    n_extra = 0
    for _, info in (infos or {}).items():
        n_extra += 1
        for x in list(info)[:cols]:
            x = np.asarray(x)
            extra.append(to_u8(x) if x.ndim == 3 and x.shape[-1] == 3 else colorize(x))

    rows = 2 + int(len(gt_rows) > 0) + n_extra
    grid = image_grid([*rgbs, *gt_rows, *pred_rows, *extra], rows, cols)
    if out_path is not None:
        from PIL import Image

        Image.fromarray(grid).save(out_path)
    return grid


def save_point_cloud(path: str, points: np.ndarray, colors: np.ndarray | None = None):
    """points (N, 3) float, colors (N, 3) uint8 -> ASCII PLY."""
    points = np.asarray(points).reshape(-1, 3)
    n = len(points)
    has_c = colors is not None
    if has_c:
        colors = np.asarray(colors).reshape(-1, 3).astype(np.uint8)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_c:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i, 0]:.5f} {points[i, 1]:.5f} {points[i, 2]:.5f}"
            if has_c:
                row += f" {colors[i, 0]} {colors[i, 1]} {colors[i, 2]}"
            f.write(row + "\n")
