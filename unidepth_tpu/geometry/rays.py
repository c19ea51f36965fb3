"""Ray generation and spherical<->euclidean conversions.

Parity targets: reference unidepth/utils/geometric.py:12-114. Channel-last.
Note generate_rays uses linspace(0, W-1) + 0.5 pixel centers (identical to
coords_grid) and returns (theta, phi) angles alongside unit rays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unidepth_tpu.geometry.coords import coords_grid

__all__ = [
    "generate_rays",
    "spherical_zbuffer_to_euclidean",
    "spherical_to_euclidean",
    "euclidean_to_spherical",
    "unproject_points",
    "project_points",
    "downsample_min",
    "dilate",
    "erode",
    "iou",
]


def generate_rays(K: jnp.ndarray, shape: tuple[int, int]):
    """K (B,3,3) -> unit rays (B, H*W, 3) and angles (B, H*W, 2).

    theta = atan2(x, z), phi = acos(y) (reference geometric.py:48-52).
    """
    h, w = shape
    b = K.shape[0]
    uv1 = coords_grid(h, w, homogeneous=True).reshape(-1, 3)  # (HW, 3)
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    x = (uv1[None, :, 0] - cx[:, None]) / fx[:, None]
    y = (uv1[None, :, 1] - cy[:, None]) / fy[:, None]
    rays = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True).clip(1e-12)
    theta = jnp.arctan2(rays[..., 0], rays[..., 2])
    phi = jnp.arccos(jnp.clip(rays[..., 1], -1.0, 1.0))
    return rays, jnp.stack([theta, phi], axis=-1)


def spherical_zbuffer_to_euclidean(spherical: jnp.ndarray) -> jnp.ndarray:
    """(theta, phi, z) -> (x, y, z) with z-buffer depth
    (reference geometric.py:56-73)."""
    theta = spherical[..., 0]
    phi = spherical[..., 1]
    z = spherical[..., 2]
    x = z * jnp.tan(theta)
    y = z / jnp.tan(phi) / jnp.cos(theta)
    return jnp.stack([x, y, z], axis=-1)


def spherical_to_euclidean(spherical: jnp.ndarray) -> jnp.ndarray:
    theta, phi, r = spherical[..., 0], spherical[..., 1], spherical[..., 2]
    x = r * jnp.sin(phi) * jnp.sin(theta)
    y = r * jnp.cos(phi)
    z = r * jnp.cos(theta) * jnp.sin(phi)
    return jnp.stack([x, y, z], axis=-1)


def euclidean_to_spherical(xyz: jnp.ndarray) -> jnp.ndarray:
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = jnp.sqrt(x * x + y * y + z * z)
    theta = jnp.arctan2(x / r, z / r)
    phi = jnp.arccos(jnp.clip(y / r, -1.0, 1.0))
    return jnp.stack([theta, phi, r], axis=-1)


def unproject_points(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """depth (B,H,W,1), K (B,3,3) -> points (B,H,W,3).

    NOTE: the reference (geometric.py:117-157) uses *integer* pixel corners
    here (arange, no +0.5) — kept for parity.
    """
    b, h, w, _ = depth.shape
    xs = jnp.arange(w, dtype=depth.dtype)
    ys = jnp.arange(h, dtype=depth.dtype)
    gx = jnp.broadcast_to(xs[None, :], (h, w))
    gy = jnp.broadcast_to(ys[:, None], (h, w))
    fx, fy = K[:, None, None, 0, 0], K[:, None, None, 1, 1]
    cx, cy = K[:, None, None, 0, 2], K[:, None, None, 1, 2]
    x = (gx[None] - cx) / fx
    y = (gy[None] - cy) / fy
    rays = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return rays * depth


def project_points(points_3d: jnp.ndarray, K: jnp.ndarray, image_shape: tuple[int, int]) -> jnp.ndarray:
    """Scatter-based mean-depth rendering of 3D points onto the image grid
    (reference geometric.py:160-204): project with K, accumulate z and
    counts per pixel with segment sums, divide.

    points_3d: (B, N, 3); K: (B, 3, 3) -> (B, H, W, 1).
    """
    h, w = image_shape
    uvw = jnp.einsum("bij,bnj->bni", K, points_3d)
    uv = uvw[..., :2] / uvw[..., 2:3]
    uv = uv.astype(jnp.int32)
    valid = (
        (uv[..., 0] >= 0)
        & (uv[..., 0] < w)
        & (uv[..., 1] >= 0)
        & (uv[..., 1] < h)
    )
    flat = jnp.clip(uv[..., 1], 0, h - 1) * w + jnp.clip(uv[..., 0], 0, w - 1)
    z = jnp.where(valid, points_3d[..., 2], 0.0)
    ones = valid.astype(jnp.float32)

    def one(args):
        idx, zz, cc = args
        depth = jnp.zeros(h * w, jnp.float32).at[idx].add(zz)
        count = jnp.zeros(h * w, jnp.float32).at[idx].add(cc)
        return depth / jnp.maximum(count, 1.0)

    out = jax.lax.map(one, (flat, z, ones))
    return out.reshape(-1, h, w, 1)


def downsample_min(depth: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Min-pool downsample of sparse depth, zeros treated as invalid
    (reference geometric.py:207-224). depth: (B, H, W, 1)."""
    big = jnp.where(depth == 0.0, 1e5, depth)
    pooled = -jax.lax.reduce_window(
        -big,
        -jnp.inf,
        jax.lax.max,
        (1, factor, factor, 1),
        (1, factor, factor, 1),
        "VALID",
    )
    return jnp.where(pooled > 1000.0, 0.0, pooled)


def dilate(mask: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Binary dilation via max-pool (reference geometric.py:255-268).
    mask: (B, H, W, 1) float/bool."""
    m = mask.astype(jnp.float32)
    out = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max,
        (1, kernel_size, kernel_size, 1), (1, 1, 1, 1), "SAME",
    )
    return (out > 0).astype(mask.dtype)


def erode(mask: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Binary erosion via min-pool (reference geometric.py:271-284)."""
    m = mask.astype(jnp.float32)
    out = -jax.lax.reduce_window(
        -m, -jnp.inf, jax.lax.max,
        (1, kernel_size, kernel_size, 1), (1, 1, 1, 1), "SAME",
    )
    return (out >= 1.0).astype(mask.dtype)


def iou(mask1: jnp.ndarray, mask2: jnp.ndarray) -> jnp.ndarray:
    """(reference geometric.py:287-302)."""
    a = mask1.astype(bool)
    b = mask2.astype(bool)
    inter = jnp.sum(a & b).astype(jnp.float32)
    union = jnp.maximum(jnp.sum(a | b).astype(jnp.float32), 1.0)
    return inter / union
