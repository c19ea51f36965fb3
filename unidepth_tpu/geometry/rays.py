"""Ray generation and spherical<->euclidean conversions.

Parity targets: reference unidepth/utils/geometric.py:12-114. Channel-last.
Note generate_rays uses linspace(0, W-1) + 0.5 pixel centers (identical to
coords_grid) and returns (theta, phi) angles alongside unit rays.
"""

from __future__ import annotations

import jax.numpy as jnp

from unidepth_tpu.geometry.coords import coords_grid

__all__ = [
    "generate_rays",
    "spherical_zbuffer_to_euclidean",
    "spherical_to_euclidean",
    "euclidean_to_spherical",
    "unproject_points",
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
