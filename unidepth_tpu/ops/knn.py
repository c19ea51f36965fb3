"""Nearest-neighbor distances between padded point clouds.

TPU replacement for the reference's CUDA KNN extension
(reference unidepth/ops/knn/src/knn.cu, ~1.7k LoC of MinK kernels): the
evaluation path only ever uses K=1 (chamfer_distance.py:143-144), so the
op is a *tiled pairwise-distance min-reduction*, not a literal top-K port.
Queries are processed in static chunks so memory stays at
O(chunk * P2) while the MXU computes the distance matrix as a matmul:
||x - y||^2 = ||x||^2 + ||y||^2 - 2 x.y^T.

``nn_distances`` supports variable lengths via masking; invalid reference
points are pushed to +inf before the min.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["nn_distances", "chamfer_distance", "knn_points", "knn_gather"]


def _chunk_min_dists(xc, y, y_valid):
    """xc: (C, D); y: (P2, D); y_valid: (P2,) -> (C,) min sq-dists + argmin."""
    x2 = jnp.sum(xc * xc, axis=-1, keepdims=True)  # (C, 1)
    y2 = jnp.sum(y * y, axis=-1)[None, :]  # (1, P2)
    xy = jnp.dot(xc, y.T, preferred_element_type=jnp.float32)
    d2 = x2 + y2 - 2.0 * xy
    d2 = jnp.where(y_valid[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1)
    return jnp.maximum(jnp.min(d2, axis=-1), 0.0), idx


def nn_distances(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_valid: jnp.ndarray | None = None,
    y_valid: jnp.ndarray | None = None,
    chunk: int = 2048,
):
    """x: (P1, D), y: (P2, D) -> (sq_dists (P1,), idx (P1,)).

    Invalid queries get 0 distance (excluded by callers via x_valid).
    """
    p1, d = x.shape
    if y_valid is None:
        y_valid = jnp.ones(y.shape[0], bool)
    pad = (-p1) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xc = xp.reshape(-1, chunk, d)
    f = functools.partial(_chunk_min_dists, y=y, y_valid=y_valid)
    d2, idx = jax.lax.map(f, xc)
    d2 = d2.reshape(-1)[:p1]
    idx = idx.reshape(-1)[:p1]
    if x_valid is not None:
        d2 = jnp.where(x_valid, d2, 0.0)
    return d2, idx


def _chunk_topk_dists(xc, y, y_valid, k: int):
    """xc: (C, D); y: (P2, D) -> (C, K) ascending sq-dists + indices."""
    x2 = jnp.sum(xc * xc, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1)[None, :]
    xy = jnp.dot(xc, y.T, preferred_element_type=jnp.float32)
    d2 = x2 + y2 - 2.0 * xy
    d2 = jnp.where(y_valid[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    # clouds with fewer than k valid points: zero-fill dists and idx past
    # the valid count, matching PyTorch3D knn_points padding semantics
    # (reference ops/knn/functions/knn.py:113)
    sel_valid = neg > -jnp.inf
    return (
        jnp.where(sel_valid, jnp.maximum(-neg, 0.0), 0.0),
        jnp.where(sel_valid, idx, 0),
    )


def knn_topk(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_valid: jnp.ndarray | None = None,
    y_valid: jnp.ndarray | None = None,
    k: int = 1,
    chunk: int = 2048,
):
    """x: (P1, D), y: (P2, D) -> (sq_dists (P1, K), idx (P1, K)), K nearest
    ascending. General-K counterpart of ``nn_distances`` via chunked
    ``lax.top_k`` over the tiled distance matrix (reference CUDA MinK
    kernels, ops/knn/src/knn.cu)."""
    p1, d = x.shape
    if y_valid is None:
        y_valid = jnp.ones(y.shape[0], bool)
    pad = (-p1) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xc = xp.reshape(-1, chunk, d)
    f = functools.partial(_chunk_topk_dists, y=y, y_valid=y_valid, k=k)
    d2, idx = jax.lax.map(f, xc)
    d2 = d2.reshape(-1, k)[:p1]
    idx = idx.reshape(-1, k)[:p1]
    if x_valid is not None:
        d2 = jnp.where(x_valid[:, None], d2, 0.0)
        idx = jnp.where(x_valid[:, None], idx, 0)
    return d2, idx


def knn_points(x, y, x_valid=None, y_valid=None, k: int = 1):
    """PyTorch3D-style API: returns (dists (B,P1,K), idx (B,P1,K)) sorted
    ascending, with variable lengths via validity masks.

    x, y: (B, P1/P2, D) padded clouds (reference
    ops/knn/functions/knn.py:113 ``knn_points``; K=1 keeps the tiled
    min-reduction fast path used by the chamfer eval)."""
    if x_valid is None:
        x_valid = jnp.ones(x.shape[:2], bool)
    if y_valid is None:
        y_valid = jnp.ones(y.shape[:2], bool)

    if k == 1:
        def one(args):
            xi, yi, xv, yv = args
            d2, idx = nn_distances(xi, yi, xv, yv)
            return d2[:, None], idx[:, None]

        d2, idx = jax.lax.map(one, (x, y, x_valid, y_valid))
        return d2, idx

    def one_k(args):
        xi, yi, xv, yv = args
        return knn_topk(xi, yi, xv, yv, k=k)

    d2, idx = jax.lax.map(one_k, (x, y, x_valid, y_valid))
    return d2, idx


def knn_gather(y: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features: y (B, P2, D), idx (B, P1, K) ->
    (B, P1, K, D) (reference ops/knn/functions/knn.py:199 ``knn_gather``)."""
    b, p1, k = idx.shape
    flat = idx.reshape(b, p1 * k)
    out = jnp.take_along_axis(y, flat[..., None], axis=1)
    return out.reshape(b, p1, k, y.shape[-1])


def chamfer_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_valid: jnp.ndarray | None = None,
    y_valid: jnp.ndarray | None = None,
):
    """Symmetric chamfer: (sqrt(d_xy) + sqrt(d_yx)) / 2 per direction plus
    the raw directional sq-dists (reference chamfer_dist,
    evaluation_depth.py:12-19)."""
    d_xy, _ = nn_distances(x, y, x_valid, y_valid)
    d_yx, _ = nn_distances(y, x, y_valid, x_valid)
    return d_xy, d_yx
