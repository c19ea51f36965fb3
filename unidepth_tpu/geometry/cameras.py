"""Generalized camera library as JAX pytrees.

Functional re-design of reference unidepth/utils/camera.py (1.3k LoC of
mutable torch classes): every camera is an immutable ``flax.struct``
dataclass holding a ``(B, P)`` parameter array; crop/resize/flip return new
instances, so cameras flow through ``jit`` boundaries as pytrees. The
iterative (Newton) unprojections of the distortion models run as
fixed-count ``lax.fori_loop`` — compiler-friendly, no data-dependent
control flow.

Conventions (match the reference):
  * pixel coordinates are *centers* at +0.5 (geometry/coords.py);
  * ``params[..., :4] = (fx, fy, cx, cy)`` for all camera families;
  * rays/points are channel-last ``(B, H, W, 3)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from unidepth_tpu.geometry.coords import coords_grid

__all__ = ["Pinhole", "EUCM", "Spherical", "OpenCV", "Fisheye624", "MEI", "BatchCamera"]


def _norm(x, axis=-1, eps=0.0):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return n if eps == 0.0 else jnp.maximum(n, eps)


class CameraBase(struct.PyTreeNode):
    """Shared affine behaviour over (fx, fy, cx, cy) = params[..., :4]."""

    params: jnp.ndarray  # (B, P) float32

    # ---- intrinsics matrix ------------------------------------------------
    @property
    def batch(self) -> int:
        return self.params.shape[0]

    @property
    def K(self) -> jnp.ndarray:
        fx, fy, cx, cy = (self.params[..., i] for i in range(4))
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        rows = jnp.stack(
            [
                jnp.stack([fx, z, cx], -1),
                jnp.stack([z, fy, cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )
        return rows

    @property
    def K_inv(self) -> jnp.ndarray:
        fx, fy, cx, cy = (self.params[..., i] for i in range(4))
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([1.0 / fx, z, -cx / fx], -1),
                jnp.stack([z, 1.0 / fy, -cy / fy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    # ---- affine re-parameterizations -------------------------------------
    def crop(self, left, top, right=None, bottom=None):
        """Shift the principal point; negative values express padding
        (reference utils/camera.py:115-120)."""
        delta = jnp.zeros_like(self.params)
        delta = delta.at[..., 2].set(-left)
        delta = delta.at[..., 3].set(-top)
        return self.replace(params=self.params + delta)

    def resize(self, factor):
        scale = jnp.ones_like(self.params)
        scale = scale.at[..., :4].set(factor)
        return self.replace(params=self.params * scale)

    # distortion coefficients that flip sign under a mirror: under x -> -x
    # the x-even tangential/thin-prism terms (p2, s1, s2) need negating,
    # under y -> -y the y-even terms (p1, s3, s4). The reference's flip
    # TRUNCATES params to (fx, fy, cx, cy) entirely (utils/camera.py:100-110)
    # — corrupting distorted cameras — so this is deliberately more correct.
    # plain class attributes, NOT dataclass fields (no annotation — flax
    # struct would otherwise make them pytree-visible init fields)
    _FLIP_NEGATE_H = ()
    _FLIP_NEGATE_V = ()

    def flip(self, H, W, direction="horizontal"):
        p = self.params
        if direction == "horizontal":
            p = p.at[..., 2].set(W - p[..., 2])
            for i in self._FLIP_NEGATE_H:
                p = p.at[..., i].multiply(-1.0)
        else:
            p = p.at[..., 3].set(H - p[..., 3])
            for i in self._FLIP_NEGATE_V:
                p = p.at[..., i].multiply(-1.0)
        return self.replace(params=p)

    @property
    def hfov(self):
        return 2.0 * jnp.arctan(self.params[..., 2] / self.params[..., 0])

    @property
    def vfov(self):
        return 2.0 * jnp.arctan(self.params[..., 3] / self.params[..., 1])

    # ---- geometry interface ----------------------------------------------
    def unproject(self, uv: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def project(self, xyz: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def get_rays(self, h: int, w: int, eps: float = 1e-4) -> jnp.ndarray:
        """Unit ray directions (B, H, W, 3)."""
        uv = jnp.broadcast_to(coords_grid(h, w), (self.batch, h, w, 2))
        rays = self.unproject(uv)
        return rays / _norm(rays, eps=eps)

    def reconstruct(self, depth: jnp.ndarray) -> jnp.ndarray:
        """depth (B, H, W, 1) -> 3D points (B, H, W, 3); z-depth convention
        for perspective models (reference Camera.reconstruct)."""
        b, h, w, _ = depth.shape
        uv = jnp.broadcast_to(coords_grid(h, w), (b, h, w, 2))
        rays = self.unproject(uv)
        rays = rays / jnp.maximum(rays[..., 2:3], 1e-4)
        return rays * jnp.maximum(depth, 1e-4)


class Pinhole(CameraBase):
    """Perspective camera; params (fx, fy, cx, cy)
    (reference utils/camera.py:229-273)."""

    @classmethod
    def from_K(cls, K: jnp.ndarray) -> "Pinhole":
        if K.ndim == 2:
            K = K[None]
        params = jnp.stack(
            [K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]], axis=-1
        )
        return cls(params=params.astype(jnp.float32))

    def unproject(self, uv):
        fx, fy, cx, cy = (self.params[:, None, None, i] for i in range(4))
        x = (uv[..., 0] - cx) / fx
        y = (uv[..., 1] - cy) / fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    def project(self, xyz):
        fx, fy, cx, cy = (self.params[:, None, None, i] for i in range(4))
        z = jnp.maximum(xyz[..., 2], 0.01)
        u = fx * xyz[..., 0] / z + cx
        v = fy * xyz[..., 1] / z + cy
        return jnp.stack([u, v], axis=-1)

    def reconstruct(self, depth):
        b, h, w, _ = depth.shape
        uv = jnp.broadcast_to(coords_grid(h, w), (b, h, w, 2))
        return self.unproject(uv) * jnp.maximum(depth, 0.0)


class EUCM(CameraBase):
    """Enhanced unified camera model; params (fx, fy, cx, cy, alpha, beta)
    (reference utils/camera.py:276-328)."""

    def unproject(self, uv):
        fx, fy, cx, cy, alpha, beta = (self.params[:, None, None, i] for i in range(6))
        mx = (uv[..., 0] - cx) / fx
        my = (uv[..., 1] - cy) / fy
        r2 = mx * mx + my * my
        sqrt_val = 1.0 - (2.0 * alpha - 1.0) * beta * r2
        mz = (1.0 - beta * alpha * alpha * r2) / (
            alpha * jnp.sqrt(jnp.maximum(sqrt_val, 1e-5)) + (1.0 - alpha)
        )
        coeff = 1.0 / jnp.sqrt(mx * mx + my * my + mz * mz + 1e-5)
        return jnp.stack(
            [coeff * mx, coeff * my, jnp.maximum(coeff * mz, 1e-3)], axis=-1
        )

    def project(self, xyz):
        fx, fy, cx, cy, alpha, beta = (self.params[:, None, None, i] for i in range(6))
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        d = jnp.sqrt(beta * (x * x + y * y) + z * z)
        den = jnp.maximum(alpha * d + (1.0 - alpha) * z, 1e-3)
        return jnp.stack([fx * x / den + cx, fy * y / den + cy], axis=-1)


class Spherical(CameraBase):
    """Equirectangular panorama; params
    (fx, fy, cx, cy, W, H, hfov/2, vfov/2) — angles in radians
    (reference utils/camera.py:331-409)."""

    def resize(self, factor):
        scale = jnp.ones_like(self.params)
        scale = scale.at[..., :6].set(factor)
        return self.replace(params=self.params * scale)

    def crop(self, left, top, right=None, bottom=None):
        right = 0 if right is None else right
        bottom = 0 if bottom is None else bottom
        p = self.params
        W, H = p[..., 4], p[..., 5]
        p = p.at[..., 2].add(-left)
        p = p.at[..., 3].add(-top)
        p = p.at[..., 6].multiply((W - left - right) / W)
        p = p.at[..., 7].multiply((H - top - bottom) / H)
        p = p.at[..., 4].add(-(left + right))
        p = p.at[..., 5].add(-(top + bottom))
        return self.replace(params=p)

    def unproject(self, uv):
        p = self.params
        W, H = p[:, None, None, 4], p[:, None, None, 5]
        hfov, vfov = 2.0 * p[:, None, None, 6], 2.0 * p[:, None, None, 7]
        # (W-1)-denominator formula kept verbatim from the reference
        # (utils/camera.py:395-397) even though the library feeds +0.5
        # pixel-center coords — the half-pixel lon bias exists there too,
        # and project/unproject stay mutually consistent either way
        lon = (uv[..., 0] - (W - 1) / 2.0) / (W - 1) * hfov
        lat = (uv[..., 1] - (H - 1) / 2.0) / (H - 1) * vfov
        x = jnp.cos(lat) * jnp.sin(lon)
        z = jnp.cos(lat) * jnp.cos(lon)
        y = jnp.sin(lat)
        v = jnp.stack([x, y, z], axis=-1)
        return v / _norm(v, eps=1e-5)

    def project(self, xyz):
        p = self.params
        W, H = p[:, None, None, 4], p[:, None, None, 5]
        hfov, vfov = 2.0 * p[:, None, None, 6], 2.0 * p[:, None, None, 7]
        lon = jnp.arctan2(xyz[..., 0], xyz[..., 2])
        lat = jnp.arcsin(
            jnp.clip(xyz[..., 1] / jnp.maximum(_norm(xyz)[..., 0], 1e-5), -1.0, 1.0)
        )
        # keep the (B, 1, 1) shape: indexing [..., 0] reduced it to (B, 1),
        # which mis-broadcasts against (B, H, W) for any B > 1
        u = lon / hfov * (W - 1) + (W - 1) / 2.0
        v = lat / vfov * (H - 1) + (H - 1) / 2.0
        return jnp.stack([u, v], axis=-1)

    def reconstruct(self, depth):
        """Spherical depth is radial (reference Spherical.reconstruct)."""
        b, h, w, _ = depth.shape
        uv = jnp.broadcast_to(coords_grid(h, w), (b, h, w, 2))
        return self.unproject(uv) * depth

    @property
    def hfov(self):
        return 2.0 * self.params[..., 6]

    @property
    def vfov(self):
        return 2.0 * self.params[..., 7]


def _newton_unproject(distort_fn, mx, my, params, iters: int):
    """Invert (mx,my) -> distorted via ``iters`` damped-Newton steps with a
    numerically-computed 2x2 Jacobian, vectorized over all pixels.

    Replaces the reference's per-model Newton loops
    (utils/camera.py:496-560, 778-840) with a fixed-count fori_loop.
    """

    def body(_, xy):
        x, y = xy
        fxv, fyv = distort_fn(x, y, params)
        rx = fxv - mx
        ry = fyv - my
        eps = 1e-4
        fx_dx, fy_dx = distort_fn(x + eps, y, params)
        fx_dy, fy_dy = distort_fn(x, y + eps, params)
        j11 = (fx_dx - fxv) / eps
        j21 = (fy_dx - fyv) / eps
        j12 = (fx_dy - fxv) / eps
        j22 = (fy_dy - fyv) / eps
        det = j11 * j22 - j12 * j21
        # keep |det| >= 1e-12 while PRESERVING sign; the old
        # sign(det)*1e-12 + 1e-12 form mapped tiny negative dets to exactly
        # 0 and produced inf/NaN through the division below
        det = jnp.where(
            jnp.abs(det) < 1e-12,
            jnp.where(det < 0, -1e-12, 1e-12),
            det,
        )
        dx = (rx * j22 - ry * j12) / det
        dy = (ry * j11 - rx * j21) / det
        return (x - dx, y - dy)

    x, y = jax.lax.fori_loop(0, iters, body, (mx, my))
    return x, y


class OpenCV(CameraBase):
    """OpenCV radial/tangential/thin-prism model; params
    (fx, fy, cx, cy, k1..k6, p1, p2, s1..s4), 16 total
    (reference utils/camera.py:412-694; poly-division k4..k6 unsupported
    there too). Unprojection: 10 Newton iterations on the normalized plane.
    """

    _FLIP_NEGATE_H = (11, 12, 13)  # p2, s1, s2
    _FLIP_NEGATE_V = (10, 14, 15)  # p1, s3, s4

    iters: int = struct.field(pytree_node=False, default=10)

    @staticmethod
    def _distort(x, y, p):
        k1, k2, k3 = p[..., 4], p[..., 5], p[..., 6]
        p1, p2 = p[..., 10], p[..., 11]
        s1, s2, s3, s4 = p[..., 12], p[..., 13], p[..., 14], p[..., 15]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = (
            x * radial
            + 2.0 * p1 * x * y
            + p2 * (r2 + 2.0 * x * x)
            + s1 * r2
            + s2 * r2 * r2
        )
        yd = (
            y * radial
            + 2.0 * p2 * x * y
            + p1 * (r2 + 2.0 * y * y)
            + s3 * r2
            + s4 * r2 * r2
        )
        return xd, yd

    def unproject(self, uv):
        p = self.params[:, None, None, :]
        fx, fy, cx, cy = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
        mx = (uv[..., 0] - cx) / fx
        my = (uv[..., 1] - cy) / fy
        x, y = _newton_unproject(self._distort, mx, my, p, self.iters)
        v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        return v / _norm(v, eps=1e-5)

    def project(self, xyz):
        p = self.params[:, None, None, :]
        fx, fy, cx, cy = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
        # sign-preserving guard (reference project: eps*sign(z), e.g.
        # utils/camera.py:712-714) so rear-hemisphere points mirror like the
        # reference instead of exploding through a positive clamp
        z = xyz[..., 2]
        z = jnp.where(jnp.abs(z) < 1e-3, jnp.where(z < 0, -1e-3, 1e-3), z)
        xd, yd = self._distort(xyz[..., 0] / z, xyz[..., 1] / z, p)
        return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


class Fisheye624(CameraBase):
    """Meta "Fisheye624" (6 radial, 2 tangential, 4 thin-prism) model over
    the angle-of-incidence theta; params (fx, fy, cx, cy, k1..k6, p1, p2,
    s1..s4) (reference utils/camera.py:697-974).
    """

    _FLIP_NEGATE_H = (11, 12, 13)  # p2, s1, s2
    _FLIP_NEGATE_V = (10, 14, 15)  # p1, s3, s4

    iters: int = struct.field(pytree_node=False, default=10)

    @staticmethod
    def _theta_poly(theta, p):
        # r(theta) = theta * (1 + k1 th^2 + ... + k6 th^12), Horner form
        th2 = theta * theta
        acc = p[..., 9]
        for i in (8, 7, 6, 5, 4):
            acc = acc * th2 + p[..., i]
        return theta * (1.0 + th2 * acc)

    @staticmethod
    def _distort(ux, uy, p):
        # (ux, uy) on unit plane -> fisheye-distorted normalized coords
        r = jnp.sqrt(ux * ux + uy * uy)
        theta = jnp.arctan(r)
        rd = Fisheye624._theta_poly(theta, p)
        scale = jnp.where(r > 1e-8, rd / jnp.maximum(r, 1e-8), 1.0)
        xr, yr = ux * scale, uy * scale
        p1, p2 = p[..., 10], p[..., 11]
        s1, s2, s3, s4 = p[..., 12], p[..., 13], p[..., 14], p[..., 15]
        r2 = xr * xr + yr * yr
        xd = xr + 2.0 * p1 * xr * yr + p2 * (r2 + 2.0 * xr * xr) + s1 * r2 + s2 * r2 * r2
        yd = yr + 2.0 * p2 * xr * yr + p1 * (r2 + 2.0 * yr * yr) + s3 * r2 + s4 * r2 * r2
        return xd, yd

    def unproject(self, uv):
        p = self.params[:, None, None, :]
        fx, fy, cx, cy = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
        mx = (uv[..., 0] - cx) / fx
        my = (uv[..., 1] - cy) / fy
        x, y = _newton_unproject(self._distort, mx, my, p, self.iters)
        v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        return v / _norm(v, eps=1e-5)

    def project(self, xyz):
        p = self.params[:, None, None, :]
        fx, fy, cx, cy = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
        # sign-preserving guard (reference project: eps*sign(z), e.g.
        # utils/camera.py:712-714) so rear-hemisphere points mirror like the
        # reference instead of exploding through a positive clamp
        z = xyz[..., 2]
        z = jnp.where(jnp.abs(z) < 1e-3, jnp.where(z < 0, -1e-3, 1e-3), z)
        xd, yd = self._distort(xyz[..., 0] / z, xyz[..., 1] / z, p)
        return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


class MEI(CameraBase):
    """Unified (Mei) omnidirectional model with radial/tangential distortion;
    params (fx, fy, cx, cy, k1, k2, p1, p2, xi)
    (reference utils/camera.py:977-1142). 20 Newton iterations.
    """

    _FLIP_NEGATE_H = (7,)  # p2
    _FLIP_NEGATE_V = (6,)  # p1

    iters: int = struct.field(pytree_node=False, default=20)

    @staticmethod
    def _distort(x, y, p):
        k1, k2 = p[..., 4], p[..., 5]
        p1, p2 = p[..., 6], p[..., 7]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * k2)
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
        return xd, yd

    def unproject(self, uv):
        p = self.params[:, None, None, :]
        fx, fy, cx, cy, xi = p[..., 0], p[..., 1], p[..., 2], p[..., 3], p[..., 8]
        mx = (uv[..., 0] - cx) / fx
        my = (uv[..., 1] - cy) / fy
        x, y = _newton_unproject(self._distort, mx, my, p, self.iters)
        # lift from the unified sphere: (x, y) are mu coords; solve for z
        r2 = x * x + y * y
        disc = 1.0 + (1.0 - xi * xi) * r2
        factor = (xi + jnp.sqrt(jnp.maximum(disc, 0.0))) / (1.0 + r2)
        v = jnp.stack([factor * x, factor * y, factor - xi], axis=-1)
        return v / _norm(v, eps=1e-5)

    def project(self, xyz):
        p = self.params[:, None, None, :]
        fx, fy, cx, cy, xi = p[..., 0], p[..., 1], p[..., 2], p[..., 3], p[..., 8]
        norm = jnp.maximum(_norm(xyz)[..., 0], 1e-5)
        z = xyz[..., 2] + xi * norm
        x = xyz[..., 0] / jnp.maximum(z, 1e-5)
        y = xyz[..., 1] / jnp.maximum(z, 1e-5)
        xd, yd = self._distort(x, y, p)
        return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


_CAMERA_TYPES = [Pinhole, EUCM, Spherical, OpenCV, Fisheye624, MEI]
_CAMERA_TYPE_IDS = {cls.__name__: i for i, cls in enumerate(_CAMERA_TYPES)}
CAMERA_TYPE_IDS = _CAMERA_TYPE_IDS  # public: name -> BatchCamera type id


class BatchCamera(CameraBase):
    """Heterogeneous batch of cameras under jit.

    Instead of the reference's Python-list wrapper delegating per camera
    (utils/camera.py:1145-1308), every sample carries padded params (B, 16)
    plus an integer type id, and per-type geometry is evaluated with
    ``lax.switch`` — a static, compiler-friendly dispatch. A homogeneous
    batch (the common case) short-circuits to the concrete camera.
    """

    type_ids: jnp.ndarray = None  # (B,) int32 into _CAMERA_TYPES

    @classmethod
    def from_camera(cls, camera: CameraBase) -> "BatchCamera":
        if isinstance(camera, BatchCamera):
            return camera
        b, p = camera.params.shape
        params = jnp.pad(camera.params, ((0, 0), (0, 16 - p)))
        tid = _CAMERA_TYPE_IDS[type(camera).__name__]
        return cls(params=params, type_ids=jnp.full((b,), tid, jnp.int32))

    @classmethod
    def concat(cls, cameras: list[CameraBase]) -> "BatchCamera":
        batched = [cls.from_camera(c) for c in cameras]
        return cls(
            params=jnp.concatenate([b.params for b in batched], axis=0),
            type_ids=jnp.concatenate([b.type_ids for b in batched], axis=0),
        )

    def _dispatch(self, method: str, *args):
        def make_branch(cam_cls):
            def branch(params_and_args):
                params, rest = params_and_args
                cam = cam_cls(params=params[None])
                return getattr(cam, method)(*(a[None] for a in rest))[0]

            return branch

        branches = [make_branch(c) for c in _CAMERA_TYPES]

        def per_sample(tid, params, *rest):
            return jax.lax.switch(tid, branches, (params, rest))

        return jax.vmap(per_sample)(self.type_ids, self.params, *args)

    def unproject(self, uv):
        return self._dispatch("unproject", uv)

    def project(self, xyz):
        return self._dispatch("project", xyz)

    def reconstruct(self, depth):
        return self._dispatch("reconstruct", depth)

    # ---- per-type affine dispatch -----------------------------------------
    # crop/resize/flip are parameter-only updates, but their semantics differ
    # per camera type (Spherical must rescale W/H/hfov/vfov, reference
    # utils/camera.py:331-409 vs the pinhole-affine base :115-130). Falling
    # through to the base would silently corrupt Spherical members of a
    # mixed batch, so evaluate every type's cheap update and select per
    # sample by type id.
    def _affine_select(self, method: str, *args, **kwargs):
        variants = jnp.stack(
            [
                getattr(cls(params=self.params), method)(*args, **kwargs).params
                for cls in _CAMERA_TYPES
            ]
        )  # (T, B, 16)
        params = jnp.take_along_axis(
            variants, self.type_ids[None, :, None].astype(jnp.int32), axis=0
        )[0]
        return self.replace(params=params)

    def crop(self, left, top, right=None, bottom=None):
        return self._affine_select("crop", left, top, right, bottom)

    def resize(self, factor):
        return self._affine_select("resize", factor)

    def flip(self, H, W, direction="horizontal"):
        return self._affine_select("flip", H, W, direction=direction)

    def _property_select(self, name: str):
        vals = jnp.stack(
            [getattr(cls(params=self.params), name) for cls in _CAMERA_TYPES]
        )  # (T, B)
        return jnp.take_along_axis(vals, self.type_ids[None].astype(jnp.int32), axis=0)[0]

    @property
    def hfov(self):
        return self._property_select("hfov")

    @property
    def vfov(self):
        return self._property_select("vfov")


def _camera_base_extras():
    """Attach late-bound helpers to CameraBase (kept out of the class body
    to avoid a circular import with ops.patches)."""

    def get_pinhole_rays(self, h: int, w: int, eps: float = 1e-4):
        """Rays through the pinhole part of K only (reference
        utils/camera.py:94-98) — differs from get_rays for distorted models."""
        uv = jnp.broadcast_to(coords_grid(h, w, homogeneous=True), (self.batch, h, w, 3))
        rays = jnp.einsum("bij,bhwj->bhwi", self.K_inv, uv)
        return rays / _norm(rays, eps=eps)

    def mask_overlap_projection(self, projected: jnp.ndarray) -> jnp.ndarray:
        """Occlusion/fold-over mask for a projected flow field (reference
        utils/camera.py:132-154): sample the flow a small step along itself;
        pixels whose flow shrinks are overlaps."""
        from unidepth_tpu.ops.patches import bilinear_sample

        b, h, w, _ = projected.shape
        idc = jnp.broadcast_to(coords_grid(h, w), (b, h, w, 2))
        flow = projected - idc
        gamma = 0.1
        grid = gamma * flow + idc
        sampled = bilinear_sample(flow, grid, zero_pad=False)
        fn = jnp.linalg.norm(flow, axis=-1, keepdims=True)
        sn = jnp.linalg.norm(sampled, axis=-1, keepdims=True)
        return ((1.0 - gamma) * fn < sn) | (fn < 1.0)

    def get_new_fov(self, new_shape, original_shape):
        new_hfov = 2.0 * jnp.arctan(
            self.params[..., 2] / self.params[..., 0] * new_shape[1] / original_shape[1]
        )
        new_vfov = 2.0 * jnp.arctan(
            self.params[..., 3] / self.params[..., 1] * new_shape[0] / original_shape[0]
        )
        return new_hfov, new_vfov

    CameraBase.get_pinhole_rays = get_pinhole_rays
    CameraBase.mask_overlap_projection = mask_overlap_projection
    CameraBase.get_new_fov = get_new_fov


_camera_base_extras()
