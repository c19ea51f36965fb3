"""Generate the bundled demo assets (assets/demo/{rgb,depth}.png,
intrinsics.npy) — a license-clean synthetic render so a bare checkout can
run scripts/demo.py with no external mounts (the reference bundles a real
photo + sensor depth at assets/demo/*, scripts/demo.py:10-59; we ship a
deterministic raycast scene instead).

Scene: a room corner (floor + two walls) with a sphere and a box, rendered
by a pinhole camera with Lambertian shading. Depth is written as uint16
millimeters (the reference asset convention, decoded by demo.py / the
dataset layer as depth_scale=1000).

Rerun to regenerate:  python scripts/make_demo_assets.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

H, W = 480, 640
FX = FY = 520.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0


def _sphere_hit(o, d, center, radius):
    """Ray-sphere: returns t (inf when missed). o, d: (N, 3)."""
    oc = o - center
    b = np.sum(oc * d, axis=-1)
    c = np.sum(oc * oc, axis=-1) - radius**2
    disc = b * b - c
    t = np.where(disc >= 0, -b - np.sqrt(np.maximum(disc, 0.0)), np.inf)
    return np.where(t > 1e-6, t, np.inf)


def _plane_hit(o, d, p0, n):
    dn = np.sum(d * n, axis=-1)
    t = np.sum((p0 - o) * n, axis=-1) / np.where(np.abs(dn) > 1e-9, dn, 1e-9)
    return np.where((np.abs(dn) > 1e-9) & (t > 1e-6), t, np.inf)


def _box_hit(o, d, lo, hi):
    """Axis-aligned box via slab test; returns (t, normal)."""
    inv = 1.0 / np.where(np.abs(d) > 1e-9, d, 1e-9)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = np.max(np.minimum(t0, t1), axis=-1)
    tmax = np.min(np.maximum(t0, t1), axis=-1)
    hit = (tmax >= np.maximum(tmin, 1e-6))
    t = np.where(hit, tmin, np.inf)
    # entry face normal: the axis achieving tmin
    axis = np.argmax(np.minimum(t0, t1), axis=-1)
    sign = -np.sign(np.take_along_axis(d, axis[..., None], -1))[..., 0]
    normal = np.zeros_like(o)
    np.put_along_axis(normal, axis[..., None], sign[..., None], -1)
    return t, normal


def render():
    ys, xs = np.mgrid[0:H, 0:W]
    dirs = np.stack(
        [(xs - CX) / FX, (ys - CY) / FY, np.ones_like(xs, np.float64)], -1
    )
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    d = dirs.reshape(-1, 3)
    o = np.zeros_like(d)

    # camera looks +z; y is down. Floor at y=+1.2, back wall z=6, left x=-3.
    objs = []
    t_floor = _plane_hit(o, d, np.array([0, 1.2, 0.0]), np.array([0, -1.0, 0]))
    objs.append((t_floor, np.broadcast_to([0, -1.0, 0], d.shape), np.array([0.55, 0.5, 0.45]), "floor"))
    t_back = _plane_hit(o, d, np.array([0, 0, 6.0]), np.array([0, 0, -1.0]))
    objs.append((t_back, np.broadcast_to([0, 0, -1.0], d.shape), np.array([0.4, 0.45, 0.55]), "back"))
    t_left = _plane_hit(o, d, np.array([-3.0, 0, 0]), np.array([1.0, 0, 0]))
    objs.append((t_left, np.broadcast_to([1.0, 0, 0], d.shape), np.array([0.5, 0.42, 0.38]), "left"))

    c_sph = np.array([0.9, 0.55, 3.2])
    t_sph = _sphere_hit(o, d, c_sph, 0.65)
    p_sph = o + t_sph[..., None] * d
    n_sph = (p_sph - c_sph) / 0.65
    objs.append((t_sph, n_sph, np.array([0.75, 0.3, 0.25]), "sphere"))

    t_box, n_box = _box_hit(o, d, np.array([-1.9, 0.2, 3.6]), np.array([-0.7, 1.2, 4.6]))
    objs.append((t_box, n_box, np.array([0.25, 0.5, 0.3]), "box"))

    t_all = np.stack([obj[0] for obj in objs])
    idx = np.argmin(t_all, axis=0)
    t = np.min(t_all, axis=0)
    hit = np.isfinite(t)
    t = np.where(hit, t, 0.0)

    normal = np.zeros_like(d)
    albedo = np.zeros_like(d)
    for i, (_, n, a, _) in enumerate(objs):
        m = idx == i
        normal[m] = np.asarray(n)[m] if n.shape == d.shape else n
        albedo[m] = a

    light = np.array([-0.4, -0.8, -0.45])
    light /= np.linalg.norm(light)
    lam = np.clip(np.sum(normal * -light, axis=-1), 0.0, 1.0)
    shade = (0.35 + 0.65 * lam)[..., None] * albedo
    # simple checker on the floor for texture
    p = o + t[..., None] * d
    checker = ((np.floor(p[:, 0] * 1.5) + np.floor(p[:, 2] * 1.5)) % 2).astype(bool)
    floor_m = idx == 0
    shade[floor_m & checker] *= 0.75
    shade = np.where(hit[..., None], shade, 0.0)

    rgb = (np.clip(shade, 0, 1) ** (1 / 2.2) * 255).astype(np.uint8).reshape(H, W, 3)
    # z-depth (not ray length): the asset/eval convention
    depth = np.where(hit, p[:, 2], 0.0).reshape(H, W)
    return rgb, depth


def main():
    from PIL import Image

    out = Path(__file__).resolve().parents[1] / "assets" / "demo"
    out.mkdir(parents=True, exist_ok=True)
    rgb, depth = render()
    Image.fromarray(rgb).save(out / "rgb.png")
    depth_mm = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
    Image.fromarray(depth_mm).save(out / "depth.png")
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
    np.save(out / "intrinsics.npy", K)
    print(f"wrote {out}/rgb.png depth.png intrinsics.npy "
          f"(depth range {depth[depth > 0].min():.2f}-{depth.max():.2f} m)")


if __name__ == "__main__":
    main()
