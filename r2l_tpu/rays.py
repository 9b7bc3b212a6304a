"""Ray generation and camera pose math (pure jnp, batched, static shapes).

Functional equivalents of the reference's ray helpers
(`/root/reference/utils/run_nerf_raybased_helpers.py:231-279` ``get_rays`` /
``ndc_rays``, `model/nerf_raybased.py:170-188` Plücker variants) and the
Blender pose synthesis utilities (`dataset/load_blender.py:10-28,327-368`).

Conventions (identical to the reference so checkpoints are interchangeable):
  * pixel (i, j) -> camera-frame direction [(i - W/2)/f, -(j - H/2)/f, -1]
  * c2w is a [3, 4] (or [4, 4]) camera-to-world matrix; rays_d = R @ dir,
    rays_o = t broadcast to every pixel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def camera_ray_dirs(H: int, W: int, focal: float) -> Array:
    """Per-pixel camera-frame ray directions, shape [H, W, 3]."""
    i = jnp.arange(W, dtype=jnp.float32)[None, :]  # [1, W]
    j = jnp.arange(H, dtype=jnp.float32)[:, None]  # [H, 1]
    dirs = jnp.stack(
        [
            jnp.broadcast_to((i - W * 0.5) / focal, (H, W)),
            jnp.broadcast_to(-(j - H * 0.5) / focal, (H, W)),
            -jnp.ones((H, W), dtype=jnp.float32),
        ],
        axis=-1,
    )
    return dirs  # [H, W, 3]


def donerf_ray_dirs(H: int, W: int, focal: float) -> np.ndarray:
    """DONeRF-convention per-pixel UNIT ray directions [H, W, 3] in the
    camera frame (reference `utils/convert_original_data_to_rays_blender
    .py:35-57`, itself lifted from DONeRF util/raygeneration.py). Two
    deltas vs the NeRF grid (``camera_ray_dirs``): pixel centers sit at
    the half-pixel offset, and directions are NORMALIZED before the c2w
    rotation. The reference parametrizes by (fov, focal), but with
    ``focal = W/(2 tan(fov/2))`` the grid collapses to a pure function
    of (H, W, focal): x_dist = tan(fov/2)*focal = W/2, step 1 px.
    """
    i = np.arange(W, dtype=np.float64)
    j = np.arange(H, dtype=np.float64)
    d = np.stack(np.broadcast_arrays(
        (i - W / 2 + 0.5)[None, :],
        (j - H / 2 + 0.5)[:, None],
        np.full((H, W), float(focal))), axis=-1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d[..., 1] *= -1.0
    d[..., 2] *= -1.0
    return d.astype(np.float32)


# --trans_origin applies at EVERY get_rays call in the reference (the
# hack lives inside helpers.get_rays reading the global args singleton,
# `helpers:214-227, 248-252`). Mirror that with one module default set
# from the parsed args at startup (app.load_dataset) instead of
# threading a debug flag through every ray-generating call chain.
_DEFAULT_TRANS_ORIGIN = ""


def set_default_trans_origin(value: str) -> None:
    global _DEFAULT_TRANS_ORIGIN
    _DEFAULT_TRANS_ORIGIN = value or ""


def get_rays(H: int, W: int, focal: float, c2w: Array,
             focal_scale: float = 1.0,
             trans_origin: str | None = None) -> tuple[Array, Array]:
    """Full-frame rays for camera-to-world pose ``c2w``.

    Returns (rays_o, rays_d), each [H, W, 3]. Mirrors reference
    `helpers:231-257`. ``trans_origin`` slides origins along the (unit)
    ray direction: ``'fixed'`` -> 30 units, a numeric string -> that
    scale (reference ``translate_origin_fixed``, `helpers:214-227`);
    ``None`` uses the module default (--trans_origin).
    """
    if trans_origin is None:
        trans_origin = _DEFAULT_TRANS_ORIGIN
    dirs = camera_ray_dirs(H, W, focal * focal_scale)  # [H, W, 3]
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3], precision="highest")
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    if trans_origin:
        scale = 30.0 if trans_origin == "fixed" else float(trans_origin)
        unit = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_o = rays_o + scale * unit
    return rays_o, rays_d


def get_rays_np(H: int, W: int, focal: float, c2w,
                focal_scale: float = 1.0,
                trans_origin: str | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """Pure-numpy twin of ``get_rays`` (reference ``get_rays_np``,
    `helpers:428-441`) for host-side pose loops — datagen generates rays
    per pose on the HOST so the device never pays per-pose dispatches +
    D2H readbacks for what is cheap meshgrid math."""
    if trans_origin is None:
        trans_origin = _DEFAULT_TRANS_ORIGIN
    f = focal * focal_scale
    i = np.arange(W, dtype=np.float32)[None, :]
    j = np.arange(H, dtype=np.float32)[:, None]
    dirs = np.stack([
        np.broadcast_to((i - W * 0.5) / f, (H, W)),
        np.broadcast_to(-(j - H * 0.5) / f, (H, W)),
        -np.ones((H, W), dtype=np.float32)], axis=-1)
    c2w = np.asarray(c2w, dtype=np.float32)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape).copy()
    if trans_origin:
        scale = 30.0 if trans_origin == "fixed" else float(trans_origin)
        unit = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_o = rays_o + scale * unit
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o: Array,
             rays_d: Array) -> tuple[Array, Array]:
    """Warp rays into NDC space (LLFF forward-facing scenes).

    Mirrors reference `helpers:260-279`.
    """
    # Shift ray origins to the near plane.
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def plucker(rays_o: Array, rays_d: Array) -> Array:
    """Plücker ray coordinates [..., 6] = (d, o x d).

    Mirrors reference `model/nerf_raybased.py:170-176`.
    """
    m = jnp.cross(rays_o, rays_d)
    return jnp.concatenate([rays_d, m], axis=-1)


# ---------------------------------------------------------------------------
# Pose synthesis (Blender-style spherical cameras).
# Numpy (host-side): poses are tiny and feed the device pipeline.
# ---------------------------------------------------------------------------

def trans_t(t: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = t
    return m


def rot_phi(phi: float) -> np.ndarray:
    c, s = np.cos(phi), np.sin(phi)
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2] = c, -s
    m[2, 1], m[2, 2] = s, c
    return m


def rot_theta(th: float) -> np.ndarray:
    c, s = np.cos(th), np.sin(th)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2] = c, -s
    m[2, 0], m[2, 2] = s, c
    return m


_FLIP = np.array(
    [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
    dtype=np.float32)


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Camera-to-world [4,4] on a sphere (Blender convention).

    Mirrors reference `dataset/load_blender.py:22-28`.
    """
    c2w = trans_t(radius)
    c2w = rot_phi(phi_deg / 180.0 * np.pi) @ c2w
    c2w = rot_theta(theta_deg / 180.0 * np.pi) @ c2w
    return _FLIP @ c2w


def get_rand_pose(rng: np.random.Generator, radius: float = 4.0) -> np.ndarray:
    """Uniform random spherical pose: theta in [-180,180], phi in [-90,0].

    Mirrors reference `dataset/load_blender.py:359-368`.
    """
    theta = rng.uniform(-180.0, 180.0)
    phi = rng.uniform(-90.0, 0.0)
    return pose_spherical(theta, phi, radius)


def get_novel_poses(n_pose, phi: float = -30.0, radius: float = 4.0) -> np.ndarray:
    """Evenly spaced novel video poses.

    ``n_pose`` int -> a theta ring at fixed (phi, radius);
    ``n_pose`` [n_theta, n_phi, n_radius] -> the full grid: theta ring in
    [-180,180), phi interior of [-90,0], r interior of [2,6];
    ``'mode:value'`` items: ``sample:N`` -> the even-spaced N values for
    that axis, any other mode -> the single FIXED float value — matching
    reference `dataset/load_blender.py:327-356` (which additionally
    requires all-or-none 'mode:value' items; per-item mixing works here).
    """
    if isinstance(n_pose, int):
        thetas = np.linspace(-180.0, 180.0, n_pose + 1)[:-1]
        return np.stack([pose_spherical(t, phi, radius) for t in thetas])
    # Grid: theta ring endpoints-exclusive; phi/radius INTERIOR points of
    # [-90, 0] and [near=2, far=6] (reference `load_blender.py:337-339`
    # uses linspace(lo, hi, n+2)[1:-1]).

    def _axis(item, lo: float, hi: float, interior: bool):
        if isinstance(item, str) and ":" in item:
            mode, value = item.split(":", 1)
            if mode != "sample":
                return [float(value)]
            n = int(value)
        else:
            n = int(item)
        if interior:
            return np.linspace(lo, hi, n + 2)[1:-1]
        return np.linspace(lo, hi, n + 1)[:-1]

    thetas = _axis(n_pose[0], -180.0, 180.0, False)
    phis = _axis(n_pose[1], -90.0, 0.0, True)
    radii = _axis(n_pose[2], 2.0, 6.0, True)
    poses = [pose_spherical(t, p, r) for r in radii for p in phis for t in thetas]
    return np.stack(poses)
