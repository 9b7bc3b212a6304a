"""Point sampling along rays (the R2L ray representation).

TPU-native rework of the reference ``PointSampler``
(`/root/reference/model/nerf_raybased.py:76-188`): a frozen config + pure
functions with explicit PRNG keys (vs torch global RNG), static shapes, no
Python control flow under jit.

A ray is represented as ``n_sample`` points o + d*z for evenly spaced z in
[near, far] (optionally stratified-jittered during training), flattened to a
[n_ray, n_sample*3] vector — the input of the R2L light-field MLP. The
Plücker 6-d alternative is also provided.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .rays import camera_ray_dirs, plucker

Array = jax.Array


def even_z_vals(near: float, far: float, n_sample: int) -> Array:
    """Evenly spaced sample depths in [near, far], shape [n_sample]."""
    t = jnp.linspace(0.0, 1.0, n_sample, dtype=jnp.float32)
    return near * (1.0 - t) + far * t


def stratify_z(key: jax.Array, z_vals: Array, shape_prefix: tuple[int, ...]) -> Array:
    """Stratified jitter of per-ray z values within their bins.

    z_vals: [..., n_sample] (broadcast from [n_sample] if needed).
    Mirrors the mids/upper/lower construction of reference
    `model/nerf_raybased.py:117-123` with an explicit key.
    """
    z = jnp.broadcast_to(z_vals, (*shape_prefix, z_vals.shape[-1]))
    lower, upper = _strat_bounds(z)
    t_rand = jax.random.uniform(key, z.shape, dtype=z.dtype)
    return lower + (upper - lower) * t_rand


def _strat_bounds(z: Array) -> tuple[Array, Array]:
    """Per-bin [lower, upper] bounds for stratified jitter (reference
    `model/nerf_raybased.py:117-123`); shared by per-ray and per-image
    jitter so the bin construction cannot diverge."""
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
    lower = jnp.concatenate([z[..., :1], mids], axis=-1)
    return lower, upper


def ray_points(rays_o: Array, rays_d: Array, z_vals: Array) -> Array:
    """Sample points o + d*z. rays_o/d: [..., 3], z_vals: [..., n_sample]
    -> [..., n_sample, 3]."""
    return rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]


@dataclasses.dataclass(frozen=True)
class PointSampler:
    """Static sampling config for one camera intrinsics + depth range.

    All methods are pure; jit-compatible (H/W/n_sample are Python ints).
    """
    H: int
    W: int
    focal: float
    n_sample: int
    near: float
    far: float

    @property
    def z_vals(self) -> Array:
        return even_z_vals(self.near, self.far, self.n_sample)

    def frame_rays(self, c2w: Array) -> tuple[Array, Array]:
        """Flattened full-frame rays -> (rays_o, rays_d) each [H*W, 3]."""
        dirs = camera_ray_dirs(self.H, self.W, self.focal)
        rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3], precision="highest").reshape(-1, 3)
        rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
        return rays_o, rays_d

    def sample_test(self, c2w: Array) -> Array:
        """Full-frame even samples: c2w [3,4] -> [H*W, n_sample*3]."""
        rays_o, rays_d = self.frame_rays(c2w)
        pts = ray_points(rays_o, rays_d, self.z_vals[None, :])
        return pts.reshape(pts.shape[0], -1)

    def sample_train(self, rays_o: Array, rays_d: Array,
                     key: jax.Array | None = None) -> Array:
        """Batch samples with optional stratified jitter.

        rays_o/d: [n_ray, 3] -> [n_ray, n_sample*3]. ``key=None`` means no
        perturbation (the reference's ``perturb=0``).
        """
        if key is None:
            z = jnp.broadcast_to(self.z_vals, (rays_o.shape[0], self.n_sample))
        else:
            z = stratify_z(key, self.z_vals, (rays_o.shape[0],))
        pts = ray_points(rays_o, rays_d, z)
        return pts.reshape(pts.shape[0], -1)

    def sample_test_plucker(self, c2w: Array) -> Array:
        rays_o, rays_d = self.frame_rays(c2w)
        return plucker(rays_o, rays_d)

    def sample_train_plucker(self, rays_o: Array, rays_d: Array) -> Array:
        return plucker(rays_o, rays_d)

    def sample_train_patches(self, rays_o: Array, rays_d: Array,
                             key: jax.Array | None = None) -> Array:
        """Patch-structured sampling for CNN-style students: rays
        [n_img, ph, pw, 3] -> points [n_img, ph, pw, n_sample, 3], with one
        shared stratified jitter PER IMAGE (the reference's
        ``sample_train2``/``sample_train_cnnstyle``,
        `model/nerf_raybased.py:128-168`, draws a single t_rand per image)."""
        n_img = rays_o.shape[0]
        z = jnp.broadcast_to(self.z_vals,
                             (*rays_o.shape[:3], self.n_sample))
        if key is not None:
            lower, upper = _strat_bounds(z)
            t = jax.random.uniform(key, (n_img, 1, 1, 1), dtype=z.dtype)
            z = lower + (upper - lower) * t
        return ray_points(rays_o, rays_d, z)
