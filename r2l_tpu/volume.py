"""Volumetric rendering math: alpha compositing + hierarchical resampling.

ONE shared implementation (the reference triplicates this stack across
`main.py:556-621`, `utils/create_data.py:335-402` and
`model/nerf_raybased.py:226-295`; `sample_pdf` at `helpers:283-330` even runs
on CPU in the reference's hot loop — here everything is on-device jnp under
jit, vectorized along rays).

Exact reference constants preserved for checkpoint-parity: 1e10 far-distance
pad, 1e-10 transmittance epsilon, 1e-5 pdf floor, sigmoid on RGB, relu on
sigma.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class RenderOutputs(NamedTuple):
    rgb_map: Array    # [n_ray, 3]
    disp_map: Array   # [n_ray]
    acc_map: Array    # [n_ray]
    weights: Array    # [n_ray, n_sample]
    depth_map: Array  # [n_ray]


def raw2outputs(raw: Array, z_vals: Array, rays_d: Array,
                raw_noise_std: float = 0.0,
                white_bkgd: bool = False,
                key: jax.Array | None = None) -> RenderOutputs:
    """Alpha-composite raw network outputs into per-ray RGB/depth maps.

    raw: [n_ray, n_sample, 4] (rgb logits + sigma), z_vals: [n_ray, n_sample],
    rays_d: [n_ray, 3]. Mirrors reference `main.py:556-621`.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])  # [n_ray, n_sample, 3]

    sigma = raw[..., 3]
    if raw_noise_std > 0.0:
        assert key is not None, "raw_noise_std > 0 requires a PRNG key"
        sigma = sigma + jax.random.normal(key, sigma.shape) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)  # [n_ray, n_sample]

    # Exclusive cumprod of transmittance.
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1)[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)  # [n_ray, 3]
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)


def sample_pdf(key: jax.Array | None, bins: Array, weights: Array,
               n_samples: int, det: bool = False) -> Array:
    """Inverse-CDF importance sampling of new depths from coarse weights.

    bins: [n_ray, n_bin], weights: [n_ray, n_bin] -> [n_ray, n_samples].
    Fully vectorized, on-device (the reference does this on CPU per chunk,
    `main.py:723-726` / `helpers:283-330`).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    n_bin1 = cdf.shape[-1]  # n_bin + 1

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        assert key is not None, "non-deterministic sample_pdf requires a key"
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples),
                               dtype=cdf.dtype)

    # Gather-free bin lookup. TPU row-wise gathers are ~80 ns/element
    # (take_along_axis on [160k, 128] measured ~260 ms — 4 of them
    # dominated the whole teacher frame); since cdf and bins are sorted,
    # the gathered values equal masked max/min reductions over the
    # compare-all mask, which XLA fuses into cheap VPU sweeps (~30 ms).
    #
    # inds = searchsorted(cdf, u, 'right');  below = inds-1;
    # above = min(inds, n_bin);  bins index = min(·, n_bin-1).
    m = cdf[..., None, :] <= u[..., :, None]          # [R, S, n_bin1]
    # bins index is clamped to len(bins)-1: precompute bins[min(k, L-1)]
    # aligned with cdf indices k = 0..n_bin1-1.
    L = bins.shape[-1]
    if L >= n_bin1:
        bins_map = bins[..., :n_bin1]
    else:
        pad = jnp.repeat(bins[..., -1:], n_bin1 - L, axis=-1)
        bins_map = jnp.concatenate([bins, pad], axis=-1)

    def sel_below(vals):  # vals[below] == max over m of vals (sorted vals)
        big = jnp.asarray(-jnp.inf, vals.dtype)
        return jnp.max(jnp.where(m, vals[..., None, :], big), axis=-1)

    def sel_above(vals):  # vals[above], falling back to vals[-1] if all m
        big = jnp.asarray(jnp.inf, vals.dtype)
        v = jnp.min(jnp.where(m, big, vals[..., None, :]), axis=-1)
        return jnp.where(jnp.isfinite(v), v, vals[..., -1:])

    cdf_g0 = sel_below(cdf)
    cdf_g1 = sel_above(cdf)
    bins_g0 = sel_below(bins_map)
    bins_g1 = sel_above(bins_map)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
