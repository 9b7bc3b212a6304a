"""Rendering engines (pure jnp, jit/pjit-ready).

ONE volumetric renderer shared by teacher training, pseudo-data generation
and evaluation — the reference triplicates this stack across
`main.py:51-756`, `utils/create_data.py:41-544` and helpers (SURVEY.md §1).

TPU design notes:
  * rays are the parallel axis: full frames are flattened to [H*W] rays,
    padded to a static chunk multiple and processed with ``lax.map`` over
    chunks (memory control; the reference's ``chunk``/``netchunk``) — under
    pjit the ray axis is sharded over the mesh 'data' axis instead;
  * the sample axis (compositing ``cumprod``) stays intra-chunk;
  * hierarchical resampling (``sample_pdf``) runs on-device (the reference
    round-trips to CPU per chunk, `main.py:723-726`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .encoding import nerf_embed, r2l_embed
from .models.nerf import NeRFConfig, apply_nerf
from .models.r2l import R2LConfig, apply_r2l
from .sampler import PointSampler, ray_points, stratify_z
from .volume import raw2outputs, sample_pdf

Array = jax.Array


# ---------------------------------------------------------------------------
# R2L (light field) rendering — the north-star FPS path
# ---------------------------------------------------------------------------

def render_r2l_rays(params: dict, cfg: R2LConfig, pts: Array,
                    L: int = 10) -> Array:
    """Flattened sample points [n_ray, n_sample*3] -> RGB [n_ray, 3]."""
    return apply_r2l(params, cfg, r2l_embed(pts, L))


def render_r2l_frame(params: dict, cfg: R2LConfig, sampler: PointSampler,
                     c2w: Array, L: int = 10, plucker: bool = False) -> Array:
    """Full-frame R2L render: c2w [3,4] -> image [H, W, 3].

    Mirrors the reference hot loop `main.py:285-317` (sample_test -> embed ->
    88-layer forward) as one fused jit graph.
    """
    pts = (sampler.sample_test_plucker(c2w) if plucker
           else sampler.sample_test(c2w))
    rgb = render_r2l_rays(params, cfg, pts, L)
    return rgb.reshape(sampler.H, sampler.W, 3)


# ---------------------------------------------------------------------------
# Volumetric (NeRF teacher) rendering
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VolRenderConfig:
    n_coarse: int = 64            # --N_samples
    n_fine: int = 0               # --N_importance
    perturb: bool = True
    lindisp: bool = False
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    use_viewdirs: bool = True
    multires: int = 10            # position PE bands
    multires_views: int = 4       # viewdir PE bands
    near: float = 2.0
    far: float = 6.0
    ray_chunk: int = 32768        # rays per lax.map step for frame renders


class VolOutputs(NamedTuple):
    rgb_map: Array                # [n_ray, 3]  (fine if n_fine > 0)
    disp_map: Array
    acc_map: Array
    depth_map: Array
    rgb0: Array | None            # coarse outputs when hierarchical
    disp0: Array | None
    acc0: Array | None
    z_std: Array | None = None    # per-ray std of the fine z_samples.
    #   Output-field parity with the reference (`main.py:743-750`), which
    #   also computes it into the ret dict and never consumes it further;
    #   dead inside jit (XLA DCEs it) unless a caller reads it.


def _coarse_z(vcfg: VolRenderConfig, n_ray: int,
              key: jax.Array | None) -> Array:
    t = jnp.linspace(0.0, 1.0, vcfg.n_coarse, dtype=jnp.float32)
    if vcfg.lindisp:
        z = 1.0 / (1.0 / vcfg.near * (1.0 - t) + 1.0 / vcfg.far * t)
    else:
        z = vcfg.near * (1.0 - t) + vcfg.far * t
    if key is not None and vcfg.perturb:
        return stratify_z(key, z, (n_ray,))
    return jnp.broadcast_to(z, (n_ray, vcfg.n_coarse))


def _query_nerf(params: dict, ncfg: NeRFConfig, vcfg: VolRenderConfig,
                pts: Array, viewdirs: Array | None) -> Array:
    """pts [n_ray, n_s, 3] (+viewdirs [n_ray, 3]) -> raw [n_ray, n_s, 4]."""
    emb = nerf_embed(pts, vcfg.multires)
    if vcfg.use_viewdirs:
        vemb = nerf_embed(viewdirs, vcfg.multires_views)
        vemb = jnp.broadcast_to(vemb[:, None, :],
                                (*pts.shape[:2], vemb.shape[-1]))
        emb = jnp.concatenate([emb, vemb], axis=-1)
    return apply_nerf(params, ncfg, emb)


def render_rays_nerf(params_coarse: dict, params_fine: dict | None,
                     ncfg: NeRFConfig, vcfg: VolRenderConfig,
                     rays_o: Array, rays_d: Array,
                     key: jax.Array | None = None,
                     ncfg_fine: NeRFConfig | None = None) -> VolOutputs:
    """Core volumetric pass over a flat ray batch [n_ray, 3]x2.

    Mirrors reference `main.py:624-756` with explicit keys and on-device
    hierarchical resampling. ``key=None`` -> deterministic (eval).
    """
    n_ray = rays_o.shape[0]
    viewdirs = None
    if vcfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    k_strat = k_noise = k_pdf = k_noise2 = None
    if key is not None:
        k_strat, k_noise, k_pdf, k_noise2 = jax.random.split(key, 4)

    z_vals = _coarse_z(vcfg, n_ray, k_strat)
    pts = ray_points(rays_o, rays_d, z_vals)
    raw = _query_nerf(params_coarse, ncfg, vcfg, pts, viewdirs)
    out_c = raw2outputs(raw, z_vals, rays_d, vcfg.raw_noise_std,
                        vcfg.white_bkgd, k_noise)

    if vcfg.n_fine <= 0:
        return VolOutputs(out_c.rgb_map, out_c.disp_map, out_c.acc_map,
                          out_c.depth_map, None, None, None)

    # Hierarchical importance resampling on detached coarse weights.
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(k_pdf, z_mid,
                           jax.lax.stop_gradient(out_c.weights[..., 1:-1]),
                           vcfg.n_fine, det=(key is None or not vcfg.perturb))
    z_samples = jax.lax.stop_gradient(z_samples)
    z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)

    pts_f = ray_points(rays_o, rays_d, z_all)
    pf = params_fine if params_fine is not None else params_coarse
    nf = (ncfg_fine if (ncfg_fine is not None and params_fine is not None)
          else ncfg)
    raw_f = _query_nerf(pf, nf, vcfg, pts_f, viewdirs)
    out_f = raw2outputs(raw_f, z_all, rays_d, vcfg.raw_noise_std,
                        vcfg.white_bkgd, k_noise2)

    # Per-ray spread of the importance samples (reference `main.py:749`:
    # torch.std(z_samples, unbiased=False) — population std).
    z_std = jnp.std(z_samples, axis=-1)
    return VolOutputs(out_f.rgb_map, out_f.disp_map, out_f.acc_map,
                      out_f.depth_map, out_c.rgb_map, out_c.disp_map,
                      out_c.acc_map, z_std)


def _pad_to_multiple(x: Array, m: int) -> tuple[Array, int]:
    n = x.shape[0]
    pad = (-n) % m
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], 0)
    return x, n


def render_frame_nerf(params_coarse: dict, params_fine: dict | None,
                      ncfg: NeRFConfig, vcfg: VolRenderConfig,
                      rays_o: Array, rays_d: Array,
                      key: jax.Array | None = None,
                      ncfg_fine: NeRFConfig | None = None) -> dict[str, Array]:
    """Chunked full-frame volumetric render over flat rays [N, 3]x2.

    Returns {'rgb', 'disp', 'acc', 'depth'} each [N, ...]. Memory-bounded by
    ``vcfg.ray_chunk`` via ``lax.map`` (the structural analog of the
    reference's ``batchify_rays``, `main.py:90-104`).
    """
    chunk = min(vcfg.ray_chunk, max(rays_o.shape[0], 1))
    ro, n = _pad_to_multiple(rays_o, chunk)
    rd, _ = _pad_to_multiple(rays_d, chunk)
    n_chunks = ro.shape[0] // chunk
    ro = ro.reshape(n_chunks, chunk, 3)
    rd = rd.reshape(n_chunks, chunk, 3)
    keys = (jax.random.split(key, n_chunks) if key is not None
            else jnp.zeros((n_chunks,)))

    def body(args):
        o, d, k = args
        kk = k if key is not None else None
        out = render_rays_nerf(params_coarse, params_fine, ncfg, vcfg,
                               o, d, kk, ncfg_fine=ncfg_fine)
        return out.rgb_map, out.disp_map, out.acc_map, out.depth_map

    rgb, disp, acc, depth = jax.lax.map(body, (ro, rd, keys))
    return {
        "rgb": rgb.reshape(-1, 3)[:n],
        "disp": disp.reshape(-1)[:n],
        "acc": acc.reshape(-1)[:n],
        "depth": depth.reshape(-1)[:n],
    }


def render_frame_nerf_fused(params_coarse: dict, params_fine: dict | None,
                            ncfg: NeRFConfig, vcfg: VolRenderConfig,
                            rays_o: Array, rays_d: Array,
                            key: jax.Array | None = None,
                            ncfg_fine: NeRFConfig | None = None,
                            tile: int | None = None,
                            int8_calib: tuple | None = None,
                            fold_requant: bool = False
                            ) -> dict[str, Array]:
    """Fully-fused volumetric frame render (TPU fast path, forward-only).

    Same contract as ``render_frame_nerf`` but each pass (coarse, fine)
    runs as ONE transposed-layout Pallas kernel per ray chunk — sampling,
    positional encoding, MLP and compositing all in VMEM, rays in lanes
    (see kernels/nerf_render_pallas.py; measured 316.9 ms bf16 / 221.9 ms
    int8 (tile 4096) vs the XLA schedule's 866 ms per canonical 400^2 teacher frame
    on v5e, exp/probe_teacher_int8.jsonl). Requires ``raw_noise_std ==
    0`` (the sigma-noise train
    regularizer needs the XLA path); stratified z perturbation IS
    supported (z_vals are built in XLA and passed in).

    ``int8_calib = (pts [n, 3], viewdirs [n, 3] | None)`` switches both
    passes to static-scale int8, calibrating per-(layer, channel)
    activation scales on the given sample points — the same recipe as
    the R2L student's int8 fast path.
    """
    assert vcfg.raw_noise_std == 0.0, \
        "fused render path is noise-free; use render_frame_nerf"
    from .kernels.nerf_render_pallas import (fused_nerf_render_t,
                                             prepare_fused_nerf_t)
    from .volume import sample_pdf

    nf_cfg = (ncfg_fine if (ncfg_fine is not None
                            and params_fine is not None) else ncfg)
    int8 = int8_calib is not None
    fold = bool(fold_requant and int8)
    fpc = prepare_fused_nerf_t(params_coarse, ncfg, vcfg.multires,
                               vcfg.multires_views, calib=int8_calib,
                               weight_dtype=ncfg.compute_dtype,
                               fold_requant=fold)
    fpf = (prepare_fused_nerf_t(params_fine, nf_cfg, vcfg.multires,
                                vcfg.multires_views, calib=int8_calib,
                                weight_dtype=nf_cfg.compute_dtype,
                                fold_requant=fold)
           if params_fine else fpc)

    # Tile / samples-per-step defaults from the r4 sweep
    # (exp/probe_teacher_decomp.jsonl r4_* rows): int8 is VPU-bound on
    # the requant epilogue, so 8 interleaved chains at tile 1024 overlap
    # it under the MXU (182.5 vs 199.4 ms/frame, bit-identical); bf16 is
    # MXU-bound and keeps the single-chain tile-4096 layout (315.6 ms —
    # every multi-chain bf16 variant measured slower).
    if tile is None:
        tile = 1024 if int8 else 4096
    pairs = 8 if int8 else 1

    def run_kernel(fp, cfg_, o, d, z, *, L_pts, L_views, white_bkgd,
                   tile):
        p = pairs
        while z.shape[1] % p:   # degrade to the largest P dividing S
            p //= 2
        return fused_nerf_render_t(fp, cfg_, o, d, z, L_pts=L_pts,
                                   L_views=L_views, white_bkgd=white_bkgd,
                                   tile=tile, int8=int8,
                                   fold_requant=fold, sample_pairs=p)

    chunk = min(vcfg.ray_chunk, max(rays_o.shape[0], 1))
    ro, n = _pad_to_multiple(rays_o, chunk)
    rd, _ = _pad_to_multiple(rays_d, chunk)
    n_chunks = ro.shape[0] // chunk
    ro = ro.reshape(n_chunks, chunk, 3)
    rd = rd.reshape(n_chunks, chunk, 3)
    keys = (jax.random.split(key, n_chunks) if key is not None
            else jnp.zeros((n_chunks,)))

    def body(args):
        o, d, k = args
        kk = k if key is not None else None
        k_strat = k_pdf = None
        if kk is not None:
            k_strat, k_pdf = jax.random.split(kk)
        z = _coarse_z(vcfg, chunk, k_strat)
        rgb, acc, depth, w = run_kernel(
            fpc, ncfg, o, d, z, L_pts=vcfg.multires,
            L_views=vcfg.multires_views, white_bkgd=vcfg.white_bkgd,
            tile=min(tile, chunk))
        if vcfg.n_fine > 0:
            z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
            z_samp = sample_pdf(k_pdf, z_mid, w[:, 1:-1], vcfg.n_fine,
                                det=(key is None or not vcfg.perturb))
            z_all = jnp.sort(jnp.concatenate([z, z_samp], axis=-1),
                             axis=-1)
            rgb, acc, depth, _ = run_kernel(
                fpf, nf_cfg, o, d, z_all, L_pts=vcfg.multires,
                L_views=vcfg.multires_views, white_bkgd=vcfg.white_bkgd,
                tile=min(tile, chunk))
        # Same formula as volume.raw2outputs (and the torch reference):
        # acc == 0 yields NaN on BOTH paths rather than diverging
        # (a fused-vs-XLA parity comparison must agree on empty rays).
        disp = 1.0 / jnp.maximum(1e-10, depth / acc)
        return rgb, disp, acc, depth

    rgb, disp, acc, depth = jax.lax.map(body, (ro, rd, keys))
    return {
        "rgb": rgb.reshape(-1, 3)[:n],
        "disp": disp.reshape(-1)[:n],
        "acc": acc.reshape(-1)[:n],
        "depth": depth.reshape(-1)[:n],
    }
