"""Evaluation / video rendering engine (the reference's ``render_path``).

Renders a pose list with either the R2L student (optionally through the
fused Pallas kernel) or the volumetric NeRF teacher, computes
PSNR / PSNR-v2 (average-MSE PSNR) / SSIM / LPIPS / FLIP, and optionally
writes per-frame images, error maps, and a video — mirroring reference
`main.py:189-398` with a jit-compiled device pipeline and host-side IO only
at the edges.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import metrics as M
from .flip import flip as flip_metric
from .models.r2l import R2LConfig, apply_r2l
from .encoding import r2l_embed
from .render import VolRenderConfig, render_frame_nerf
from .sampler import PointSampler

Array = jax.Array


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


@dataclasses.dataclass
class EvalResult:
    frames: np.ndarray               # [N, H, W, 3] float32
    test_psnr: float | None = None
    test_psnr_v2: float | None = None
    test_ssim: float | None = None
    test_lpips: float | None = None
    test_flip: float | None = None
    per_frame_psnr: list[float] = dataclasses.field(default_factory=list)
    ms_per_frame: float | None = None
    disp_frames: np.ndarray | None = None  # [N, H, W] when frame_fn
    #                                        returns (rgb, disp)


import functools


def _r2l_net_fn(cfg: R2LConfig, embed_L: int, pallas_tile: int, kind: str,
                dim_pts: int) -> Callable:
    """The per-ray-batch forward for a prepared ``kind``: (prepared
    params, pts [n, dim_pts*n_sample or 6]) -> rgb [n, >=3]. Shared by
    the pose-driven frame path and the DONeRF given-rays path so every
    entry point uses the same fast kernels."""
    def net(p, pts):
        if kind == "int8":
            # fold_requant + nobf16_inner: the round-3 epilogue winner —
            # 9.73 ms/frame vs 10.3 baseline at 400^2 on v5e
            # (exp/probe_epi2.jsonl; calibration packs the folded scales)
            from .kernels.r2l_pallas import fused_r2l_apply_int8_pe
            return fused_r2l_apply_int8_pe(p, cfg, pts, dim_pts, embed_L,
                                           tile=pallas_tile,
                                           fold_requant=True,
                                           nobf16_inner=True)
        elif kind == "pe":
            from .kernels.r2l_pallas import fused_r2l_apply_pe
            return fused_r2l_apply_pe(p, cfg, pts, dim_pts, embed_L,
                                      tile=pallas_tile)
        return apply_r2l(p, cfg, r2l_embed(pts, embed_L))

    return net


@functools.lru_cache(maxsize=64)
def _r2l_frame_jit(cfg: R2LConfig, sampler: PointSampler, embed_L: int,
                   plucker: bool, pallas_tile: int, kind: str,
                   dim_pts: int, mesh=None) -> Callable:
    """Jitted (prepared_params, c2w) -> [H, W, 3], cached on the static
    config so periodic in-training evals re-use ONE compilation (params
    are a runtime argument, not a baked-in constant — a fresh jit per
    eval would recompile 30-90 s each through this image's TPU tunnel).

    ``mesh``: shard the frame's RAY axis over the mesh 'data' axis —
    each device renders a ray tile (SURVEY.md §2.8's TPU-native
    inference scaling; the reference renders on one GPU). The plain-XLA
    path shards via a GSPMD constraint; the Pallas kinds run the fused
    kernel per device shard under ``shard_map`` (params replicated).
    """
    n_dev = 1 if mesh is None else int(dict(mesh.shape).get("data", 1))
    net = _r2l_net_fn(cfg, embed_L, pallas_tile, kind, dim_pts)

    def frame(p, c2w):
        pts = (sampler.sample_test_plucker(c2w) if plucker
               else sampler.sample_test(c2w))
        if mesh is None or n_dev <= 1:
            rgb = net(p, pts)
        else:
            rgb = _shard_rays(mesh, kind == "jnp", net, consts=(p,),
                              arrays=(pts,), pads=(0.0,))
        # learn_depth models emit 4 channels; frames keep RGB
        # (reference `main.py:227-231`).
        return rgb[:, :3].reshape(sampler.H, sampler.W, 3)

    return jax.jit(frame)


@functools.lru_cache(maxsize=64)
def _r2l_givenrays_jit(cfg: R2LConfig, sampler: PointSampler, embed_L: int,
                       plucker: bool, pallas_tile: int, kind: str,
                       dim_pts: int, H: int, W: int, mesh=None) -> Callable:
    """Jitted (prepared_params, rays_o [H*W,3], rays_d [H*W,3]) ->
    [H, W, 3] for the DONeRF precomputed-ray path (reference
    `main.py:207-270`) — the same prepared kinds / mesh sharding as
    ``_r2l_frame_jit``, with the points sampled from the given rays
    instead of a camera pose."""
    from .rays import plucker as plucker_fn
    n_dev = 1 if mesh is None else int(dict(mesh.shape).get("data", 1))
    net = _r2l_net_fn(cfg, embed_L, pallas_tile, kind, dim_pts)

    def frame(p, ro, rd):
        pts = (plucker_fn(ro, rd) if plucker
               else sampler.sample_train(ro, rd))
        if mesh is None or n_dev <= 1:
            rgb = net(p, pts)
        else:
            rgb = _shard_rays(mesh, kind == "jnp", net, consts=(p,),
                              arrays=(pts,), pads=(0.0,))
        return rgb[:, :3].reshape(H, W, 3)

    return jax.jit(frame)


def _shard_rays(mesh, gspmd: bool, fn, consts: tuple, arrays: tuple,
                pads: tuple):
    """Run ``fn(*consts, *arrays)`` with the leading RAY axis of every
    array in ``arrays`` sharded over the mesh 'data' axis (the shared
    pad -> shard -> slice-back pattern of the frame renderers).

    Pads rays to a device-count multiple (``pads`` gives each array's
    fill value — e.g. 1.0 for direction vectors so padded rays stay
    normalizable), then dispatches either via a GSPMD sharding
    constraint (``gspmd=True`` — XLA partitions the math; params
    replicated) or via ``shard_map`` (Pallas kernels run per device on
    their local shard). Outputs (an array or tuple of arrays, all with
    a leading ray axis) are sliced back to the true ray count.
    """
    from jax.sharding import NamedSharding, PartitionSpec
    n_dev = int(dict(mesh.shape).get("data", 1))
    n = arrays[0].shape[0]
    n_pad = -(-n // n_dev) * n_dev
    if n_pad != n:
        arrays = tuple(
            jnp.concatenate([a, jnp.full((n_pad - n,) + a.shape[1:],
                                         v, a.dtype)])
            for a, v in zip(arrays, pads))
    if gspmd:
        shd = NamedSharding(mesh, PartitionSpec("data"))
        arrays = tuple(jax.lax.with_sharding_constraint(a, shd)
                       for a in arrays)
        out = fn(*consts, *arrays)
    else:
        from jax import shard_map
        P_ = PartitionSpec
        out_struct = jax.eval_shape(fn, *consts, *arrays)
        out = shard_map(
            fn, mesh=mesh,
            in_specs=tuple(P_() for _ in consts)
            + tuple(P_("data") for _ in arrays),
            out_specs=jax.tree.map(lambda _: P_("data"), out_struct),
            check_vma=False)(*consts, *arrays)
    return jax.tree.map(lambda a: a[:n], out)


# Scoped VMEM is a hard 16 MiB; the estimate below doesn't model
# Mosaic's stack/scratch (~1.3 MiB measured at canonical size: demand
# 16.20 MiB at tile 640 vs the 15.77 modeled), so budget 14 MiB. At
# canonical bf16 this lands on tile 384 — one notch below the r2-
# measured-working tile 512 (68.5 FPS), whose modeled demand + the
# 1.3 MiB overhead sits within 0.1 MiB of the hard limit; the margin
# buys Mosaic-version headroom at a few extra grid steps on the
# non-headline bf16 path (int8 is the deployed fast path).
_VMEM_BUDGET = 14 << 20


def _pe_kernel_tile_fit(cfg: R2LConfig, dim_pts: int, requested: int,
                        quantized: bool = False) -> int:
    """VMEM-fitting ray tile for the PE-fused kernels, or 0 when the
    WEIGHTS alone cannot fit (canonical f32 is 22.6 MB > the 16 MB
    scoped limit — found by a canonical-scale soak: the default
    --pallas_tile 800 with bf16 canonical weights demanded 17.09 MB and
    Mosaic stack-OOMed at the end-of-training eval).

    ``quantized``: the int8 kernel (``fused_r2l_apply_int8_pe``) — 1-byte
    weights plus the f32 dequant/requant scale rows (m/b/inv per layer).
    Canonical int8 demands ~12 MiB at tile 1024 (PERF.md: ~4 MB
    headroom), so canonical passes unclamped; a wider model (e.g. W512:
    22.5 MB of int8 body weights) returns 0 here instead of stack-OOMing
    at the first eval."""
    W, in_pad = cfg.netwidth, -(-cfg.input_dim // 128) * 128
    nl = cfg.num_blocks * cfg.n_learnable
    if quantized:
        wsize = 1
        scale_rows = (in_pad + 2 * W + 3 * nl * W + W + 2 * 128) * 4
    else:
        wsize = 2 if cfg.compute_dtype == jnp.bfloat16 else 4
        scale_rows = 0
    wbytes = (in_pad * W + nl * W * W + W * 128) * wsize \
        + (W * (nl + 1) + 128) * 4 + scale_rows        # f32 biases
    # per-ray activation bytes: xq [in_pad] wsize, double-buffered input
    # [dim_pts] f32 + output [128] f32, h + matmul acc [W] f32 each
    per_ray = in_pad * wsize + dim_pts * 4 * 2 + 128 * 4 * 2 + W * 4 * 2
    fit = (_VMEM_BUDGET - wbytes) // per_ray
    if fit < 128:
        return 0
    return min(requested, int(fit) // 128 * 128)


def _prepare_r2l(params: dict, cfg: R2LConfig, sampler: PointSampler,
                 embed_L: int, plucker: bool, use_pallas: bool,
                 quantize: str, calib_poses=None, pallas_tile: int = 512,
                 calib_pts=None):
    """Pick the fastest supported path and pack params for it.
    Returns (prepared_params, kind, dim_pts, tile).

    ``calib_poses`` [M, 3/4, 4]: camera poses spanning the DEPLOYMENT
    distribution, used to calibrate the int8 activation scales (the app
    passes the scene's own poses). Without them the fallback assumes
    blender-convention radius-4 spherical cameras — wrong for scenes
    with other camera layouts, hence the warning.

    ``calib_pts`` [M, dim_pts*n_sample]: precomputed calibration sample
    points; wins over ``calib_poses`` (the given-rays path calibrates on
    a subsample of its actual deployment rays).
    """
    from .kernels.r2l_pallas import fused_kernel_supported
    if not fused_kernel_supported(cfg):
        # Non-canonical activations/arch: the fused kernels hardcode
        # relu/relu/none resmlp — render through apply_r2l instead.
        use_pallas = False
        quantize = ""
    dim_pts = 6 if plucker else cfg.input_dim // (2 * embed_L + 1)
    if quantize == "int8" and plucker:
        import sys
        print("WARNING: --quantize int8 is not implemented for Plücker "
              "inputs (the static-scale calibration assumes the sampled-"
              "points PE layout) — falling back to "
              + ("the bf16 PE-fused kernel." if use_pallas
                 else "the plain XLA forward."), file=sys.stderr)
    if quantize == "int8" and not use_pallas:
        # int8 IS a Pallas kernel: an explicit --use_pallas 0 opt-out
        # (e.g. debugging a kernel issue) must win over --quantize.
        import sys
        print("WARNING: --quantize int8 requires the Pallas kernel; "
              "--use_pallas 0 was given — rendering with the plain XLA "
              "forward instead.", file=sys.stderr)
        quantize = ""
    if quantize == "int8" and not plucker:
        tile8 = _pe_kernel_tile_fit(cfg, dim_pts, pallas_tile,
                                    quantized=True)
        if tile8 == 0:
            # even 1-byte weights exceed scoped VMEM (wider-than-
            # canonical models): fall through to the bf16/f32 PE branch,
            # which runs its own fit check (and may itself fall back).
            import sys
            print("WARNING: model weights do not fit the int8 fused "
                  "kernel's VMEM budget — trying the "
                  + ("PE-fused kernel." if use_pallas
                     else "plain XLA forward."), file=sys.stderr)
            quantize = ""
    if quantize == "int8" and not plucker:
        if tile8 < pallas_tile:
            import sys
            print(f"NOTE: --pallas_tile {pallas_tile} exceeds the int8 "
                  f"fused kernel's VMEM budget at this model size — "
                  f"using tile {tile8}.", file=sys.stderr)
        # Static-scale int8 (v5e 394 TOPS MXU rate): calibrate per-layer
        # per-channel activation ranges on sample_test rays from several
        # poses (single-pose scales do not generalize — the identity-PE
        # coordinate ranges rotate with the camera).
        from .kernels.r2l_pallas import calibrate_r2l_int8_pe
        sub = PointSampler(H=max(sampler.H // 8, 4),
                           W=max(sampler.W // 8, 4),
                           focal=sampler.focal / 8.0,
                           n_sample=sampler.n_sample,
                           near=sampler.near, far=sampler.far)
        if calib_pts is not None:
            poses = []
        elif calib_poses is not None and len(calib_poses) > 0:
            arr = np.asarray(calib_poses)
            pick = np.linspace(0, len(arr) - 1,
                               min(len(arr), 8)).astype(int)
            poses = [arr[i][:3, :4] for i in pick]
        else:
            import sys
            from .rays import pose_spherical
            print("WARNING: int8 calibration falling back to blender-"
                  "convention radius-4 spherical cameras (no calib_poses "
                  "given) — pass the scene's poses for other layouts.",
                  file=sys.stderr)
            poses = [pose_spherical(t, p, 4.0)[:3, :4]
                     for t in (0.0, 90.0, 180.0, 270.0)
                     for p in (-10.0, -70.0)]
        calib = (jnp.asarray(calib_pts) if calib_pts is not None
                 else jnp.concatenate([
                     sub.sample_test(jnp.asarray(np.asarray(p)))
                     for p in poses]))
        prepared = calibrate_r2l_int8_pe(params, cfg, dim_pts, embed_L,
                                         calib_pts=calib,
                                         fold_requant=True)
        return prepared, "int8", dim_pts, tile8
    if use_pallas:
        # PE fused into the kernel (freq-major layout): the positional
        # encoding runs on the VPU overlapped with the matmul chain and
        # the [n_ray, input_dim] embedded activations never touch HBM
        # (~2 ms/frame over the embed-outside kernel on v5e).
        tile = _pe_kernel_tile_fit(cfg, dim_pts, pallas_tile)
        if tile == 0:
            # weights alone exceed scoped VMEM (e.g. canonical f32,
            # 22.6 MB): the fused kernel cannot run at any tile
            import sys
            print("WARNING: model weights do not fit the fused kernel's "
                  "VMEM budget in "
                  f"{'bf16' if cfg.compute_dtype == jnp.bfloat16 else 'f32'}"
                  " — rendering through the plain XLA forward (use "
                  "--quantize int8 or --compute_dtype bfloat16 for the "
                  "fast path).", file=sys.stderr)
            return params, "jnp", dim_pts, pallas_tile
        if tile < pallas_tile:
            import sys
            print(f"NOTE: --pallas_tile {pallas_tile} exceeds the fused "
                  f"bf16 kernel's VMEM budget at this model size — "
                  f"using tile {tile}.", file=sys.stderr)
        from .kernels.r2l_pallas import prepare_fused_params_pe
        wd = (jnp.bfloat16 if cfg.compute_dtype == jnp.bfloat16
              else jnp.float32)
        prepared = prepare_fused_params_pe(params, cfg, dim_pts, embed_L,
                                           weight_dtype=wd)
        return prepared, "pe", dim_pts, tile
    return params, "jnp", dim_pts, pallas_tile


def make_r2l_frame_fn(params: dict, cfg: R2LConfig, sampler: PointSampler,
                      embed_L: int = 10, plucker: bool = False,
                      use_pallas: bool = True,
                      pallas_tile: int = 512,
                      quantize: str = "",
                      calib_poses=None,
                      mesh=None) -> Callable[[Array], Array]:
    """Build the jitted c2w -> [H, W, 3] frame renderer (fast path).
    ``mesh`` shards the frame's rays over the mesh 'data' axis (each
    device renders a ray tile; Pallas kinds via shard_map)."""
    prepared, kind, dim_pts, tile = _prepare_r2l(
        params, cfg, sampler, embed_L, plucker, use_pallas, quantize,
        calib_poses=calib_poses, pallas_tile=pallas_tile)
    jit_fn = _r2l_frame_jit(cfg, sampler, embed_L, plucker, tile,
                            kind, dim_pts, mesh=mesh)
    return lambda c2w: jit_fn(prepared, c2w)


def _givenrays_calib_pts(sampler: PointSampler, plucker: bool,
                         quantize: str, calib_rays):
    """int8 calibration points from a linspace subsample of the actual
    deployment rays (better than the synthetic spherical fallback), or
    None when the path doesn't calibrate."""
    if quantize != "int8" or plucker or calib_rays is None:
        return None
    ro, rd = (np.asarray(calib_rays[0], np.float32).reshape(-1, 3),
              np.asarray(calib_rays[1], np.float32).reshape(-1, 3))
    pick = np.linspace(0, ro.shape[0] - 1,
                       min(ro.shape[0], 16384)).astype(int)
    return sampler.sample_train(jnp.asarray(ro[pick]),
                                jnp.asarray(rd[pick]))


def make_r2l_givenrays_frame_fn(params: dict, cfg: R2LConfig,
                                sampler: PointSampler, H: int, W: int,
                                embed_L: int = 10, plucker: bool = False,
                                use_pallas: bool = True,
                                pallas_tile: int = 512,
                                quantize: str = "",
                                calib_rays=None,
                                mesh=None) -> Callable:
    """Build the jitted (rays_o [H*W,3], rays_d [H*W,3]) -> [H, W, 3]
    renderer for the DONeRF given-rays path, through the SAME fast paths
    as ``make_r2l_frame_fn`` (Pallas PE-fused / int8 kernels, mesh ray
    sharding) — reference `main.py:207-270` runs this branch on the
    plain forward; here it gets the production machinery.

    ``calib_rays``: (rays_o, rays_d) arrays spanning the deployment
    rays; int8 activation scales are calibrated on a subsample of them
    (the actual distribution — better than synthetic spherical poses).

    The returned fn carries ``.kind`` (path introspection) and
    ``.parts`` — pass the latter to ``make_r2l_givenrays_bench_fn`` to
    reuse the prepared/calibrated params instead of re-calibrating.
    """
    calib_pts = _givenrays_calib_pts(sampler, plucker, quantize,
                                     calib_rays)
    prepared, kind, dim_pts, tile = _prepare_r2l(
        params, cfg, sampler, embed_L, plucker, use_pallas, quantize,
        pallas_tile=pallas_tile, calib_pts=calib_pts)
    jit_fn = _r2l_givenrays_jit(cfg, sampler, embed_L, plucker, tile,
                                kind, dim_pts, H, W, mesh=mesh)
    fn = lambda ro, rd: jit_fn(prepared, ro, rd)  # noqa: E731
    fn.kind = kind  # introspection for tests / the app's path log line
    fn.parts = (prepared, kind, dim_pts, tile)
    return fn


def make_r2l_givenrays_bench_fn(params: dict, cfg: R2LConfig,
                                sampler: PointSampler, H: int, W: int,
                                embed_L: int = 10, plucker: bool = False,
                                use_pallas: bool = True,
                                pallas_tile: int = 512, quantize: str = "",
                                calib_rays=None, mesh=None,
                                parts=None) -> Callable:
    """(rays_o [K,H*W,3], rays_d [K,H*W,3]) -> scalar checksum, K frames
    per jit — the honest-latency protocol (see ``make_r2l_bench_fn``)
    for the given-rays path. Pass ``parts`` (a frame fn's ``.parts``)
    to reuse already-prepared params — int8 calibration is a multi-
    dispatch forward over 16k rays, not worth running twice."""
    if parts is None:
        calib_pts = _givenrays_calib_pts(sampler, plucker, quantize,
                                         calib_rays)
        parts = _prepare_r2l(
            params, cfg, sampler, embed_L, plucker, use_pallas, quantize,
            pallas_tile=pallas_tile, calib_pts=calib_pts)
    prepared, kind, dim_pts, tile = parts
    frame = _r2l_givenrays_jit(cfg, sampler, embed_L, plucker, tile,
                               kind, dim_pts, H, W, mesh=mesh)

    @jax.jit
    def render_k(p, ros, rds):
        return jnp.sum(jax.lax.map(
            lambda ray: jnp.sum(frame(p, ray[0], ray[1])),
            jnp.stack([ros, rds], axis=1)))

    return lambda ros, rds: render_k(prepared, ros, rds)


def make_r2l_bench_fn(params: dict, cfg: R2LConfig, sampler: PointSampler,
                      embed_L: int = 10, plucker: bool = False,
                      use_pallas: bool = True, pallas_tile: int = 512,
                      quantize: str = "",
                      calib_poses=None, mesh=None) -> Callable[[Array], Array]:
    """Jitted poses [K, 3, 4] -> scalar checksum, rendering the K frames
    sequentially INSIDE one jit (``lax.map``).

    This is the only honest latency protocol on this image: per-call
    dispatch costs ~30 ms tunnel RTT and ``block_until_ready`` may return
    before execution (CLAUDE.md), so per-frame host timing measures the
    tunnel, not the device. The reference's --benchmark
    (`main.py:1124-1133`) uses torch.utils.benchmark on a local GPU where
    per-call sync timing is fine.
    """
    prepared, kind, dim_pts, tile = _prepare_r2l(
        params, cfg, sampler, embed_L, plucker, use_pallas, quantize,
        calib_poses=calib_poses, pallas_tile=pallas_tile)
    frame = _r2l_frame_jit(cfg, sampler, embed_L, plucker, tile,
                           kind, dim_pts, mesh=mesh)

    @jax.jit
    def render_k(p, poses):
        return jnp.sum(jax.lax.map(lambda c2w: jnp.sum(frame(p, c2w)),
                                   poses))

    return lambda poses: render_k(prepared, poses)


def make_nerf_bench_fn(params_coarse: dict, params_fine: dict | None,
                       ncfg, vcfg: VolRenderConfig, sampler: PointSampler,
                       ndc_params: tuple | None = None,
                       use_pallas: bool = False, ncfg_fine=None,
                       perturb_test: bool = False,
                       mesh=None) -> Callable:
    """Teacher analog of ``make_r2l_bench_fn``: poses [K, 3, 4] -> scalar
    checksum with the K volumetric frames rendered inside ONE jit
    (``--benchmark --model_name nerf``, reference `main.py:401-404,
    1124-1133` — its render_func benchmarks whichever model was built)."""
    vcfg_t = dataclasses.replace(vcfg, perturb=perturb_test,
                                 raw_noise_std=0.0)
    fused = bool(use_pallas and jax.default_backend() == "tpu"
                 and vcfg.multires > 0)
    frame = _nerf_frame_jit(ncfg, ncfg_fine, vcfg_t, sampler, ndc_params,
                            perturb_test, fused, mesh=mesh)
    pf = params_fine if params_fine else None

    @jax.jit
    def render_k(pc, pfin, poses):
        return jnp.sum(jax.lax.map(
            lambda c2w: jnp.sum(frame(pc, pfin, c2w)), poses))

    return lambda poses: render_k(params_coarse, pf, poses)


def make_nerf_frame_fn(params_coarse: dict, params_fine: dict | None,
                       ncfg, vcfg: VolRenderConfig, sampler: PointSampler,
                       ndc_params: tuple | None = None,
                       use_pallas: bool = False,
                       ncfg_fine=None,
                       perturb_test: bool = False,
                       with_disp: bool = False, mesh=None) -> Callable:
    """c2w -> [H, W, 3] via the volumetric teacher. ``ndc_params`` is
    (H, W, focal) to enable the LLFF NDC warp. On TPU the MLP query runs
    through the fused Pallas kernel.

    ``perturb_test`` enables stratified z jitter at eval time with the
    σ-noise regularizer off, matching the reference's render_kwargs_test
    (`main.py:528-536`: perturb = args.perturb_test, raw_noise_std = 0);
    the jitter key is derived from the pose so eval stays deterministic
    per pose under jit.

    ``with_disp=True`` makes the fn return ``(rgb [H,W,3], disp [H,W])``
    — the pair the reference's i_video writer consumes for the NeRF
    disparity video (`main.py:1483-1497`).
    """
    vcfg_t = dataclasses.replace(vcfg, perturb=perturb_test,
                                 raw_noise_std=0.0)
    fused = bool(use_pallas and jax.default_backend() == "tpu"
                 and vcfg.multires > 0)
    jit_fn = _nerf_frame_jit(ncfg, ncfg_fine, vcfg_t, sampler, ndc_params,
                             perturb_test, fused, with_disp, mesh=mesh)
    pf = params_fine if params_fine else None
    return lambda c2w: jit_fn(params_coarse, pf, c2w)


@functools.lru_cache(maxsize=64)
def _nerf_frame_jit(ncfg, ncfg_fine, vcfg_t: VolRenderConfig,
                    sampler: PointSampler, ndc_params, perturb_test: bool,
                    fused: bool, with_disp: bool = False,
                    mesh=None) -> Callable:
    """Jitted (params_coarse, params_fine, c2w) -> [H, W, 3], cached on
    static config (see ``_r2l_frame_jit``). ``fused`` routes through the
    fully-fused Pallas volumetric pass (eval is noise-free, so it always
    qualifies).

    ``mesh`` shards the frame's ray axis over the mesh 'data' axis (the
    volumetric pass is per-ray: sampling, MLP, compositing, sample_pdf
    all local). XLA path via GSPMD constraint — bit-identical to
    unsharded; fused path via shard_map (with ``perturb_test`` the
    per-shard stratified draw differs from the single-device draw in
    WHICH jitter each ray gets — same distribution, eval stays
    deterministic per pose).
    """
    from .rays import ndc_rays
    from .render import render_frame_nerf_fused
    n_dev = 1 if mesh is None else int(dict(mesh.shape).get("data", 1))

    def frame(pc, pf, c2w):
        rays_o, rays_d = sampler.frame_rays(c2w)
        if ndc_params is not None:
            h, w, f = ndc_params
            rays_o, rays_d = ndc_rays(h, w, f, 1.0, rays_o, rays_d)
        key = None
        if perturb_test:
            bits = jax.lax.bitcast_convert_type(c2w.reshape(-1),
                                                jnp.int32)
            key = jax.random.fold_in(jax.random.key(0),
                                     jnp.sum(bits).astype(jnp.uint32))
        render = render_frame_nerf_fused if fused else render_frame_nerf

        def run(pc_, pf_, ro, rd):
            out = render(pc_, pf_, ncfg, vcfg_t, ro, rd, key=key,
                         ncfg_fine=ncfg_fine)
            return out["rgb"], out["disp"]

        if mesh is None or n_dev <= 1:
            rgb, disp = run(pc, pf, rays_o, rays_d)
        else:
            # pads: 1.0 for directions so padded rays stay normalizable
            rgb, disp = _shard_rays(mesh, not fused, run,
                                    consts=(pc, pf),
                                    arrays=(rays_o, rays_d),
                                    pads=(0.0, 1.0))
        rgb = rgb.reshape(sampler.H, sampler.W, 3)
        if with_disp:
            return rgb, disp.reshape(sampler.H, sampler.W)
        return rgb

    return jax.jit(frame)


def render_path(frame_fn: Callable[[Array], Array],
                poses: Sequence[np.ndarray],
                gt_images: np.ndarray | None = None,
                savedir: str | None = None,
                lpips_params: dict | None = None,
                compute_flip: bool = True,
                lpips_rescale: str = "standard",
                flip_rescale: str = "standard",
                logger=None) -> EvalResult:
    """Render every pose; compute metrics vs ``gt_images`` when given.

    Mirrors reference `main.py:189-398`: per-frame PSNR/SSIM + error image
    dumps, batched LPIPS/FLIP at the end, and both PSNR conventions
    (reference `main.py:389-390`: test_psnr = PSNR of the mean MSE,
    test_psnr_v2 = mean of per-frame PSNRs — best checkpoints track v2).

    NOTE: ``ms_per_frame`` here times per-call dispatch and is UNRELIABLE
    on this image's tunneled TPU (~30 ms RTT per call, enqueue-only
    block_until_ready) — use ``--benchmark`` / ``make_r2l_bench_fn`` (K
    frames per jit, checksum readback) for honest latency numbers.
    """
    frames, disps, mses, psnrs, ssims = [], [], [], [], []
    t_total, n_timed, t_first = 0.0, 0, 0.0
    for i, c2w in enumerate(poses):
        t0 = time.perf_counter()
        if isinstance(c2w, tuple):
            # generalized per-frame input (the given-rays path feeds
            # (rays_o, rays_d) tuples instead of camera poses)
            img = frame_fn(*(jnp.asarray(np.asarray(x)) for x in c2w))
        else:
            img = frame_fn(jnp.asarray(np.asarray(c2w)[:3, :4]))
        if isinstance(img, tuple):  # (rgb, disp) — teacher with_disp path
            img, disp = img
            disps.append(np.asarray(disp, dtype=np.float32))
        img.block_until_ready()
        if i > 0:  # skip compile
            t_total += time.perf_counter() - t0
            n_timed += 1
        else:
            t_first = time.perf_counter() - t0
        img_np = np.asarray(img, dtype=np.float32)
        frames.append(img_np)

        if gt_images is not None:
            # One jitted dispatch + one readback per frame (the eager
            # mse/psnr/ssim chain was ~10 dispatches through the ~30 ms
            # tunnel, round-3 verdict Weak #2 / Next #3).
            m = jax.device_get(M.frame_metrics(img, jnp.asarray(gt_images[i])))
            mses.append(float(m["mse"]))
            psnrs.append(float(m["psnr"]))
            ssims.append(float(m["ssim"]))
            if savedir is not None:
                import imageio.v2 as imageio
                imageio.imwrite(os.path.join(savedir, f"{i:03d}_err.png"),
                                to8b(np.abs(img_np - gt_images[i])))
                # reference saves the gt frame next to the render
                # (`main.py:339-340`)
                imageio.imwrite(os.path.join(savedir, f"{i:03d}_gt.png"),
                                to8b(np.asarray(gt_images[i], np.float32)))
        if savedir is not None:
            import imageio.v2 as imageio
            imageio.imwrite(os.path.join(savedir, f"{i:03d}.png"),
                            to8b(img_np))
        if logger is not None:
            msg = f"frame {i}/{len(poses)}"
            if psnrs:
                msg += f" psnr {psnrs[-1]:.4f}"
            logger.print(msg)

    result = EvalResult(frames=np.stack(frames))
    if disps:
        result.disp_frames = np.stack(disps)
    if n_timed:
        result.ms_per_frame = 1000.0 * t_total / n_timed
    elif frames:
        # single-pose render: fall back to the compile-inclusive first
        # frame so callers formatting ms_per_frame never see None
        result.ms_per_frame = 1000.0 * t_first

    if gt_images is not None and mses:
        result.per_frame_psnr = psnrs
        result.test_psnr = float(M.mse2psnr(jnp.asarray(np.mean(mses))))
        result.test_psnr_v2 = float(np.mean(psnrs))
        result.test_ssim = float(np.mean(ssims))
        if compute_flip:
            if flip_rescale == "minmax":
                # Reference convention (`main.py:361-377`): the SAME
                # min-max rescale of both stacks to [-1,1] that feeds
                # LPIPS also precedes compute_flip there. Its FLIP clamps
                # sRGB inputs to [0,1] internally (flip_loss.py:306-307),
                # so pre-clipping the rescaled values reproduces the
                # reference numbers exactly. Spec-correct FLIP (sRGB in
                # [0,1]) is the 'standard' default.
                from .lpips_jax import minmax_rescale
                gts = jnp.clip(minmax_rescale(jnp.asarray(
                    np.asarray(gt_images, np.float32))), 0.0, 1.0)
                recs = jnp.clip(minmax_rescale(jnp.asarray(
                    np.stack(frames))), 0.0, 1.0)
                vals = [float(flip_metric(gts[i], recs[i]))
                        for i in range(len(frames))]
            else:
                vals = [float(flip_metric(jnp.asarray(gt_images[i]),
                                          jnp.asarray(frames[i])))
                        for i in range(len(frames))]
            result.test_flip = float(np.mean(vals))
        if lpips_params is not None:
            # Per-image LPIPS, averaged over images (a batch-mean would
            # over-weight a ragged final mini-batch; reference
            # `main.py:365-370` means over per-image values).
            from .lpips_jax import lpips, minmax_rescale
            if lpips_rescale == "minmax":
                # Reference semantics (`main.py:361-364`): min-max over
                # the WHOLE frame stack (one global lo/hi per tensor),
                # then per-image distances on the pre-scaled values.
                gts = minmax_rescale(jnp.asarray(
                    np.asarray(gt_images, np.float32)))
                recs = minmax_rescale(jnp.asarray(np.stack(frames)))
                vals = [float(lpips(lpips_params, gts[i], recs[i],
                                    rescale="none"))
                        for i in range(len(frames))]
            else:
                vals = [float(lpips(lpips_params,
                                    jnp.asarray(gt_images[i]),
                                    jnp.asarray(frames[i]),
                                    rescale=lpips_rescale))
                        for i in range(len(frames))]
            result.test_lpips = float(np.mean(vals))
    return result


def load_given_render_path_rays(path: str):
    """Load a DONeRF-style precomputed ray file: ``all_rays_o``/
    ``all_rays_d`` [N, H*W, 3] (+ optional ``gt_imgs`` [N, H, W, 3]) — a
    torch ``.pt`` pickle (reference `main.py:206-212`) or an ``.npz``."""
    if path.endswith(".npz"):
        data = dict(np.load(path))
    else:
        import torch
        loaded = torch.load(path, map_location="cpu", weights_only=False)
        data = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in loaded.items()}
    gt = data.get("gt_imgs")
    return (np.asarray(data["all_rays_o"], np.float32),
            np.asarray(data["all_rays_d"], np.float32),
            None if gt is None else np.asarray(gt, np.float32))


def render_path_given_rays(params: dict, cfg: R2LConfig,
                           sampler: PointSampler,
                           all_rays_o: np.ndarray, all_rays_d: np.ndarray,
                           H: int, W: int,
                           gt_images: np.ndarray | None = None,
                           savedir: str | None = None,
                           embed_L: int = 10, plucker: bool = False,
                           use_pallas: bool = True, pallas_tile: int = 512,
                           quantize: str = "", mesh=None,
                           lpips_params: dict | None = None,
                           lpips_rescale: str = "standard",
                           flip_rescale: str = "standard",
                           compute_flip: bool = True,
                           logger=None, frame_fn=None) -> EvalResult:
    """DONeRF path: render frames from precomputed rays (reference
    `main.py:207-270`) through the SAME production fast path and metric
    set as the pose-driven ``render_path`` — Pallas PE-fused / int8
    kernels, mesh ray sharding, PSNR/v2/SSIM/FLIP/LPIPS, error + gt
    image dumps. Pass a prebuilt ``frame_fn`` (from
    ``make_r2l_givenrays_frame_fn``) to share its prepared params with
    other consumers (the caller's bench fn)."""
    if frame_fn is None:
        frame_fn = make_r2l_givenrays_frame_fn(
            params, cfg, sampler, H, W, embed_L=embed_L, plucker=plucker,
            use_pallas=use_pallas, pallas_tile=pallas_tile,
            quantize=quantize, calib_rays=(all_rays_o, all_rays_d),
            mesh=mesh)
    if logger is not None:
        logger.print(f"given-rays inference path: {frame_fn.kind}"
                     + (f" (mesh {dict(mesh.shape)})" if mesh is not None
                        else ""))
    inputs = [(all_rays_o[i], all_rays_d[i])
              for i in range(all_rays_o.shape[0])]
    gt = None
    if gt_images is not None:
        gt = np.asarray(gt_images, np.float32)[:, :H, :W]
    return render_path(frame_fn, inputs, gt_images=gt, savedir=savedir,
                       lpips_params=lpips_params,
                       lpips_rescale=lpips_rescale,
                       flip_rescale=flip_rescale,
                       compute_flip=compute_flip, logger=logger)


def write_video(path: str, frames: np.ndarray, fps: int = 30) -> str:
    """Write an mp4 (needs an ffmpeg backend); fall back to GIF when no
    video codec is available so headless runs never crash. Returns the
    path actually written."""
    import imageio.v2 as imageio
    try:
        imageio.mimwrite(path, to8b(frames), fps=fps, quality=8)
        return path
    except Exception:
        gif = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(gif, to8b(frames),
                         duration=max(1000.0 / fps, 1.0), loop=0)
        return gif
