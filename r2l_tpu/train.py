"""Training engines: R2L distillation + NeRF teacher (jit'd, donated state).

TPU design: ONE jitted/pjit'd ``train_step`` per workload, state donated so
buffers update in place, data/batch axis sharded over the mesh 'data' axis,
params replicated (or tensor-sharded), gradient reductions inserted by XLA.
Hard-ray mining lives inside the step (see hardmine.py) — no host syncs in
the hot loop. Mirrors the reference loop semantics (`main.py:1175-1513`).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .encoding import r2l_embed
from .hardmine import HardPool, init_pool, sample_hard, update_pool
from .models.nerf import NeRFConfig, apply_nerf
from .models.r2l import R2LConfig, apply_r2l
from .render import VolRenderConfig, render_rays_nerf
from .sampler import PointSampler

Array = jax.Array


# ---------------------------------------------------------------------------
# LR schedule: linear warmup + exponential decay
# (reference `main.py:1181-1195`: lrate * 0.1^(step/(decay*1000)),
#  optional --warmup_lr 'start,end_iter')
# ---------------------------------------------------------------------------

def make_lr_schedule(lrate: float, lrate_decay: int,
                     warmup: str | tuple | None = None):
    w_start, w_end = 0.0, 0
    if warmup:
        if isinstance(warmup, str):
            a, b = warmup.split(",")
            w_start, w_end = float(a), int(b)
        else:
            w_start, w_end = float(warmup[0]), int(warmup[1])

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decay = lrate * jnp.power(0.1, step / (lrate_decay * 1000.0))
        if w_end > 0:
            warm = w_start + (lrate - w_start) * step / w_end
            return jnp.where(step < w_end, warm, decay)
        return decay

    return schedule


def make_optimizer(lrate: float, lrate_decay: int,
                   warmup: str | tuple | None = None) -> optax.GradientTransformation:
    return optax.adam(make_lr_schedule(lrate, lrate_decay, warmup),
                      b1=0.9, b2=0.999)


# ---------------------------------------------------------------------------
# R2L distillation
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DistillConfig:
    batch_size: int = 81920          # N_rand(20) * 4096 rays/step
    lrate: float = 5e-4
    lrate_decay: int = 250
    warmup_lr: str | None = None     # 'start,end_iter'
    lw_rgb: float = 1.0
    lw_depth: float = 0.0            # >0 with learn_depth data
    n_hard_in: int = 0
    n_hard_out: int = 0
    hard_mul: float = 1.0
    perturb: bool = True
    embed_L: int = 10                # --multires for the R2L input PE
    plucker: bool = False
    learn_depth: bool = False        # records carry a depth column
    # 'stratified' (TPU-fast distinct-slot draw, see hardmine.sample_hard)
    # or 'permutation' (the reference's exact uniform subset — a full-pool
    # sort, 5.7 ms/step at the canonical config)
    hard_sample: str = "stratified"

    def __post_init__(self):
        # sample_hard fills from the fresh batch until the pool is full
        # and draws WITHOUT replacement from a batch_size*hard_mul pool,
        # so these bounds are structural — violating them used to surface
        # as an opaque jit broadcast error deep in tracing.
        if self.n_hard_out > self.batch_size - self.n_hard_out:
            raise ValueError(
                f"hard out-count {self.n_hard_out} exceeds the fresh "
                f"part of the batch ({self.batch_size - self.n_hard_out})"
                " — use a hard out-ratio <= 0.5")
        cap = max(int(self.batch_size * self.hard_mul), 1)
        if self.n_hard_out > cap:
            raise ValueError(
                f"hard out-count {self.n_hard_out} exceeds the pool "
                f"capacity {cap} (batch_size*hard_mul) — raise --hard_mul")


def _patch_dims(H: int, W: int, n: int) -> tuple[int, int]:
    """Aspect-matched patch dimensions covering >= n pixels.

    The reference's rand_patch (`helpers:385-405`) sizes the patch as
    [H*k, W*k] with k = sqrt(n/(H*W)), yielding <= n pixels and a
    dynamic batch size; jit needs static shapes, so we ceil the width
    and take exactly the first n row-major pixels of the patch.
    """
    import math
    assert n <= H * W, f"N_rand {n} exceeds image pixels {H * W}"
    k = math.sqrt(n / (H * W))
    ph = max(1, min(H, int(H * k)))
    pw = max(1, min(W, math.ceil(n / ph)))
    if ph * pw < n:                     # pw hit W: grow the height
        ph = min(H, math.ceil(n / pw))
    return ph, pw


def _patch_coords(k_coord, hs, ws, hn, wn, H: int, W: int, n: int,
                  ph: int, pw: int):
    """Random patch origin inside the (precrop) box + the first n
    row-major pixel coordinates of the ph x pw patch."""
    u = jax.random.uniform(k_coord, (2,))
    h0 = (hs + (u[0] * jnp.maximum(hn - ph, 1))
          .astype(jnp.int32)).clip(0, H - ph)
    w0 = (ws + (u[1] * jnp.maximum(wn - pw, 1))
          .astype(jnp.int32)).clip(0, W - pw)
    flat = jnp.arange(n, dtype=jnp.int32)
    hh = (h0 + flat // pw).clip(0, H - 1)
    ww = (w0 + flat % pw).clip(0, W - 1)
    return hh, ww


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array
    pool: HardPool


def init_train_state(key: jax.Array, params: Any, dcfg: DistillConfig,
                     record_dim: int = 9) -> tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(dcfg.lrate, dcfg.lrate_decay, dcfg.warmup_lr)
    pool_cap = max(int(dcfg.batch_size * dcfg.hard_mul), 1)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32),
                      pool=init_pool(pool_cap, record_dim)), tx


def _r2l_inputs(batch: Array, sampler: PointSampler, dcfg: DistillConfig,
                key: jax.Array | None):
    """Split records into (sample points, rgb_target, depth_target)."""
    rays_o, rays_d = batch[:, 0:3], batch[:, 3:6]
    rgb = batch[:, 6:9]
    depth = batch[:, 9:] if (dcfg.learn_depth and batch.shape[1] > 9) else None
    if dcfg.plucker:
        pts = sampler.sample_train_plucker(rays_o, rays_d)
    else:
        pts = sampler.sample_train(rays_o, rays_d,
                                   key if dcfg.perturb else None)
    return pts, rgb, depth


def distill_loss_fn(params: Any, cfg: R2LConfig, dcfg: DistillConfig,
                    sampler: PointSampler, batch: Array,
                    key: jax.Array | None, fused_apply=None):
    pts, rgb_t, depth_t = _r2l_inputs(batch, sampler, dcfg, key)
    if fused_apply is not None:
        # Fused Pallas forward + custom-VJP backward (single-device;
        # kernels/r2l_train_pallas.py) — PE happens in-kernel.
        pred = fused_apply(params, pts)
    else:
        pred = apply_r2l(params, cfg, r2l_embed(pts, dcfg.embed_L))
    # RGB term uses the first 3 channels only — learn_depth models emit
    # [rgb, depth] (reference slices rgb[:, :3], `main.py:1377`).
    per_ray = jnp.mean((pred[..., :3] - rgb_t) ** 2, axis=-1)  # [B]
    loss = dcfg.lw_rgb * jnp.mean(per_ray)
    if depth_t is not None and dcfg.lw_depth > 0:
        # learn_depth: extra output channels regress ray depth
        # (reference `main.py:1389-1396`).
        loss = loss + dcfg.lw_depth * jnp.mean((pred[..., 3:] - depth_t) ** 2)
    return loss, per_ray


def _distill_core(state: TrainState, fresh: Array, key: jax.Array,
                  cfg: R2LConfig, dcfg: DistillConfig,
                  sampler: PointSampler, tx: optax.GradientTransformation,
                  n_fresh: int, mesh=None, fused_apply=None):
    """Shared inner distill step: hard-pool augment -> grad -> update ->
    pool refresh. ``fresh`` are host-fed records [n_fresh, record_dim].

    ``mesh``: pin the distributed layout with explicit sharding
    constraints — batch and hard pool sharded over 'data', params by
    ``r2l_param_shardings`` — instead of relying on XLA's propagation
    from input placement (one heuristic change away from an all-gather
    in the hot loop otherwise).
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import r2l_param_shardings
        wsc = jax.lax.with_sharding_constraint
        fresh = wsc(fresh, NamedSharding(mesh, P("data")))
        state = state._replace(
            params=wsc(state.params,
                       r2l_param_shardings(mesh, state.params)),
            pool=state.pool._replace(
                rays=wsc(state.pool.rays,
                         NamedSharding(mesh, P("data", None)))))
    k_hard, k_perturb = jax.random.split(key)
    if dcfg.n_hard_out > 0:
        hard, idx = sample_hard(state.pool, k_hard, dcfg.n_hard_out,
                                fresh, mode=dcfg.hard_sample)
        batch = jnp.concatenate([fresh, hard], axis=0)
    else:
        idx = jnp.zeros((1,), jnp.int32)
        batch = fresh

    (loss, per_ray), grads = jax.value_and_grad(
        distill_loss_fn, has_aux=True)(
            state.params, cfg, dcfg, sampler, batch, k_perturb,
            fused_apply)

    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)

    pool = state.pool
    if dcfg.n_hard_in > 0:
        # Hard examples are collected from the FRESH rays only
        # (reference takes rgb[:batch_size], `main.py:1409-1416`) —
        # re-selecting pool rays would fill the pool with duplicates.
        _, hard_ids = jax.lax.top_k(per_ray[:n_fresh], dcfg.n_hard_in)
        pool = update_pool(pool, batch[hard_ids], idx)

    new_state = TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1, pool=pool)
    # PSNR from the RGB MSE alone (the loss may include the depth
    # term, which would bias the logged PSNR).
    rgb_mse = jnp.mean(per_ray)
    metrics = {"loss": loss,
               "psnr": -10.0 * jnp.log10(jnp.maximum(rgb_mse, 1e-12))}
    return new_state, metrics


def _maybe_scan(step, n: int, mode: str, stride: int = 0):
    """Jit ``step``, or — when ``n > 1`` — a ``lax.scan`` of n steps per
    dispatch.

    Through this image's device tunnel a dispatch costs ~30x the actual
    step compute for small scenes (per-iter host round trips: key split,
    arg transfer, step). Scanning n optimizer steps inside ONE jit makes
    the loop compute-bound (TPU-native: keep control flow on device,
    `lax.scan` not Python). The in-scan key chain replicates the host
    loop exactly (``key, sub = split(key)`` once per step) so training
    is bit-identical to the per-iter dispatch path; the final key is
    returned for the host to continue the chain. Metrics come back
    stacked [n].

    Scanned signatures (state donated):
      teacher_batched: (state, ray_pool, offset, key)
                       -> (state, metrics[n], key)   offset += stride/step
      teacher_images:  (state, images, poses, key) -> (state, metrics[n], key)
      distill:         (state, batches [n, B, D], key) -> ...
      distill_images:  (state, images [n, H, W, 3], poses [n, 3, 4], key)
    """
    if n <= 1:
        return jax.jit(step, donate_argnums=(0,))

    def body_of(per_step):
        def body(carry, x):
            state, key = carry
            key, sub = jax.random.split(key)
            state, m = per_step(state, x, sub)
            return (state, key), m
        return body

    if mode == "teacher_batched":
        def scan_fn(state, ray_pool, offset, key):
            body = body_of(lambda s, j, k: step(
                s, ray_pool, offset + j * stride, k))
            (state, key), ms = jax.lax.scan(
                body, (state, key), jnp.arange(n))
            return state, ms, key
    elif mode == "teacher_images":
        def scan_fn(state, images, poses, key):
            body = body_of(lambda s, _, k: step(s, images, poses, k))
            (state, key), ms = jax.lax.scan(
                body, (state, key), jnp.arange(n))
            return state, ms, key
    elif mode == "distill":
        def scan_fn(state, batches, key):
            body = body_of(lambda s, b, k: step(s, b, k))
            (state, key), ms = jax.lax.scan(body, (state, key), batches)
            return state, ms, key
    elif mode == "distill_images":
        def scan_fn(state, images, poses, key):
            body = body_of(lambda s, ip, k: step(s, ip[0], ip[1], k))
            (state, key), ms = jax.lax.scan(
                body, (state, key), (images, poses))
            return state, ms, key
    else:
        raise ValueError(mode)
    return jax.jit(scan_fn, donate_argnums=(0,))


def make_distill_step(cfg: R2LConfig, dcfg: DistillConfig,
                      sampler: PointSampler,
                      tx: optax.GradientTransformation, mesh=None,
                      fused_vjp: bool = False, fused_tile: int = 512,
                      fused_group_blocks: int = 4,
                      scan_steps: int = 1,
                      fused_quantize: str = "",
                      fused_calib_pts=None,
                      fused_stash_q: bool = True,
                      fused_calib_every: int = 1):
    """Build the jitted distillation train step (rays data mode).

    Signature: (state, fresh_batch [B-n_hard_out, rd], key) ->
               (state, metrics dict). State buffers are donated; with a
    ``mesh`` the batch/pool/param layouts are pinned (see _distill_core).

    ``fused_vjp=True`` routes forward+backward through the Pallas
    custom-VJP kernels (single device, canonical resmlp only) — the XLA
    schedule round-trips the [B, W] activations through HBM between all
    layers in both directions (PERF.md: HBM-bound at 44% MFU).
    ``fused_quantize='int8'`` additionally runs the training FORWARD at
    the int8 MXU rate with per-step recalibrated static scales
    (straight-through backward; needs ``fused_calib_pts``);
    ``fused_stash_q`` (default on) stashes int8 q-values instead of
    bf16 dequants, halving the activation-stash HBM traffic both ways.
    ``fused_calib_every`` (int8 only) recalibrates the int8 scales every
    N GLOBAL steps instead of inside every step (N=1, the default): the
    in-step recalibration forward is a measured ~1.2 ms of the 24.4 ms
    step (PERF.md r3 decomp). Inside the scanned dispatch the packed
    scales ride the carry and a ``lax.cond`` refreshes them when
    ``state.step % N == 0`` — staleness is bounded by N-1 steps at ANY
    training phase (a full per-dispatch hoist, staleness K-1=15, lost
    3.7 dB on the verify scene — the early fast-drift phase cannot run
    on stale scales; PERF.md r3). N is a speed/quality dial; the
    verify-scene A/B for the shipped default is in PERF.md.
    """
    fused_apply = fused_calibrate = None
    if fused_vjp:
        assert mesh is None, "fused_vjp is single-device (no GSPMD "\
            "partitioning of pallas_call)"
        from .kernels.r2l_train_pallas import make_fused_train_apply
        dim_pts = 6 if dcfg.plucker else cfg.input_dim // (2 * dcfg.embed_L + 1)
        assert not dcfg.plucker
        external = bool(fused_calib_every > 1 and fused_quantize == "int8"
                        and scan_steps > 1)
        built = make_fused_train_apply(
            cfg, dim_pts, dcfg.embed_L, tile=fused_tile,
            group_blocks=fused_group_blocks,
            compute_dtype=cfg.compute_dtype,
            quantize=fused_quantize, calib_pts=fused_calib_pts,
            stash_q=fused_stash_q, external_calib=external)
        if external:
            fused_apply, fused_calibrate = built
        else:
            fused_apply = built

    n_fresh = dcfg.batch_size - dcfg.n_hard_out
    if fused_calibrate is None:
        # N=1, or the unscanned path (no carry to keep scales in): the
        # classic in-step recalibration.
        def step(state: TrainState, fresh: Array, key: jax.Array):
            return _distill_core(state, fresh, key, cfg, dcfg, sampler, tx,
                                 n_fresh=n_fresh, mesh=mesh,
                                 fused_apply=fused_apply)

        return _maybe_scan(step, scan_steps, "distill")

    # Periodic recalibration inside the scanned dispatch: the packed fp
    # rides the scan carry; a lax.cond refreshes it every
    # fused_calib_every global steps (one branch executes on TPU).
    every = jnp.asarray(fused_calib_every, jnp.int32)

    def step_fp(state, fresh, key, fp):
        return _distill_core(state, fresh, key, cfg, dcfg, sampler, tx,
                             n_fresh=n_fresh, mesh=None,
                             fused_apply=lambda p, x: fused_apply(p, x, fp))

    def scan_fn(state, batches, key):
        entry_step = state.step
        fp0 = fused_calibrate(state.params)   # fresh at dispatch entry

        def body(carry, b):
            s, k, fp = carry
            fp = jax.lax.cond(
                (s.step % every == 0) & (s.step != entry_step),
                lambda _: fused_calibrate(s.params),
                lambda f: f, fp)
            k, sub = jax.random.split(k)
            s, m = step_fp(s, b, sub, fp)
            return (s, k, fp), m

        (state, key, _), ms = jax.lax.scan(body, (state, key, fp0),
                                           batches)
        return state, ms, key

    return jax.jit(scan_fn, donate_argnums=(0,))


def make_distill_step_images(cfg: R2LConfig, dcfg: DistillConfig,
                             sampler: PointSampler,
                             tx: optax.GradientTransformation,
                             H: int, W: int, focal: float,
                             precrop_iters: int = 0,
                             precrop_frac: float = 0.5,
                             select_pixel_mode: str = "rand_pixel",
                             scan_steps: int = 1, mesh=None):
    """Distillation step for ``--data_mode images`` (reference
    `main.py:1267-1302`): one (image, pose) per iter; N_rand pixels are
    selected ON DEVICE (central precrop early, rand_pixel or rand_patch),
    rays built with get_rays, then the same loss/hard-mining core as rays
    mode. Signature: (state, image [H, W, 3], pose [3, 4], key).

    With a ``mesh`` the N_rand selected pixels shard over the 'data'
    axis inside ``_distill_core``, exactly like the rays step — the
    reference DataParallel-wraps the student regardless of data mode
    (`main.py:472-479`); the scattered pixel batch IS data-parallel
    there. The source image/pose stay replicated (they are one frame).

    NOTE: the R2L STUDENT consumes RAW camera rays even for LLFF — in
    the reference the NDC warp lives only inside the teacher's
    volumetric ``render()`` (`main.py:166-169`); the student-side ray
    converter stores raw rays (`convert_original_data_to_rays_llff.py:
    114-118` has no ndc_rays call) and the R2L eval branch samples raw
    rays (`main.py:285-317`). Warping here while evaluating raw would
    be a train/eval input-distribution mismatch.
    """
    from .rays import get_rays
    n_fresh = dcfg.batch_size - dcfg.n_hard_out

    def step(state: TrainState, image: Array, pose: Array, key: jax.Array):
        k_coord, k_core = jax.random.split(key)
        rays_o, rays_d = get_rays(H, W, focal, pose)     # [H, W, 3]

        use_crop = state.step < precrop_iters
        # Reference precrop box (`main.py:1270-1280`): the central
        # 2*dH x 2*dW crop.
        dH = int(H // 2 * precrop_frac)
        dW = int(W // 2 * precrop_frac)
        hs = jnp.where(use_crop, H // 2 - dH, 0)
        ws = jnp.where(use_crop, W // 2 - dW, 0)
        hn = jnp.where(use_crop, 2 * dH, H)
        wn = jnp.where(use_crop, 2 * dW, W)
        if select_pixel_mode == "rand_patch":
            ph, pw = _patch_dims(H, W, n_fresh)
            hh, ww = _patch_coords(k_coord, hs, ws, hn, wn, H, W,
                                   n_fresh, ph, pw)
        else:
            u = jax.random.uniform(k_coord, (n_fresh, 2))
            hh = (hs + (u[:, 0] * hn).astype(jnp.int32)).clip(0, H - 1)
            ww = (ws + (u[:, 1] * wn).astype(jnp.int32)).clip(0, W - 1)

        fresh = jnp.concatenate(
            [rays_o[hh, ww], rays_d[hh, ww], image[hh, ww]], axis=-1)
        return _distill_core(state, fresh, k_core, cfg, dcfg, sampler, tx,
                             n_fresh=n_fresh, mesh=mesh)

    return _maybe_scan(step, scan_steps, "distill_images")


# ---------------------------------------------------------------------------
# NeRF teacher training
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TeacherTrainConfig:
    n_rand: int = 1024               # rays per step (--N_rand for nerf)
    lrate: float = 5e-4
    lrate_decay: int = 250
    warmup_lr: str | None = None     # 'start,end_iter' — the reference's
    #                                  --warmup_lr applies to whichever
    #                                  model trains (`main.py:1184-1191`)
    precrop_iters: int = 0
    precrop_frac: float = 0.5
    select_pixel_mode: str = "rand_pixel"  # or 'rand_patch'
    # (reference --select_pixel_mode + get_selected_coords,
    #  `helpers:385-405`: rand_patch trains on one contiguous
    #  sqrt(n_rand)^2 patch instead of scattered pixels)


class TeacherState(NamedTuple):
    params_coarse: Any
    params_fine: Any                 # may equal a dummy {} when n_fine == 0
    opt_state: Any
    step: Array


def init_teacher_state(params_coarse: Any, params_fine: Any,
                       tcfg: TeacherTrainConfig):
    tx = make_optimizer(tcfg.lrate, tcfg.lrate_decay, tcfg.warmup_lr)
    both = {"coarse": params_coarse, "fine": params_fine}
    return TeacherState(params_coarse, params_fine, tx.init(both),
                        jnp.zeros((), jnp.int32)), tx


def _teacher_batch_constraint(batch: Array, mesh):
    """Pin the selected ray batch over the mesh 'data' axis — the
    DataParallel analog for teacher training (reference wraps the teacher
    in torch DataParallel, `main.py:472-479`); grads psum automatically."""
    if mesh is None:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.lax.with_sharding_constraint(
        batch, NamedSharding(mesh, P("data")))


def make_teacher_step_batched(ncfg: NeRFConfig, vcfg: VolRenderConfig,
                              tcfg: TeacherTrainConfig,
                              tx: optax.GradientTransformation,
                              ncfg_fine: NeRFConfig | None = None,
                              mesh=None, scan_steps: int = 1):
    """Teacher step over a pre-shuffled global ray pool (the reference's
    ``use_batching`` mode, `main.py:1135-1162,1199-1209`): rays live on
    device as one [N, 9] array; each step takes the ``n_rand`` slice at
    ``offset``. The caller advances the offset linearly and RESHUFFLES the
    pool when an epoch completes (reference `main.py:1204-1209`) — see
    ``app.run_teacher_train``. With a ``mesh`` the ray batch is sharded
    over 'data' (multi-device teacher training, reference DataParallel
    `main.py:472-479`)."""

    def step(state: TeacherState, ray_pool: Array, offset: Array,
             key: jax.Array):
        batch = jax.lax.dynamic_slice_in_dim(ray_pool, offset, tcfg.n_rand)
        batch = _teacher_batch_constraint(batch, mesh)
        ro, rd, tgt = batch[:, 0:3], batch[:, 3:6], batch[:, 6:9]

        def loss_fn(both):
            out = render_rays_nerf(both["coarse"],
                                   both["fine"] if both["fine"] else None,
                                   ncfg, vcfg, ro, rd, key=key,
                                   ncfg_fine=ncfg_fine)
            loss_rgb = jnp.mean((out.rgb_map - tgt) ** 2)
            loss = loss_rgb
            if out.rgb0 is not None:
                loss = loss + jnp.mean((out.rgb0 - tgt) ** 2)
            return loss, loss_rgb

        both = {"coarse": state.params_coarse, "fine": state.params_fine}
        (loss, loss_rgb), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(both)
        updates, opt_state = tx.update(grads, state.opt_state, both)
        both = optax.apply_updates(both, updates)
        new_state = TeacherState(both["coarse"], both["fine"], opt_state,
                                 state.step + 1)
        # Reference logs PSNR from the FINE-pass RGB MSE only
        # (`main.py:1377-1378`: psnr = mse2psnr(loss_rgb), the coarse
        # img_loss0 is added to the optimized loss but excluded here).
        return new_state, {"loss": loss,
                           "psnr": -10.0 * jnp.log10(
                               jnp.maximum(loss_rgb, 1e-12))}

    return _maybe_scan(step, scan_steps, "teacher_batched",
                       stride=tcfg.n_rand)


def make_teacher_step(ncfg: NeRFConfig, vcfg: VolRenderConfig,
                      tcfg: TeacherTrainConfig,
                      tx: optax.GradientTransformation,
                      H: int, W: int, focal: float,
                      ncfg_fine: NeRFConfig | None = None,
                      ndc: bool = False, mesh=None, scan_steps: int = 1):
    """Jitted teacher step over on-device images [N, H, W, 3] + poses.

    Per step: random training image, random pixel subset (central crop for
    the first ``precrop_iters``), volumetric render, MSE(+coarse MSE)
    (reference `main.py:1267-1406`). With a ``mesh`` the selected rays
    shard over 'data' (DataParallel analog).
    """
    from .rays import get_rays

    def step(state: TeacherState, images: Array, poses: Array,
             key: jax.Array):
        k_img, k_coord, k_render = jax.random.split(key, 3)
        img_i = jax.random.randint(k_img, (), 0, images.shape[0])
        target = images[img_i]                      # [H, W, 3]
        c2w = poses[img_i]

        rays_o, rays_d = get_rays(H, W, focal, c2w)  # [H, W, 3]
        if ndc:
            # LLFF forward-facing scenes warp rays to NDC (the reference
            # applies this inside render(), `main.py:166-169`).
            from .rays import ndc_rays
            rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)

        # Pixel selection: precrop keeps the central crop early on.
        use_crop = state.step < tcfg.precrop_iters
        fH = int(H * tcfg.precrop_frac / 2)
        fW = int(W * tcfg.precrop_frac / 2)
        hs = jnp.where(use_crop, H // 2 - fH, 0)
        ws = jnp.where(use_crop, W // 2 - fW, 0)
        hn = jnp.where(use_crop, 2 * fH, H)
        wn = jnp.where(use_crop, 2 * fW, W)
        if tcfg.select_pixel_mode == "rand_patch":
            # One contiguous aspect-matched patch at a random origin
            # (reference get_selected_coords, `helpers:394-405`).
            ph, pw = _patch_dims(H, W, tcfg.n_rand)
            hh, ww = _patch_coords(k_coord, hs, ws, hn, wn, H, W,
                                   tcfg.n_rand, ph, pw)
        else:
            u = jax.random.uniform(k_coord, (tcfg.n_rand, 2))
            hh = (hs + (u[:, 0] * hn).astype(jnp.int32)).clip(0, H - 1)
            ww = (ws + (u[:, 1] * wn).astype(jnp.int32)).clip(0, W - 1)

        batch = jnp.concatenate([rays_o[hh, ww], rays_d[hh, ww],
                                 target[hh, ww]], axis=-1)
        batch = _teacher_batch_constraint(batch, mesh)
        ro, rd, tgt = batch[:, 0:3], batch[:, 3:6], batch[:, 6:9]

        def loss_fn(both):
            out = render_rays_nerf(both["coarse"],
                                   both["fine"] if both["fine"] else None,
                                   ncfg, vcfg, ro, rd, key=k_render,
                                   ncfg_fine=ncfg_fine)
            loss_rgb = jnp.mean((out.rgb_map - tgt) ** 2)
            loss = loss_rgb
            if out.rgb0 is not None:
                loss = loss + jnp.mean((out.rgb0 - tgt) ** 2)
            return loss, loss_rgb

        both = {"coarse": state.params_coarse, "fine": state.params_fine}
        (loss, loss_rgb), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(both)
        updates, opt_state = tx.update(grads, state.opt_state, both)
        both = optax.apply_updates(both, updates)
        new_state = TeacherState(both["coarse"], both["fine"], opt_state,
                                 state.step + 1)
        # PSNR from fine-pass RGB MSE only (reference `main.py:1377-1378`).
        return new_state, {"loss": loss,
                           "psnr": -10.0 * jnp.log10(
                               jnp.maximum(loss_rgb, 1e-12))}

    return _maybe_scan(step, scan_steps, "teacher_images")
