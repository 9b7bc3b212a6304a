"""Pseudo-data generation: frozen teacher renders random poses -> ray shards.

TPU-native rework of the reference `utils/create_data.py` ``rand`` mode
(`:777-872`): random spherical poses with random focal x[1,2), full-frame
teacher renders, records ``[o(3), d(3), rgb(3)(, depth)]`` per ray, shuffled
and written as consolidated shards.

Design: poses are generated host-side (cheap numpy); each frame render is
ONE jitted chunked volumetric pass on device (the ray axis shardable over
the mesh 'data' axis), and shard writing is overlapped with the next
render via a writer thread. The reference needs ~24 h on a 2080 Ti for 10k
poses; a single TPU chip does the same FLOPs in minutes and the file IO is
off the critical path.
"""
from __future__ import annotations

import dataclasses
import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from .data.rayshards import shuffle_rays, write_ray_shards
from .models.nerf import NeRFConfig
from .rays import get_rand_pose, get_rays
from .render import (VolRenderConfig, render_frame_nerf,
                     render_frame_nerf_fused)


@dataclasses.dataclass(frozen=True)
class DataGenConfig:
    n_pose: int = 10000             # --n_pose_kd
    H: int = 400
    W: int = 400
    focal: float = 555.555
    use_rand_focal: bool = True     # focal x [1, 2) per pose (`:816-818`)
    learn_depth: str | bool = ""    # '' | 'depth' (1 extra col) |
    #                                 'surface' (o + d*depth, 3 cols —
    #                                 reference `create_data.py:832-836`);
    #                                 bool True == 'depth'
    save_every: int = 100           # poses per shard flush (--i_save)
    shard_size: int = 1 << 20
    seed: int = 0
    poses_per_batch: int = 1        # frames per device dispatch (amortizes
    #                                 the ~30 ms tunnel RTT per call)
    use_pallas: bool = True         # fully-fused volumetric Pallas pass
    #                                 (sampling+PE+MLP+compositing in
    #                                 VMEM; 322 vs 866 ms/frame on v5e,
    #                                 exp/probe_teacher_int8.jsonl —
    #                                 auto-falls back when
    #                                 raw_noise_std > 0)
    quantize: str = ""              # 'int8': static-scale int8 teacher
    #                                 (calibrated on scene-pose samples;
    #                                 TPU fused path only)
    max_save: int = 40000           # patches modes wrap shard numbering
    #                                 modulo this to bound total files
    #                                 (reference `create_data.py:1110`)


def generate_pseudo_data(params_coarse: dict, params_fine: dict | None,
                         ncfg: NeRFConfig, vcfg: VolRenderConfig,
                         gcfg: DataGenConfig, datadir: str,
                         radius: float = 4.0,
                         progress=None, mesh=None,
                         pose_fn=None, ndc: bool = False,
                         ncfg_fine=None) -> int:
    """Render ``n_pose`` random views with the teacher; write ray shards.

    Returns total rays written. ``progress`` is an optional callback
    ``(i_pose, n_pose) -> None``. ``mesh`` shards the ray axis over its
    'data' axis (multi-chip data-parallel generation). ``pose_fn(rng)``
    overrides the pose distribution (default: blender spherical; LLFF
    passes the camera-bbox sampler). ``ndc=True`` warps rays to NDC
    INSIDE the teacher render only — records store the RAW rays, as the
    reference does (`create_data.py:819-841` stores pre-warp get_rays
    output; the warp lives in render(), `main.py:166-169`).
    """
    rng = np.random.default_rng(gcfg.seed)
    H, W = gcfg.H, gcfg.W
    ld = ("depth" if gcfg.learn_depth is True
          else (gcfg.learn_depth or ""))
    record_dim = 9 + {"": 0, "depth": 1, "surface": 3}[ld]
    ppb = max(gcfg.poses_per_batch, 1)

    # Rays for a whole pose batch go through ONE jitted dispatch — the
    # ray axis shards over the mesh 'data' axis under GSPMD when a mesh
    # is given (SURVEY.md §7 step 6: datagen data-parallel over a slice).
    batch_shd = None
    if mesh is not None:
        from .parallel.mesh import batch_sharding
        batch_shd = batch_sharding(mesh)

    # Fully-fused volumetric Pallas pass on TPU (sampling + PE + MLP +
    # compositing in VMEM; 322 vs 866 ms per canonical frame,
    # exp/probe_teacher_int8.jsonl). Requires a zero sigma-noise regularizer —
    # blender datagen always qualifies; LLFF configs with
    # raw_noise_std=1.0 fall back to the XLA schedule for parity.
    use_fused = (gcfg.use_pallas and jax.default_backend() == "tpu"
                 and mesh is None and vcfg.raw_noise_std == 0.0
                 and vcfg.multires > 0)

    # Static-scale int8 teacher (the R2L int8 recipe applied to the fused
    # volumetric kernel): calibrate per-(layer, channel) activation scales
    # on sample points drawn from THIS run's pose distribution (incl. the
    # rand-focal range and the NDC warp the render applies).
    # ONE ray-construction helper shared by the main loop and the int8
    # calibration — they MUST sample the identical pose/focal
    # distribution or the static scales calibrate on stale rays.
    # Records store RAW rays (the reference's `create_data.py:819-841`
    # stores pre-warp get_rays output; NDC happens inside render()) —
    # the warp is applied in render_batch below, teacher-side only.
    def frame_rays(r) -> tuple[np.ndarray, np.ndarray]:
        ro, rd = _pose_rays(r, gcfg, radius, pose_fn=pose_fn, ndc=False)
        return ro.reshape(-1, 3), rd.reshape(-1, 3)

    def warp(ro, rd):
        if not ndc:
            return ro, rd
        from .rays import ndc_rays
        return ndc_rays(H, W, gcfg.focal, 1.0, ro, rd)

    int8_calib = None
    if gcfg.quantize == "int8" and not use_fused:
        import warnings
        warnings.warn(
            "--quantize int8 requested for datagen but the fused TPU path "
            "is unavailable (CPU backend, mesh sharding, or "
            "raw_noise_std > 0) — generating with the full-precision "
            "teacher instead", stacklevel=2)
    if use_fused and gcfg.quantize == "int8":
        crng = np.random.default_rng(gcfg.seed + 7)
        c_pts, c_vds = [], []
        for _ in range(8):
            ro_c, rd_c = frame_rays(crng)
            ro_c, rd_c = (np.asarray(a) for a in
                          warp(jnp.asarray(ro_c), jnp.asarray(rd_c)))
            sub = slice(None, None, max(H * W // 256, 1))
            ro_c, rd_c = ro_c[sub], rd_c[sub]
            z = np.linspace(vcfg.near, vcfg.far, 9, dtype=np.float32)
            pts = (ro_c[:, None, :]
                   + rd_c[:, None, :] * z[None, :, None]).reshape(-1, 3)
            vd = rd_c / np.maximum(
                np.linalg.norm(rd_c, axis=-1, keepdims=True), 1e-12)
            c_pts.append(pts)
            c_vds.append(np.broadcast_to(
                vd[:, None, :], (vd.shape[0], z.shape[0], 3)
            ).reshape(-1, 3))
        int8_calib = (jnp.asarray(np.concatenate(c_pts)),
                      jnp.asarray(np.concatenate(c_vds))
                      if vcfg.use_viewdirs else None)

    # The reference renders pseudo data through the TRAIN kwargs, i.e.
    # with stratified-perturbed z (`create_data.py:802-806` reuses
    # render_kwargs_train, perturb=1) — keep that distribution with an
    # explicit per-batch key.
    @jax.jit
    def render_batch(rays_o, rays_d, key):
        rays_o, rays_d = warp(rays_o, rays_d)
        if use_fused:
            # fold_requant: the r3 folded int8 epilogue is bit-identical
            # to the unfolded teacher path and ~9% faster (221.8 -> 201
            # ms/frame, exp/probe_teacher_int8.jsonl r3_* rows).
            out = render_frame_nerf_fused(
                params_coarse, params_fine, ncfg, vcfg, rays_o, rays_d,
                key=key if vcfg.perturb else None, ncfg_fine=ncfg_fine,
                int8_calib=int8_calib, fold_requant=True)
        else:
            out = render_frame_nerf(params_coarse, params_fine, ncfg,
                                    vcfg, rays_o, rays_d,
                                    key=key if vcfg.perturb else None,
                                    ncfg_fine=ncfg_fine)
        return out["rgb"], out["depth"]

    writer_q: queue.Queue = queue.Queue(maxsize=2)
    total = {"rays": 0}
    writer_err: list[BaseException] = []
    # The writer gets its OWN rng: numpy Generators are not thread-safe
    # and the main loop keeps drawing poses from `rng` concurrently.
    writer_rng = np.random.default_rng(gcfg.seed + 1)

    def writer():
        try:
            while True:
                item = writer_q.get()
                if item is None:
                    return
                rays = shuffle_rays(writer_rng, item)
                write_ray_shards(datadir, rays, prefix="pseudo",
                                 shard_size=gcfg.shard_size, shuffle=False)
                total["rays"] += rays.shape[0]
        except BaseException as e:  # surface IO failures to the main loop
            writer_err.append(e)
            while True:  # drain so the producer never deadlocks
                if writer_q.get() is None:
                    return

    wt = threading.Thread(target=writer, daemon=True)
    wt.start()

    buf: list[np.ndarray] = []
    done = 0
    while done < gcfg.n_pose:
        if writer_err:
            writer_q.put(None)  # release the drained writer thread
            raise RuntimeError("pseudo-data writer failed") from writer_err[0]
        k = min(ppb, gcfg.n_pose - done)
        ros, rds = [], []
        for _ in range(k):
            ro, rd = frame_rays(rng)
            ros.append(ro)
            rds.append(rd)
        ro_host = np.concatenate(ros, axis=0)
        rd_host = np.concatenate(rds, axis=0)
        if batch_shd is not None:
            ro = jax.device_put(ro_host, batch_shd)
            rd = jax.device_put(rd_host, batch_shd)
        else:
            ro, rd = jnp.asarray(ro_host), jnp.asarray(rd_host)
        rgb, depth = render_batch(ro, rd, _pose_key(gcfg.seed, done))
        # Record columns reuse the HOST ray arrays (no D2H round trip).
        cols = [ro_host, rd_host, np.asarray(rgb)]
        if ld == "surface":
            # surface POINT o + d*depth, 3 cols (`create_data.py:834-836`)
            d_np = np.asarray(depth)[:, None]
            cols.append(ro_host + rd_host * d_np)
        elif ld == "depth":
            cols.append(np.asarray(depth)[:, None])
        rec = np.concatenate(cols, axis=1).astype(np.float32)
        assert rec.shape[1] == record_dim, (rec.shape, record_dim)
        buf.append(rec)
        done += k
        if progress is not None:
            progress(done, gcfg.n_pose)
        if sum(b.shape[0] for b in buf) >= gcfg.save_every * H * W:
            writer_q.put(np.concatenate(buf, axis=0))
            buf = []
    if buf:
        writer_q.put(np.concatenate(buf, axis=0))
    writer_q.put(None)
    wt.join()
    if writer_err:
        raise RuntimeError("pseudo-data writer failed") from writer_err[0]
    return total["rays"]


def _pose_rays(rng: np.random.Generator, gcfg: DataGenConfig,
               radius: float, pose_fn=None,
               ndc: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """One random pose -> host [H, W, 3] ray origins/dirs.

    Random spherical pose (or ``pose_fn``), random focal x[1,2) unless
    disabled (reference `create_data.py:816-818`), ray-gen in NUMPY on
    the host (per-pose device dispatches + D2H readbacks for meshgrid
    math would sit on the render's critical path), optional NDC warp.
    Shared by every datagen mode AND the int8 calibration."""
    from .rays import get_rays_np
    c2w = np.asarray(pose_fn(rng) if pose_fn is not None
                     else get_rand_pose(rng, radius=radius))
    focal = gcfg.focal
    if gcfg.use_rand_focal:
        focal = gcfg.focal * rng.uniform(1.0, 2.0)
    ro, rd = get_rays_np(gcfg.H, gcfg.W, focal, c2w)
    if ndc:
        from .rays import ndc_rays
        ro_j, rd_j = ndc_rays(gcfg.H, gcfg.W, gcfg.focal, 1.0,
                              jnp.asarray(ro), jnp.asarray(rd))
        ro, rd = np.asarray(ro_j), np.asarray(rd_j)
    return ro, rd


def _rand_neighbor_offsets(rng: np.random.Generator, H: int, W: int,
                           include_center: bool = False) -> np.ndarray:
    """Per-pixel random valid 8(9)-neighborhood offset, [H, W, 2].

    Vectorized equivalent of the reference's per-pixel resample loop
    (`create_data.py:914-929`): draw from the offset set, redraw where the
    neighbor would fall outside the image.
    """
    offsets = [[-1, -1], [-1, 0], [-1, 1], [0, -1], [0, 1],
               [1, -1], [1, 0], [1, 1]]
    if include_center:
        offsets.insert(4, [0, 0])
    offs = np.asarray(offsets)
    hh = np.arange(H)[:, None]
    ww = np.arange(W)[None, :]
    pick = rng.integers(0, len(offs), size=(H, W))
    for _ in range(8):  # resample out-of-bounds picks (<=3 draws w.h.p.)
        oh, ow = offs[pick][..., 0], offs[pick][..., 1]
        bad = ((hh + oh < 0) | (hh + oh >= H)
               | (ww + ow < 0) | (ww + ow >= W))
        if not bad.any():
            break
        pick = np.where(bad, rng.integers(0, len(offs), size=(H, W)), pick)
    # Guaranteed-valid finish: mirror any still-OOB axis inward
    # (|offset| <= 1, so flipping the sign always lands in-bounds; a
    # bounded resample loop alone leaves ~(3/8)^9 bad picks per border
    # pixel -> an IndexError every few thousand frames).
    out = np.array(offs[pick])
    oh, ow = out[..., 0], out[..., 1]
    out[..., 0] = np.where((hh + oh < 0) | (hh + oh >= H), -oh, oh)
    out[..., 1] = np.where((ww + ow < 0) | (ww + ow >= W), -ow, ow)
    return out



def _make_rgb_renderer(params_coarse, params_fine, ncfg, vcfg,
                       ncfg_fine=None, gcfg: DataGenConfig | None = None):
    """Jitted rgb frame renderer threading a stratified-perturb key when
    vcfg.perturb — every reference datagen mode clones render_kwargs_train
    (perturb=1): `create_data.py:802-806` (rand), `:885-890` (rand_tworays),
    `:979-985` (rand_images), `:1031-1037` (3x3rays), `:1128-1134`
    (16x16patches), `:769` (spiral)."""
    if gcfg is not None and gcfg.quantize:
        import warnings
        warnings.warn(
            f"--quantize {gcfg.quantize} is only wired into the 'rand' "
            "datagen mode's fused path — this mode renders with the "
            "full-precision teacher", stacklevel=3)

    @jax.jit
    def render_frame(rays_o, rays_d, key):
        return render_frame_nerf(params_coarse, params_fine, ncfg, vcfg,
                                 rays_o, rays_d,
                                 key=key if vcfg.perturb else None,
                                 ncfg_fine=ncfg_fine)["rgb"]
    return render_frame


def _pose_key(seed: int, i: int):
    return jax.random.key(seed * 100003 + i)


def generate_tworays(params_coarse, params_fine, ncfg, vcfg,
                     gcfg: DataGenConfig, datadir: str,
                     radius: float = 4.0, ncfg_fine=None) -> int:
    """``rand_tworays`` mode: per pixel, also record a random neighbor's
    direction+rgb -> 15-float records [o, d, d2, rgb, rgb2]
    (reference `create_data.py:874-966`, for the nerf_v4 student)."""
    rng = np.random.default_rng(gcfg.seed)
    H, W = gcfg.H, gcfg.W

    render_frame = _make_rgb_renderer(params_coarse, params_fine, ncfg, vcfg,
                                      ncfg_fine=ncfg_fine, gcfg=gcfg)

    total, buf = 0, []
    for i in range(gcfg.n_pose):
        ro, rd = _pose_rays(rng, gcfg, radius)
        rgb = np.asarray(render_frame(
            jnp.asarray(ro.reshape(-1, 3)), jnp.asarray(rd.reshape(-1, 3)),
            _pose_key(gcfg.seed, i))).reshape(H, W, 3)
        off = _rand_neighbor_offsets(rng, H, W)
        nh = np.arange(H)[:, None] + off[..., 0]
        nw = np.arange(W)[None, :] + off[..., 1]
        rec = np.concatenate([ro, rd, rd[nh, nw], rgb, rgb[nh, nw]],
                             axis=-1).reshape(-1, 15)
        buf.append(rec.astype(np.float32))
        if (i + 1) % gcfg.save_every == 0 or i == gcfg.n_pose - 1:
            rays = shuffle_rays(rng, np.concatenate(buf, 0))
            write_ray_shards(datadir, rays, prefix="pseudo2ray",
                             shard_size=gcfg.shard_size, shuffle=False)
            total += rays.shape[0]
            buf = []
    return total


def generate_3x3rays(params_coarse, params_fine, ncfg, vcfg,
                     gcfg: DataGenConfig, datadir: str,
                     radius: float = 4.0, ncfg_fine=None) -> int:
    """``3x3rays`` mode: interior pixels with their full 3x3 neighborhood
    -> 57-float records [o(3), d3x3(27), rgb3x3(27)]
    (reference `create_data.py:1020-1115`, for the nerf_v3.4 student)."""
    rng = np.random.default_rng(gcfg.seed)
    H, W = gcfg.H, gcfg.W

    render_frame = _make_rgb_renderer(params_coarse, params_fine, ncfg, vcfg,
                                      ncfg_fine=ncfg_fine, gcfg=gcfg)

    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
               (1, -1), (1, 0), (1, 1)]
    total, buf = 0, []
    for i in range(gcfg.n_pose):
        ro, rd = _pose_rays(rng, gcfg, radius)
        rgb = np.asarray(render_frame(
            jnp.asarray(ro.reshape(-1, 3)), jnp.asarray(rd.reshape(-1, 3)),
            _pose_key(gcfg.seed, i))).reshape(H, W, 3)
        d_parts = [rd[1 + oh:H - 1 + oh, 1 + ow:W - 1 + ow]
                   for oh, ow in offsets]
        c_parts = [rgb[1 + oh:H - 1 + oh, 1 + ow:W - 1 + ow]
                   for oh, ow in offsets]
        rec = np.concatenate([ro[1:H - 1, 1:W - 1]] + d_parts + c_parts,
                             axis=-1).reshape(-1, 57)
        buf.append(rec.astype(np.float32))
        if (i + 1) % gcfg.save_every == 0 or i == gcfg.n_pose - 1:
            rays = shuffle_rays(rng, np.concatenate(buf, 0))
            write_ray_shards(datadir, rays, prefix="pseudo3x3",
                             shard_size=gcfg.shard_size, shuffle=False)
            total += rays.shape[0]
            buf = []
    return total


def generate_rand_images(params_coarse, params_fine, ncfg, vcfg,
                         gcfg: DataGenConfig, datadir: str,
                         radius: float = 4.0, ncfg_fine=None) -> int:
    """``rand_images`` mode: one [H, W, 9] (o,d,rgb) array per random pose
    (reference `create_data.py:968-1018`, for the nerf_v6 student) —
    consolidated into .npz batches of ``save_every`` frames."""
    import os

    rng = np.random.default_rng(gcfg.seed)
    H, W = gcfg.H, gcfg.W

    render_frame = _make_rgb_renderer(params_coarse, params_fine, ncfg, vcfg,
                                      ncfg_fine=ncfg_fine, gcfg=gcfg)

    os.makedirs(datadir, exist_ok=True)
    frames = []
    n_batch = 0
    for i in range(gcfg.n_pose):
        ro, rd = _pose_rays(rng, gcfg, radius)
        rgb = np.asarray(render_frame(
            jnp.asarray(ro.reshape(-1, 3)), jnp.asarray(rd.reshape(-1, 3)),
            _pose_key(gcfg.seed, i))).reshape(H, W, 3)
        frames.append(np.concatenate(
            [np.asarray(ro), np.asarray(rd), rgb], -1).astype(np.float32))
        if (i + 1) % gcfg.save_every == 0 or i == gcfg.n_pose - 1:
            np.savez(os.path.join(datadir, f"rand_images_{n_batch:05d}.npz"),
                     data=np.stack(frames))
            n_batch += 1
            frames = []
    return gcfg.n_pose


def generate_patches(params_coarse, params_fine, ncfg, vcfg,
                     gcfg: DataGenConfig, datadir: str,
                     patch_size: int = 16, radius: float = 4.0,
                     ncfg_fine=None) -> int:
    """``16x16patches`` mode: per random pose, the shared origin plus
    [patch, patch, 6] (d, rgb) tiles (reference `create_data.py:1117-1186`)
    — one .npz per pose batch instead of a folder of tiny files."""
    import os

    rng = np.random.default_rng(gcfg.seed)
    H, W = gcfg.H, gcfg.W
    ph, pw = H // patch_size, W // patch_size

    render_frame = _make_rgb_renderer(params_coarse, params_fine, ncfg, vcfg,
                                      ncfg_fine=ncfg_fine, gcfg=gcfg)

    os.makedirs(datadir, exist_ok=True)
    origins, patches = [], []
    n_batch = 0
    for i in range(gcfg.n_pose):
        ro, rd = _pose_rays(rng, gcfg, radius)
        rgb = np.asarray(render_frame(
            jnp.asarray(ro.reshape(-1, 3)), jnp.asarray(rd.reshape(-1, 3)),
            _pose_key(gcfg.seed, i))).reshape(H, W, 3)
        data = np.concatenate([np.asarray(rd), rgb], -1)  # [H, W, 6]
        tiles = (data[:ph * patch_size, :pw * patch_size]
                 .reshape(ph, patch_size, pw, patch_size, 6)
                 .transpose(0, 2, 1, 3, 4)
                 .reshape(ph * pw, patch_size, patch_size, 6))
        origins.append(np.asarray(ro)[0, 0])
        patches.append(tiles.astype(np.float32))
        if (i + 1) % gcfg.save_every == 0 or i == gcfg.n_pose - 1:
            # shard index wraps modulo max_save so a long run keeps a
            # bounded file count (reference `create_data.py:1110,1317`)
            np.savez(os.path.join(
                datadir, f"patches_{n_batch % gcfg.max_save:05d}.npz"),
                rays_o=np.stack(origins), patches=np.stack(patches))
            n_batch += 1
            origins, patches = [], []
    return gcfg.n_pose


def generate_pseudo_images(params_coarse: dict, params_fine: dict | None,
                           ncfg: NeRFConfig, vcfg: VolRenderConfig,
                           gcfg: DataGenConfig, datadir: str,
                           n_pose=10, ncfg_fine=None) -> int:
    """``spiral_evenly_spaced`` mode: render an even pose grid with the
    teacher, save pseudo images + poses (reference `create_data.py:749-775`
    + `load_blender.py:185-215` ``save_blender_data``, consolidated to one
    ``.npz`` instead of per-frame files + json)."""
    import os

    from .rays import get_novel_poses

    os.makedirs(datadir, exist_ok=True)
    # list items may be ints OR 'mode:value' strings — handled inside
    # get_novel_poses (reference `load_blender.py:335-352`)
    poses = get_novel_poses(n_pose)

    render_frame = _make_rgb_renderer(params_coarse, params_fine, ncfg, vcfg,
                                      ncfg_fine=ncfg_fine, gcfg=gcfg)

    imgs = []
    for c2w in poses:
        ro, rd = get_rays(gcfg.H, gcfg.W, gcfg.focal, jnp.asarray(c2w))
        rgb = render_frame(ro.reshape(-1, 3), rd.reshape(-1, 3),
                           _pose_key(gcfg.seed, len(imgs)))
        imgs.append(np.asarray(rgb).reshape(gcfg.H, gcfg.W, 3))
    existing = len([f for f in os.listdir(datadir)
                    if f.startswith("pseudo_images")
                    and f.endswith(".npy")])
    # plain .npy pairs so consumers can memory-map frames lazily (npz
    # members decompress whole on access)
    np.save(os.path.join(datadir, f"pseudo_images_{existing:04d}.npy"),
            np.stack(imgs).astype(np.float32))
    np.save(os.path.join(datadir, f"pseudo_poses_{existing:04d}.npy"),
            poses.astype(np.float32))
    return len(imgs)


def images_to_ray_records(images: np.ndarray, poses: np.ndarray,
                          H: int, W: int, focal: float,
                          ndc: bool = False,
                          donerf: bool = False) -> np.ndarray:
    """Real train images -> [N*H*W, 9] ray records (the offline converter,
    reference `utils/convert_original_data_to_rays_blender.py:96-235` /
    `..._llff.py:59-136`). ``ndc=True`` stores NDC-warped rays (LLFF
    forward-facing; the student then samples in [0, 1] depth).
    ``donerf=True`` generates rays in the DONeRF direction convention
    (half-pixel-centered, unit-norm — reference ``--donerf``,
    `convert_original_data_to_rays_blender.py:185-211`) so converted
    shards line up with `--given_render_path_rays` eval rays."""
    from .rays import donerf_ray_dirs, ndc_rays

    dirs_cam = donerf_ray_dirs(H, W, focal) if donerf else None
    records = []
    for img, c2w in zip(images, poses):
        if donerf:
            c2w = np.asarray(c2w, np.float32)
            rd = dirs_cam @ c2w[:3, :3].T            # [H, W, 3]
            ro = np.broadcast_to(c2w[:3, -1], rd.shape)
        else:
            ro, rd = get_rays(H, W, focal, jnp.asarray(c2w))
        if ndc:
            ro, rd = ndc_rays(H, W, focal, 1.0, ro, rd)
        records.append(np.concatenate([
            np.asarray(ro).reshape(-1, 3),
            np.asarray(rd).reshape(-1, 3),
            img.reshape(-1, 3).astype(np.float32)], axis=1))
    return np.concatenate(records, axis=0)
