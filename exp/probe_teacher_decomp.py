"""r4: per-phase decomposition of the fused int8 teacher frame
(round-3 verdict Next #7: 201 ms/frame vs ~123 ms int8-MXU floor — find
where the 78 ms lives: coarse kernel vs sample_pdf (XLA, between passes)
vs fine kernel vs the pad/un-transpose epilogue).

Protocol: K frames inside ONE jit (lax.map over poses is overkill here —
each variant renders the same full 400^2 frame K times with different
PRNG-free z), scalar checksum readback, min over reps. Canonical config:
8x256+skip teacher, viewdirs, 64 coarse + 128 fine, chunk 32768,
tile 4096, int8 fold_requant.

Writes one jsonl row per variant to exp/probe_teacher_decomp.jsonl.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from r2l_tpu.models.nerf import NeRFConfig, init_nerf  # noqa: E402
from r2l_tpu.render import VolRenderConfig, _coarse_z  # noqa: E402
from r2l_tpu.sampler import PointSampler  # noqa: E402
from r2l_tpu.volume import sample_pdf  # noqa: E402
from r2l_tpu.kernels.nerf_render_pallas import (  # noqa: E402
    fused_nerf_render_t, prepare_fused_nerf_t)

H = W = 400
CHUNK = 32768
TILE = 4096
S_C, S_F = 64, 128
K = 4          # frames per jit
REPS = 3

ncfg = NeRFConfig(D=8, W=256, input_ch=63, input_ch_views=27,
                  output_ch=5, skips=(4,), use_viewdirs=True,
                  compute_dtype=jnp.bfloat16, precision="default")
vcfg = VolRenderConfig(n_coarse=S_C, n_fine=S_F, perturb=False,
                       use_viewdirs=True, white_bkgd=True,
                       multires=10, multires_views=4,
                       near=2.0, far=6.0, ray_chunk=CHUNK)

key = jax.random.key(0)
k1, k2, k3 = jax.random.split(key, 3)
pc = init_nerf(k1, ncfg)
pf = init_nerf(k2, ncfg)

sampler = PointSampler(H=H, W=W, focal=555.0, n_sample=S_C,
                       near=2.0, far=6.0)
c2w = jnp.asarray(np.array(
    [[1, 0, 0, 0], [0, 0, 1, -4.0], [0, -1, 0, 0]], np.float32))
rays_o, rays_d = sampler.frame_rays(c2w)
n = rays_o.shape[0]
n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK
ro = jnp.concatenate([rays_o, jnp.zeros((n_pad - n, 3))]).reshape(
    -1, CHUNK, 3)
rd = jnp.concatenate([rays_d, jnp.ones((n_pad - n, 3))]).reshape(
    -1, CHUNK, 3)
print(f"rays {n} -> {ro.shape[0]} chunks of {CHUNK}", flush=True)

# int8 calibration points: random scene-box points + directions
cal_p = jax.random.uniform(k3, (4096, 3), minval=-4.0, maxval=4.0)
cal_d = jax.random.normal(k3, (4096, 3))
cal_d = cal_d / jnp.linalg.norm(cal_d, axis=-1, keepdims=True)
fpc = prepare_fused_nerf_t(pc, ncfg, 10, 4, calib=(cal_p, cal_d),
                           fold_requant=True)
fpf = prepare_fused_nerf_t(pf, ncfg, 10, 4, calib=(cal_p, cal_d),
                           fold_requant=True)

run_k = functools.partial(fused_nerf_render_t, L_pts=10, L_views=4,
                          white_bkgd=True, tile=TILE, int8=True,
                          fold_requant=True)


def chunk_full(o, d):
    z = _coarse_z(vcfg, CHUNK, None)
    rgb, acc, depth, w = run_k(fpc, ncfg, o, d, z)
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    z_samp = sample_pdf(None, z_mid, w[:, 1:-1], S_F, det=True)
    z_all = jnp.sort(jnp.concatenate([z, z_samp], axis=-1), axis=-1)
    rgb, acc, depth, _ = run_k(fpf, ncfg, o, d, z_all)
    return jnp.sum(rgb)


def chunk_coarse(o, d):
    z = _coarse_z(vcfg, CHUNK, None)
    rgb, acc, depth, w = run_k(fpc, ncfg, o, d, z)
    return jnp.sum(rgb) + jnp.sum(w)


def chunk_coarse_pdf(o, d):
    z = _coarse_z(vcfg, CHUNK, None)
    rgb, acc, depth, w = run_k(fpc, ncfg, o, d, z)
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    z_samp = sample_pdf(None, z_mid, w[:, 1:-1], S_F, det=True)
    z_all = jnp.sort(jnp.concatenate([z, z_samp], axis=-1), axis=-1)
    return jnp.sum(rgb) + jnp.sum(z_all)


def chunk_fine192(o, d):
    # the fine pass alone: S = 64 + 128 merged z (linspaced stand-in)
    zc = _coarse_z(vcfg, CHUNK, None)
    zf = jnp.linspace(2.0, 6.0, S_F)[None, :].repeat(CHUNK, 0)
    z_all = jnp.sort(jnp.concatenate([zc, zf], axis=-1), axis=-1)
    rgb, acc, depth, _ = run_k(fpf, ncfg, o, d, z_all)
    return jnp.sum(rgb)


def frame_of(chunk_fn):
    # K frames inside one jit, each with a DIFFERENT tiny ray offset so
    # XLA cannot CSE them into one execution.
    offs = jnp.linspace(0.0, 1e-5, K)

    @jax.jit
    def k_frames():
        def frame(off):
            def body(args):
                o, d = args
                return chunk_fn(o + off, d)
            return jnp.sum(jax.lax.map(body, (ro, rd)))
        return jnp.sum(jax.lax.map(frame, offs))

    return k_frames


def bench(name, chunk_fn):
    fn = frame_of(chunk_fn)
    t0 = time.time()
    float(fn())
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / K
    row = {"name": name, "ms_per_frame": round(ms, 2),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(row), flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "probe_teacher_decomp.jsonl"), "a") as fh:
        fh.write(json.dumps(row) + "\n")
    return ms


full = bench("full_int8_fold", chunk_full)
coarse = bench("coarse64_only", chunk_coarse)
cpdf = bench("coarse64_plus_pdf", chunk_coarse_pdf)
fine = bench("fine192_only", chunk_fine192)
row = {"name": "decomp_summary",
       "full": round(full, 2), "coarse": round(coarse, 2),
       "pdf": round(cpdf - coarse, 2), "fine": round(fine, 2),
       "residual_epilogue": round(full - (cpdf + fine), 2)}
print(json.dumps(row), flush=True)
with open(os.path.join(os.path.dirname(__file__),
                       "probe_teacher_decomp.jsonl"), "a") as fh:
    fh.write(json.dumps(row) + "\n")
