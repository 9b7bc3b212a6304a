"""r5: A/B bf16 intermediate requant arithmetic (``bf16_requant``) in the
int8 fold_requant teacher kernel against the shipped f32 chain — the one
unmeasured lever from the r4 VPU-bound decomposition (r4 VERDICT Next #5:
the kernel spends ~160 ms/frame of VPU time on the dequant·m+b / relu /
round-clip epilogue vs ~100 ms of MXU; carrying the intermediate
arithmetic in bf16 halves the VPU element cost).

Interleaved A/B per the PERF.md protocol (alternating timed rounds in one
process, same params/calibration, min-of-rounds per variant) at the
shipped production shape: canonical 400^2 frame, 64+128 samples, int8 +
fold_requant + sample_pairs=8, tiles {1024, 2048}. Also records the rgb
RMS delta of one chunk (quality cost of the bf16 rounding).

Writes rows to probe_teacher_bf16rq.jsonl.
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
S_C, S_F = 64, 128
K = 4
ROUNDS = 3

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

cal_p = jax.random.uniform(k3, (4096, 3), minval=-4.0, maxval=4.0)
cal_d = jax.random.normal(k3, (4096, 3))
cal_d = cal_d / jnp.linalg.norm(cal_d, axis=-1, keepdims=True)
fpc = prepare_fused_nerf_t(pc, ncfg, 10, 4, calib=(cal_p, cal_d),
                           fold_requant=True)
fpf = prepare_fused_nerf_t(pf, ncfg, 10, 4, calib=(cal_p, cal_d),
                           fold_requant=True)

OUT = os.path.join(os.path.dirname(__file__), "probe_teacher_bf16rq.jsonl")


def log(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")


def chunk_full(o, d, tile, pairs, bf16rq):
    run_k = functools.partial(fused_nerf_render_t, L_pts=10, L_views=4,
                              white_bkgd=True, tile=tile, int8=True,
                              fold_requant=True, sample_pairs=pairs,
                              bf16_requant=bf16rq)
    z = _coarse_z(vcfg, CHUNK, None)
    rgb, acc, depth, w = run_k(fpc, ncfg, o, d, z)
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    z_samp = sample_pdf(None, z_mid, w[:, 1:-1], S_F, det=True)
    z_all = jnp.sort(jnp.concatenate([z, z_samp], axis=-1), axis=-1)
    rgb, acc, depth, _ = run_k(fpf, ncfg, o, d, z_all)
    return jnp.sum(rgb)


def make_k_frames(tile, pairs, bf16rq):
    offs = jnp.linspace(0.0, 1e-5, K)

    @jax.jit
    def k_frames():
        def frame(off):
            def body(args):
                o, d = args
                return chunk_full(o + off, d, tile, pairs, bf16rq)
            return jnp.sum(jax.lax.map(body, (ro, rd)))
        return jnp.sum(jax.lax.map(frame, offs))

    return k_frames


# quality delta on one chunk (first coarse+fine pass), f32 vs bf16 requant
def rgb_chunk(bf16rq, tile=1024, pairs=8):
    run_k = functools.partial(fused_nerf_render_t, L_pts=10, L_views=4,
                              white_bkgd=True, tile=tile, int8=True,
                              fold_requant=True, sample_pairs=pairs,
                              bf16_requant=bf16rq)
    z = _coarse_z(vcfg, CHUNK, None)
    rgb, acc, depth, w = run_k(fpc, ncfg, ro[0], rd[0], z)
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    z_samp = sample_pdf(None, z_mid, w[:, 1:-1], S_F, det=True)
    z_all = jnp.sort(jnp.concatenate([z, z_samp], axis=-1), axis=-1)
    rgb, *_ = run_k(fpf, ncfg, ro[0], rd[0], z_all)
    return np.asarray(rgb)


a = rgb_chunk(False)
b = rgb_chunk(True)
rms = float(np.sqrt(np.mean((a - b) ** 2)))
log({"name": "r5_bf16rq_rgb_rms_delta", "rms": rms,
     "max": float(np.max(np.abs(a - b)))})

for tile in (1024, 2048):
    variants = {
        f"r5_f32rq_octs_t{tile}": make_k_frames(tile, 8, False),
        f"r5_bf16rq_octs_t{tile}": make_k_frames(tile, 8, True),
    }
    # compile + warmup both before any timing
    compile_s = {}
    for name, fn in variants.items():
        t0 = time.time()
        float(fn())
        compile_s[name] = round(time.time() - t0, 1)
    best = {name: 1e9 for name in variants}
    for _ in range(ROUNDS):          # interleaved rounds
        for name, fn in variants.items():
            t0 = time.perf_counter()
            float(fn())
            best[name] = min(best[name], time.perf_counter() - t0)
    for name in variants:
        log({"name": name, "ms_per_frame": round(best[name] * 1e3 / K, 2),
             "compile_s": compile_s[name]})
print("PROBE_DONE", flush=True)
