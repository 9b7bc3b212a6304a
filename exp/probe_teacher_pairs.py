"""r4: A/B the sample_pairs teacher-kernel variant (two independent
interleaved chains per grid step — VPU-epilogue/MXU overlap) against the
single-sample grid, int8 fold_requant, canonical 400^2 frame
(64 coarse + 128 fine). Writes rows to probe_teacher_decomp.jsonl.
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

cal_p = jax.random.uniform(k3, (4096, 3), minval=-4.0, maxval=4.0)
cal_d = jax.random.normal(k3, (4096, 3))
cal_d = cal_d / jnp.linalg.norm(cal_d, axis=-1, keepdims=True)
fpc = prepare_fused_nerf_t(pc, ncfg, 10, 4, calib=(cal_p, cal_d),
                           fold_requant=True)
fpf = prepare_fused_nerf_t(pf, ncfg, 10, 4, calib=(cal_p, cal_d),
                           fold_requant=True)

OUT = os.path.join(os.path.dirname(__file__),
                   "probe_teacher_decomp.jsonl")


def chunk_full(o, d, tile, pairs):
    run_k = functools.partial(fused_nerf_render_t, L_pts=10, L_views=4,
                              white_bkgd=True, tile=tile, int8=True,
                              fold_requant=True, sample_pairs=pairs)
    z = _coarse_z(vcfg, CHUNK, None)
    rgb, acc, depth, w = run_k(fpc, ncfg, o, d, z)
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    z_samp = sample_pdf(None, z_mid, w[:, 1:-1], S_F, det=True)
    z_all = jnp.sort(jnp.concatenate([z, z_samp], axis=-1), axis=-1)
    rgb, acc, depth, _ = run_k(fpf, ncfg, o, d, z_all)
    return jnp.sum(rgb)


def bench(name, tile, pairs):
    offs = jnp.linspace(0.0, 1e-5, K)

    @jax.jit
    def k_frames():
        def frame(off):
            def body(args):
                o, d = args
                return chunk_full(o + off, d, tile, pairs)
            return jnp.sum(jax.lax.map(body, (ro, rd)))
        return jnp.sum(jax.lax.map(frame, offs))

    try:
        t0 = time.time()
        checksum = float(k_frames())
        compile_s = time.time() - t0
    except Exception as e:
        row = {"name": name, "error": str(e)[:300]}
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        return None
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(k_frames())
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / K
    row = {"name": name, "ms_per_frame": round(ms, 2),
           "compile_s": round(compile_s, 1), "checksum": checksum}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    return ms


base = bench("r4_single_t4096", 4096, False)
bench("r4_pairs_t2048", 2048, True)
bench("r4_pairs_t4096", 4096, True)
bench("r4_pairs_t1024", 1024, True)
bench("r4_single_t2048", 2048, False)

# round 2 of the sweep: more in-flight chains
bench("r4_quads_t2048", 2048, 4)
bench("r4_quads_t1024", 1024, 4)
bench("r4_octs_t1024", 1024, 8)
