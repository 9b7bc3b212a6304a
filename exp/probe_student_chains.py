"""r4: chains sweep on the STUDENT int8 kernel (the headline FPS path).

The teacher decomposition showed the int8 forward is partially VPU-bound
on the inter-layer requantize; independent sub-chains per grid step let
the scheduler overlap one chain's requant under another's matmuls
(teacher: -8.5%). Here: canonical R2L W256/D88, 400^2 frame, int8
fold_requant + nobf16_inner (the production epilogue), chains x tile
sweep with the K-frames-per-jit checksum protocol.

Also an on-chip bit-exactness check: chains=C rgb vs chains=1 rgb.
Writes rows to exp/probe_student_chains.jsonl.
"""
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

from r2l_tpu.kernels.r2l_pallas import (calibrate_r2l_int8_pe,  # noqa: E402
                                        fused_r2l_apply_int8_pe)
from r2l_tpu.models.r2l import R2LConfig, init_r2l  # noqa: E402
from r2l_tpu.sampler import PointSampler  # noqa: E402
from r2l_tpu.rays import pose_spherical  # noqa: E402

H = W = 400
K = 16
REPS = 4
dim_pts, L = 48, 10   # 16 samples/ray * 3
cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
params = init_r2l(jax.random.key(0), cfg)
sampler = PointSampler(H=H, W=W, focal=555.555, n_sample=16,
                       near=2.0, far=6.0)
poses = [pose_spherical(t, p, 4.0)[:3, :4]
         for t in (0.0, 90.0, 180.0, 270.0) for p in (-10.0, -70.0)]
calib = jnp.concatenate([
    PointSampler(H=50, W=50, focal=69.4, n_sample=16, near=2.0,
                 far=6.0).sample_test(jnp.asarray(np.asarray(p)))
    for p in poses])
fp = calibrate_r2l_int8_pe(params, cfg, dim_pts, L, calib_pts=calib,
                           fold_requant=True)

bench_poses = jnp.asarray(np.stack(
    [np.asarray(pose_spherical(i * 22.5, -30.0, 4.0))[:3, :4]
     for i in range(K)]))

OUT = os.path.join(os.path.dirname(__file__),
                   "probe_student_chains.jsonl")


def mk(tile, chains):
    def frame(c2w):
        pts = sampler.sample_test(c2w)
        rgb = fused_r2l_apply_int8_pe(fp, cfg, pts, dim_pts, L,
                                      tile=tile, fold_requant=True,
                                      nobf16_inner=True, chains=chains)
        return jnp.sum(rgb)

    @jax.jit
    def render_k(ps):
        return jnp.sum(jax.lax.map(frame, ps))

    return render_k


def bench(tile, chains):
    name = f"r4_student_c{chains}_t{tile}"
    fn = mk(tile, chains)
    try:
        t0 = time.time()
        checksum = float(fn(bench_poses))
        compile_s = time.time() - t0
    except Exception as e:
        row = {"name": name, "error": str(e)[:250]}
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        return
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(bench_poses))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / K
    row = {"name": name, "ms_per_frame": round(ms, 3),
           "fps": round(1e3 / ms, 2), "compile_s": round(compile_s, 1),
           "checksum": checksum}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")


# on-chip bit-exactness with real (random-init) weights first
pts0 = sampler.sample_test(jnp.asarray(np.asarray(poses[0])))
r1 = np.asarray(fused_r2l_apply_int8_pe(fp, cfg, pts0, dim_pts, L,
                                        tile=640, fold_requant=True,
                                        nobf16_inner=True, chains=1))
for C in (2, 4):
    rC = np.asarray(fused_r2l_apply_int8_pe(fp, cfg, pts0, dim_pts, L,
                                            tile=640, fold_requant=True,
                                            nobf16_inner=True, chains=C))
    row = {"name": f"r4_student_parity_c{C}",
           "max_abs_diff_vs_c1": float(np.abs(r1 - rC).max())}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")

bench(640, 1)      # production baseline
bench(640, 2)
bench(1280, 2)
bench(1280, 4)
bench(2048, 4)
bench(2048, 8)
bench(2560, 4)
bench(800, 2)
