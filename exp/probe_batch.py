"""Probe: does batching all K frames into ONE fused-kernel call beat the
per-frame lax.map? (removes K-1 pipeline ramps + sampler/kernel
serialization points). Also sweeps tile on the batched variant.

Run on the real TPU: python exp/probe_batch.py
Appends JSONL to exp/probe_batch.jsonl.
"""
import json
import os
import sys
import time

# NOTE: do NOT use PYTHONPATH for this — any PYTHONPATH value (even /tmp)
# breaks this image's axon TPU plugin discovery. sys.path is safe.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from r2l_tpu.evaluate import _prepare_r2l, make_r2l_bench_fn
from r2l_tpu.kernels.r2l_pallas import fused_r2l_apply_int8_pe
from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler

H = W = 400
FOCAL = 555.5555155968841
K = 16
L = 10

OUT = "exp/probe_batch.jsonl"


def log(rec):
    print(rec)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def bench(fn, poses, reps=4):
    t0 = time.perf_counter()
    float(fn(poses))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(poses))
        times.append(time.perf_counter() - t0)
    return 1000.0 * min(times) / K, compile_s


def main():
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=16,
                           near=2.0, far=6.0)
    poses = jnp.asarray(np.stack(
        [pose_spherical(t, -30.0, 4.0)[:3, :4]
         for t in np.linspace(-180, 180, K, endpoint=False)]))

    # A: current production path (lax.map per frame, tile 800)
    fnA = make_r2l_bench_fn(params, cfg, sampler, embed_L=L,
                            use_pallas=True, pallas_tile=800,
                            quantize="int8")
    ms, cs = bench(fnA, poses)
    log({"name": "laxmap_t800", "ms_per_frame": round(ms, 3),
         "fps": round(1000.0 / ms, 2), "compile_s": round(cs, 1)})

    # B: one kernel call over all K frames' points
    fp, kind, dim_pts, _ = _prepare_r2l(params, cfg, sampler, L, False,
                                        True, "int8")
    assert kind == "int8"

    for tile in (800, 1024, 1600, 2000):
        @jax.jit
        def batched(fp, poses, tile=tile):
            pts = jax.vmap(sampler.sample_test)(poses)   # [K, H*W, 48]
            pts = pts.reshape(-1, dim_pts)
            rgb = fused_r2l_apply_int8_pe(fp, cfg, pts, dim_pts, L,
                                          tile=tile)
            return jnp.sum(rgb)

        try:
            ms, cs = bench(lambda p: batched(fp, p), poses)
            log({"name": f"batched_t{tile}", "ms_per_frame": round(ms, 3),
                 "fps": round(1000.0 / ms, 2), "compile_s": round(cs, 1)})
        except Exception as e:  # noqa: BLE001
            log({"name": f"batched_t{tile}", "error": repr(e)[:200]})


if __name__ == "__main__":
    main()
