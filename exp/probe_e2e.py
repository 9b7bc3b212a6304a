"""Probe 4: end-to-end 400x400 frame latency — bf16 PE vs static int8 PE.

Uses the production path (make_r2l_bench_fn: sample_test -> fused kernel)
under the honest K-frames-per-jit protocol.

Usage: python exp/probe_e2e.py   (appends to exp/probe4.jsonl)
"""
from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from r2l_tpu.evaluate import make_r2l_bench_fn
from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler

H = W = 400
FOCAL = 555.5555155968841
K = 16
OUT = "exp/probe4.jsonl"


def log(rec):
    rec["ts"] = time.time()
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    log({"name": "device", "kind": str(jax.devices()[0].device_kind)})
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=16,
                           near=2.0, far=6.0)
    poses = jnp.asarray(np.stack(
        [pose_spherical(t, -30.0, 4.0)[:3, :4]
         for t in np.linspace(-180, 180, K, endpoint=False)]))

    for name, quant, tile in [("int8r_t640", "int8", 640),
                              ("int8r_t800", "int8", 800),
                              ("int8r_t1000", "int8", 1000),
                              ("int8r_t512", "int8", 512)]:
        t0 = time.time()
        try:
            fn = make_r2l_bench_fn(params, cfg, sampler, embed_L=10,
                                   use_pallas=True, pallas_tile=tile,
                                   quantize=quant)
            float(fn(poses))
        except Exception as e:  # noqa: BLE001
            log({"name": name, "error": repr(e)[:300]})
            continue
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(poses))
            times.append(time.perf_counter() - t0)
        dt = min(times) / K
        log({"name": name, "ms_per_frame": round(dt * 1e3, 3),
             "fps": round(1.0 / dt, 2), "compile_s": round(compile_s, 1)})
    log({"name": "done"})


if __name__ == "__main__":
    main()
