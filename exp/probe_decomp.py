"""Probe 6: decompose the 10.7 ms int8 frame — sampler vs kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python exp/probe_decomp.py
"""
from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from r2l_tpu.evaluate import _prepare_r2l
from r2l_tpu.kernels.r2l_pallas import fused_r2l_apply_int8_pe
from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler

H = W = 400
FOCAL = 555.5555155968841
K = 16
OUT = "exp/probe6.jsonl"


def log(rec):
    rec["ts"] = time.time()
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def timeit(name, fn, *args):
    t0 = time.time()
    try:
        float(fn(*args))
    except Exception as e:  # noqa: BLE001
        log({"name": name, "error": repr(e)[:300]})
        return
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    log({"name": name, "ms_per_frame": round(min(times) / K * 1e3, 3),
         "compile_s": round(compile_s, 1)})


def main():
    log({"name": "device", "kind": str(jax.devices()[0].device_kind)})
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=16,
                           near=2.0, far=6.0)
    fp, _, _, _ = _prepare_r2l(params, cfg, sampler, 10, False, True,
                               "int8")
    poses = jnp.asarray(np.stack(
        [pose_spherical(t, -30.0, 4.0)[:3, :4]
         for t in np.linspace(-180, 180, K, endpoint=False)]))
    pts0 = sampler.sample_test(poses[0])
    scales = jnp.linspace(1.0, 1.0001, K)

    @jax.jit
    def sampler_only(poses):
        return jnp.sum(jax.lax.map(
            lambda c2w: jnp.sum(sampler.sample_test(c2w)), poses))

    @jax.jit
    def kernel_only(fp, pts0, scales):
        return jnp.sum(jax.lax.map(
            lambda s: jnp.sum(fused_r2l_apply_int8_pe(fp, cfg, pts0 * s,
                                                      48, 10, tile=512)),
            scales))

    @jax.jit
    def full(fp, poses):
        return jnp.sum(jax.lax.map(
            lambda c2w: jnp.sum(fused_r2l_apply_int8_pe(
                fp, cfg, sampler.sample_test(c2w), 48, 10, tile=512)),
            poses))

    timeit("sampler_only", sampler_only, poses)
    timeit("kernel_only_t512", kernel_only, fp, pts0, scales)
    timeit("full_t512", full, fp, poses)
    log({"name": "done"})


if __name__ == "__main__":
    main()
