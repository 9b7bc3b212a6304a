"""Full-step A/B: stratified vs permutation hard-pool sampling at the
canonical 81,920-ray batch, for the fused int8 step AND the default XLA
bf16 step. Appends exp/probe_train.jsonl with r3_strat_* records.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler
from r2l_tpu.train import DistillConfig, init_train_state, make_distill_step

OUT = "exp/probe_train.jsonl"


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    sampler = PointSampler(H=400, W=400, focal=555.555, n_sample=16,
                           near=2.0, far=6.0)
    sub = PointSampler(H=32, W=32, focal=555.555 / 12.5, n_sample=16,
                       near=2.0, far=6.0)
    calib = jnp.concatenate([
        sub.sample_test(jnp.asarray(
            np.asarray(pose_spherical(t, -30.0, 4.0))[:3, :4]))
        for t in (0.0, 90.0, 180.0, 270.0)])

    log({"probe": "strat_fullstep", "device": str(jax.devices()[0]),
         "ts": time.time()})
    for mode in ("stratified", "permutation"):
        dcfg = DistillConfig(batch_size=81920, n_hard_in=8192,
                             n_hard_out=16384, hard_mul=20.0, embed_L=10,
                             hard_sample=mode)
        fresh0 = jax.block_until_ready(jax.random.uniform(
            jax.random.key(2), (dcfg.batch_size - dcfg.n_hard_out, 9)))
        for name, kw in (
                ("fused_int8", dict(fused_vjp=True, fused_group_blocks=4,
                                    fused_quantize="int8",
                                    fused_calib_pts=calib,
                                    fused_stash_q=True)),
                ("xla_bf16", dict())):
            params_i = jax.tree.map(jnp.array, params)
            state, tx = init_train_state(jax.random.key(1), params_i, dcfg)
            step = make_distill_step(cfg, dcfg, sampler, tx, **kw)
            t0 = time.time()
            state, m = step(state, fresh0, jax.random.key(3))
            float(m["loss"])
            compile_s = time.time() - t0
            N = 50
            t0 = time.perf_counter()
            for i in range(N):
                state, m = step(state, fresh0, jax.random.key(10 + i))
            float(m["loss"])
            dt = (time.perf_counter() - t0) / N
            log({"name": f"r3_strat_{name}_{mode}",
                 "ms_per_step": round(dt * 1e3, 2),
                 "rays_per_sec": round(dcfg.batch_size / dt, 0),
                 "compile_s": round(compile_s, 1)})
    log({"probe": "strat_fullstep_done", "ts": time.time()})


if __name__ == "__main__":
    main()
