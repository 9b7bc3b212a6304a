"""Probe: canonical distillation train-step latency on the real chip.

Batch 81,920 rays + hard mining, W256/D88, bf16 — the reference's R2L
training configuration (README.md:97). Pipelined timing: N steps enqueued
back-to-back, one scalar readback at the end (per-step readbacks add the
~30 ms tunnel RTT each).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python exp/probe_train.py
"""
from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.sampler import PointSampler
from r2l_tpu.train import DistillConfig, init_train_state, make_distill_step

OUT = "exp/probe_train.jsonl"


def main():
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    dcfg = DistillConfig(batch_size=81920, n_hard_in=8192, n_hard_out=16384,
                         hard_mul=20.0, embed_L=10)
    sampler = PointSampler(H=400, W=400, focal=555.555, n_sample=16,
                           near=2.0, far=6.0)
    fresh0 = jax.random.uniform(jax.random.key(2),
                                (dcfg.batch_size - dcfg.n_hard_out, 9))
    fresh0 = jax.block_until_ready(fresh0)

    import sys
    variants = [("xla", dict()),
                ("fused_gb4", dict(fused_vjp=True, fused_group_blocks=4)),
                ("fused_gb6", dict(fused_vjp=True, fused_group_blocks=6)),
                ("fused_gb8", dict(fused_vjp=True, fused_group_blocks=8))]
    if len(sys.argv) > 1:
        variants = [v for v in variants if v[0] in sys.argv[1:]]
    for name, kw in variants:
        params_i = jax.tree.map(jnp.array, params)
        state, tx = init_train_state(jax.random.key(1), params_i, dcfg)
        step = make_distill_step(cfg, dcfg, sampler, tx, **kw)
        t0 = time.time()
        try:
            state, m = step(state, fresh0, jax.random.key(3))
            float(m["loss"])
        except Exception as e:  # noqa: BLE001
            rec = {"name": name, "error": repr(e)[:300]}
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            continue
        compile_s = time.time() - t0
        N = 50
        t0 = time.perf_counter()
        for i in range(N):
            state, m = step(state, fresh0, jax.random.key(10 + i))
        float(m["loss"])  # single readback drains the pipeline
        dt = (time.perf_counter() - t0) / N
        rec = {"name": f"distill_step_{name}",
               "ms_per_step": round(dt * 1e3, 2),
               "rays_per_sec": round(dcfg.batch_size / dt, 0),
               "compile_s": round(compile_s, 1),
               "loss": float(m["loss"]),
               "device": str(jax.devices()[0].device_kind)}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
