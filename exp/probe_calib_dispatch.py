"""Measure per-dispatch int8 recalibration (VERDICT r2 #6 follow-up).

The r3 decomp (probe_train_decomp.py) showed the in-step recalibration
forward costs ~1.2 ms of the 24.7 ms fused int8 step. With
--steps_per_dispatch K the scales can be packed ONCE per dispatch and
threaded through the lax.scan as a constant (train.make_distill_step
fused_calib_every) — staleness bounded by N-1 steps.

Also sweeps the shared fwd/bwd tile and the backward group_blocks under
the per-dispatch mode. Appends exp/probe_train.jsonl (r3_calib_* rows).
Protocol: N dispatches enqueued back-to-back, one scalar readback.
"""
from __future__ import annotations

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
K = 16          # steps per dispatch (the CLI's TPU auto value)
N = 6           # dispatches per timing (96 steps)


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def time_scan(label, step_fn, state, batches, extra=None):
    t0 = time.time()
    st, ms, key = step_fn(state, batches, jax.random.key(3))
    float(ms["loss"][-1])
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for i in range(N):
        st, ms, key = step_fn(st, batches, key)
    float(ms["loss"][-1])
    per_step = 1000.0 * (time.perf_counter() - t0) / (N * K)
    rec = {"name": f"r3_calib_{label}", "ms_per_step": round(per_step, 2),
           "K": K, "compile_s": round(compile_s, 1)}
    if extra:
        rec.update(extra)
    log(rec)
    return per_step, st


def fresh_state(params, dcfg):
    return init_train_state(jax.random.key(1),
                            jax.tree.map(jnp.array, params), dcfg)


def main():
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    dcfg = DistillConfig(batch_size=81920, n_hard_in=8192, n_hard_out=16384,
                         hard_mul=20.0, embed_L=10)
    sampler = PointSampler(H=400, W=400, focal=555.555, n_sample=16,
                           near=2.0, far=6.0)
    Bf = dcfg.batch_size - dcfg.n_hard_out
    batches = jax.block_until_ready(
        jax.random.uniform(jax.random.key(2), (K, Bf, 9)))

    sub = PointSampler(H=32, W=32, focal=555.555 / 12.5, n_sample=16,
                       near=2.0, far=6.0)
    calib = jnp.concatenate([
        sub.sample_test(jnp.asarray(
            np.asarray(pose_spherical(t, -30.0, 4.0))[:3, :4]))
        for t in (0.0, 90.0, 180.0, 270.0)])

    log({"probe": "calib_dispatch", "device": str(jax.devices()[0]),
         "ts": time.time()})

    def build(every, tile=512, gb=4):
        state, tx = fresh_state(params, dcfg)
        fn = make_distill_step(cfg, dcfg, sampler, tx, fused_vjp=True,
                               fused_tile=tile, fused_group_blocks=gb,
                               fused_quantize="int8",
                               fused_calib_pts=calib, scan_steps=K,
                               fused_calib_every=every)
        return fn, state

    # control: in-step recalibration (every=1, the shipped default)
    fn, st = build(1)
    time_scan("instep_t512_g4", fn, st, batches)

    # per-dispatch calibration (every=K: one recalib per 16-step scan)
    fn, st = build(K)
    time_scan("dispatch_t512_g4", fn, st, batches)

    # bounded staleness: recalibrate every 4 global steps in-scan
    fn, st = build(4)
    time_scan("every4_t512_g4", fn, st, batches)

    # tile sweep under per-dispatch (tile is shared by fwd stash + bwd)
    for tile in (256, 1024):
        fn, st = build(K, tile=tile)
        time_scan(f"dispatch_t{tile}_g4", fn, st, batches)

    # backward group_blocks sweep
    for gb in (2, 8):
        fn, st = build(K, gb=gb)
        time_scan(f"dispatch_t512_g{gb}", fn, st, batches)

    log({"probe": "calib_dispatch_done", "ts": time.time()})


if __name__ == "__main__":
    main()
