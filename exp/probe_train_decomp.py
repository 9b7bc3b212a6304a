"""Decompose the 30.2 ms fused int8 training step (canonical 81,920-ray
batch) into recalibration / forward+stash / backward / optimizer+mining,
to locate the remaining harvestable pool vs the ~14.7 ms bf16 MXU floor.

Each timing is pipelined (N iterations enqueued, one readback).
Appends exp/probe_train.jsonl with r3_decomp_* records.
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

from r2l_tpu.kernels.r2l_pallas import calibrate_r2l_int8_pe
from r2l_tpu.kernels.r2l_train_pallas import (make_fused_train_apply,
                                              train_fwd_int8)
from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler
from r2l_tpu.train import (DistillConfig, distill_loss_fn, init_train_state,
                           make_distill_step)

OUT = "exp/probe_train.jsonl"


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def timed(label, fn, *args, n=50, reader=None):
    """Compile, then enqueue n calls back-to-back and read one scalar."""
    t0 = time.time()
    out = fn(*args)
    (reader or (lambda o: float(jnp.sum(o[0] if isinstance(o, tuple)
                                        else o))))(out)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    (reader or (lambda o: float(jnp.sum(o[0] if isinstance(o, tuple)
                                        else o))))(out)
    ms = 1000.0 * (time.perf_counter() - t0) / n
    log({"name": f"r3_decomp_{label}", "ms": round(ms, 2),
         "compile_s": round(compile_s, 1)})
    return ms


def main():
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    dcfg = DistillConfig(batch_size=81920, n_hard_in=8192, n_hard_out=16384,
                         hard_mul=20.0, embed_L=10)
    sampler = PointSampler(H=400, W=400, focal=555.555, n_sample=16,
                           near=2.0, far=6.0)
    B = dcfg.batch_size
    n_pts = B  # one sample point row per ray after _r2l_inputs
    fresh0 = jax.block_until_ready(
        jax.random.uniform(jax.random.key(2), (B - dcfg.n_hard_out, 9)))
    pts = jax.block_until_ready(
        jax.random.uniform(jax.random.key(4), (n_pts, 48), jnp.float32,
                           -1.0, 1.0))

    sub = PointSampler(H=32, W=32, focal=555.555 / 12.5, n_sample=16,
                       near=2.0, far=6.0)
    calib = jnp.concatenate([
        sub.sample_test(jnp.asarray(
            np.asarray(pose_spherical(t, -30.0, 4.0))[:3, :4]))
        for t in (0.0, 90.0, 180.0, 270.0)])

    log({"probe": "train_decomp", "device": str(jax.devices()[0]),
         "ts": time.time()})

    # 1. recalibration alone (the in-step f32 forward over calib rays)
    recal = jax.jit(lambda p: calibrate_r2l_int8_pe(
        p, cfg, 48, 10, calib_pts=calib))
    timed("recalib", recal, params,
          reader=lambda fp: float(jnp.sum(fp.body_m)))

    # 2. forward + int8 stash (no recalib): train_fwd_int8 on fixed fp
    fp0 = jax.block_until_ready(recal(params))
    fwd = jax.jit(lambda fp, x: train_fwd_int8(fp, cfg, x, 48, 10,
                                               tile=512, stash_q=True))
    timed("fwd_int8_qstash", fwd, fp0, pts,
          reader=lambda o: float(jnp.sum(o[0])))

    # 2b. forward WITHOUT the stash (production inference kernel path
    # inside the same jit shape) — isolates the stash-write cost
    from r2l_tpu.kernels.r2l_pallas import fused_r2l_apply_int8_pe
    fwd_ns = jax.jit(lambda fp, x: fused_r2l_apply_int8_pe(
        fp, cfg, x, 48, 10, tile=512))
    timed("fwd_int8_nostash", fwd_ns, fp0, pts)

    # 3. value_and_grad of the fused loss (recalib + fwd + stash + bwd)
    fused = make_fused_train_apply(cfg, 48, L=10, tile=512, group_blocks=4,
                                   quantize="int8", calib_pts=calib,
                                   stash_q=True)
    batch = jax.block_until_ready(
        jax.random.uniform(jax.random.key(5), (B, 9)))
    vg = jax.jit(lambda p, b, k: jax.value_and_grad(
        distill_loss_fn, has_aux=True)(p, cfg, dcfg, sampler, b, k, fused))
    key = jax.random.key(3)
    timed("value_and_grad", vg, params, batch, key,
          reader=lambda o: float(o[0][0]))

    # 3b. same but bf16 fused VJP (no int8, bf16 stash) — the bwd is
    # identical math; difference vs 3 isolates the int8-fwd saving
    fused_bf16 = make_fused_train_apply(cfg, 48, L=10, tile=512,
                                        group_blocks=4)
    vg_bf = jax.jit(lambda p, b, k: jax.value_and_grad(
        distill_loss_fn, has_aux=True)(p, cfg, dcfg, sampler, b, k,
                                       fused_bf16))
    timed("value_and_grad_bf16", vg_bf, params, batch, key,
          reader=lambda o: float(o[0][0]))

    # 4. full production step (adds sampler/hard-mining/Adam/pool update)
    state, tx = init_train_state(jax.random.key(1), params, dcfg)
    step = jax.block_until_ready if False else None
    step_fn = make_distill_step(cfg, dcfg, sampler, tx, fused_vjp=True,
                                fused_group_blocks=4, fused_quantize="int8",
                                fused_calib_pts=calib, fused_stash_q=True)
    t0 = time.time()
    state1, m = step_fn(state, fresh0, jax.random.key(3))
    float(m["loss"])
    compile_s = time.time() - t0
    N = 50
    t0 = time.perf_counter()
    st = state1
    for i in range(N):
        st, m = step_fn(st, fresh0, jax.random.key(10 + i))
    float(m["loss"])
    ms = 1000.0 * (time.perf_counter() - t0) / N
    log({"name": "r3_decomp_full_step", "ms": round(ms, 2),
         "compile_s": round(compile_s, 1)})

    log({"probe": "train_decomp_done", "ts": time.time()})


if __name__ == "__main__":
    main()
