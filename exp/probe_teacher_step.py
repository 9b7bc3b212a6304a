"""Probe: teacher (NeRF) TRAINING step throughput at the reference's
canonical blender config — W256/D8 coarse + fine, 64+128 samples,
use_viewdirs, N_rand 4096 (lego config / README.md:79: 200k iters).

Fills the PERF.md gap: teacher training was never timed at canonical
scale (the reference needs ~1-2 days on a 2080 Ti for 200k iters).
Pipelined protocol: N steps enqueued, one readback; also a scanned
K=16 dispatch (the CLI auto path). Appends exp/probe_train.jsonl.
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

from r2l_tpu.models import NeRFConfig, init_nerf
from r2l_tpu.train import (TeacherTrainConfig, VolRenderConfig,
                           init_teacher_state, make_teacher_step_batched)

OUT = "exp/probe_train.jsonl"


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    ncfg = NeRFConfig(D=8, W=256, use_viewdirs=True)
    vcfg = VolRenderConfig(n_coarse=64, n_fine=128, perturb=True,
                           raw_noise_std=1.0, white_bkgd=True,
                           near=2.0, far=6.0, lindisp=False)
    tcfg = TeacherTrainConfig(n_rand=4096, lrate=5e-4, lrate_decay=500)
    pc = init_nerf(jax.random.key(0), ncfg)
    pf = init_nerf(jax.random.key(1), ncfg)
    state, tx = init_teacher_state(pc, pf, tcfg)

    pool = jax.block_until_ready(
        jax.random.uniform(jax.random.key(2), (1 << 20, 9)))

    log({"probe": "teacher_step", "device": str(jax.devices()[0]),
         "config": "W256D8 x2, 64+128 samples, N_rand 4096",
         "ts": time.time()})

    for scan in (1, 16):
        step = make_teacher_step_batched(ncfg, vcfg, tcfg, tx,
                                         ncfg_fine=ncfg, scan_steps=scan)
        off = jnp.asarray(0, jnp.int32)
        key = jax.random.key(3)
        t0 = time.time()
        if scan == 1:
            st, m = step(state, pool, off, key)
            float(m["loss"])
        else:
            st, m, key2 = step(state, pool, off, key)
            float(m["loss"][-1])
        compile_s = time.time() - t0
        N = 64 // scan
        t0 = time.perf_counter()
        for i in range(N):
            if scan == 1:
                st, m = step(st, pool, off + i, jax.random.key(10 + i))
            else:
                st, m, key2 = step(st, pool, off + i, key2)
        float(m["loss"] if scan == 1 else m["loss"][-1])
        ms = 1000.0 * (time.perf_counter() - t0) / (N * scan)
        log({"name": f"r3_teacher_step_scan{scan}",
             "ms_per_step": round(ms, 2),
             "rays_per_sec": round(tcfg.n_rand / (ms / 1e3), 0),
             "iters_200k_hours": round(200000 * ms / 3.6e6, 2),
             "compile_s": round(compile_s, 1)})

    log({"probe": "teacher_step_done", "ts": time.time()})


if __name__ == "__main__":
    main()
