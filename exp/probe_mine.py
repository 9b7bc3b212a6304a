"""Micro-probe the 6.8 ms non-VJP overhead of the fused distill step
(probe_train_decomp.py): permutation-based pool sampling, top_k hard
selection, pool scatter, Adam — plus TPU-native alternatives:

  * sample_hard: full-pool `random.permutation` (1.6M-element sort!) vs
    stratified one-per-stratum draw (O(n), distinct by construction) vs
    randints-with-replacement (reference-divergent, lower bound).
  * top_k vs jax.lax.approx_max_k (TPU-optimized).

HONEST protocol: K iterations chained inside ONE jit via fori_loop
(outputs fed back as inputs so nothing is dead-code-eliminated), one
scalar checksum readback — per-call timing through this image's tunnel
is dispatch noise. Appends exp/probe_train.jsonl with r3_mine_* records.
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

import optax
from r2l_tpu.hardmine import init_pool, update_pool
from r2l_tpu.models import R2LConfig, init_r2l

OUT = "exp/probe_train.jsonl"
B = 81920
N_OUT = 16384
N_IN = 8192
CAP = B * 20          # canonical hard_mul
K = 200


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def timed(label, make_body, init_carry, reps=3):
    """make_body(i, carry) -> carry; K chained iterations in one jit."""
    @jax.jit
    def run(carry):
        carry = jax.lax.fori_loop(0, K, make_body, carry)
        return jax.tree.reduce(
            lambda a, x: a + jnp.sum(x[..., :1].astype(jnp.float32)),
            carry, jnp.float32(0))

    float(run(init_carry))  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(init_carry))
        times.append(time.perf_counter() - t0)
    ms = 1000.0 * min(times) / K
    log({"name": f"r3_mine_{label}", "ms_per_iter": round(ms, 3)})
    return ms


def main():
    key0 = jax.random.key(0)
    rays = jax.random.uniform(key0, (CAP, 9))
    per_ray0 = jax.random.uniform(jax.random.key(2), (B,))

    log({"probe": "mine_decomp_v2", "device": str(jax.devices()[0]),
         "protocol": "fori_loop chained, scalar readback",
         "ts": time.time()})

    # --- current sample_hard: permutation of CAP + gather of N_OUT ---
    def body_perm(i, carry):
        rays, acc = carry
        k = jax.random.fold_in(key0, i)
        idx = jax.random.permutation(k, CAP)[:N_OUT]
        picked = rays[idx]                    # [N_OUT, 9]
        return rays, acc + jnp.sum(picked[:, :1])

    timed("sample_perm", body_perm, (rays, jnp.zeros((1,))))

    # --- stratified: one uniform slot per CAP//N_OUT-sized stratum ---
    def body_strat(i, carry):
        rays, acc = carry
        k = jax.random.fold_in(key0, i)
        stride = CAP // N_OUT
        off = jax.random.randint(k, (N_OUT,), 0, stride)
        idx = jnp.arange(N_OUT, dtype=jnp.int32) * stride + off
        picked = rays[idx]
        return rays, acc + jnp.sum(picked[:, :1])

    timed("sample_strat", body_strat, (rays, jnp.zeros((1,))))

    # --- randint with replacement (lower bound; divergent semantics) ---
    def body_randint(i, carry):
        rays, acc = carry
        k = jax.random.fold_in(key0, i)
        idx = jax.random.randint(k, (N_OUT,), 0, CAP)
        picked = rays[idx]
        return rays, acc + jnp.sum(picked[:, :1])

    timed("sample_randint", body_randint, (rays, jnp.zeros((1,))))

    # --- hard selection: exact top_k vs approx_max_k ---
    def body_topk(i, carry):
        pr, acc = carry
        _, ids = jax.lax.top_k(pr[:B - N_OUT], N_IN)
        pr = pr.at[0].set(acc[0] * 1e-9)      # chain dependence
        return pr, acc + jnp.sum(ids[:1].astype(jnp.float32))

    timed("topk_exact", body_topk, (per_ray0, jnp.zeros((1,))))

    def body_topk_a(i, carry):
        pr, acc = carry
        _, ids = jax.lax.approx_max_k(pr[:B - N_OUT], N_IN)
        pr = pr.at[0].set(acc[0] * 1e-9)
        return pr, acc + jnp.sum(ids[:1].astype(jnp.float32))

    timed("topk_approx", body_topk_a, (per_ray0, jnp.zeros((1,))))

    # --- pool scatter update (chained on the pool buffer) ---
    pool0 = init_pool(CAP, 9)._replace(rays=rays,
                                       size=jnp.asarray(CAP, jnp.int32))
    hard_rays = jax.random.uniform(jax.random.key(3), (N_IN, 9))
    idx_fix = jnp.arange(N_OUT, dtype=jnp.int32) * (CAP // N_OUT)

    def body_upd(i, pool):
        return update_pool(pool, hard_rays + i * 1e-9, idx_fix)

    @jax.jit
    def run_upd(pool):
        pool = jax.lax.fori_loop(0, K, body_upd, pool)
        return jnp.sum(pool.rays[:1])

    float(run_upd(pool0))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_upd(pool0))
        times.append(time.perf_counter() - t0)
    log({"name": "r3_mine_update_pool",
         "ms_per_iter": round(1000.0 * min(times) / K, 3)})

    # --- Adam on canonical params (chained) ---
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(5), cfg)
    tx = optax.adam(5e-4)
    opt_state0 = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-6), params)

    def body_adam(i, carry):
        params, opt_state = carry
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    @jax.jit
    def run_adam(carry):
        params, opt_state = jax.lax.fori_loop(0, K, body_adam, carry)
        return jnp.sum(params["tail"]["b"].astype(jnp.float32))

    float(run_adam((params, opt_state0)))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_adam((params, opt_state0)))
        times.append(time.perf_counter() - t0)
    log({"name": "r3_mine_adam",
         "ms_per_iter": round(1000.0 * min(times) / K, 3)})

    log({"probe": "mine_decomp_v2_done", "ts": time.time()})


if __name__ == "__main__":
    main()
