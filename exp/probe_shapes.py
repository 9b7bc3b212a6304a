"""Probe 3: raw MXU throughput by (M, K, N) shape and dtype on v5e.

Probe 2 pinned the int8 ResMLP chain at 47% of int8 peak with a free
epilogue; dual-streaming didn't help. This measures UNCHAINED repeated
matmuls (x fixed, 64 independent weight matrices, outputs summed) so Mosaic
can pipeline freely — separating dependency stalls from shape limits.

Usage: python exp/probe_shapes.py  (appends to exp/probe3.jsonl)
"""
from __future__ import annotations

import functools
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_REPS = 8
N_LAYERS = 64
OUT = "exp/probe3.jsonl"


def log(rec):
    rec["ts"] = time.time()
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def unchained_kernel(x_ref, w_ref, o_ref, *, chained):
    x = x_ref[...]
    if chained:
        h = x
        for i in range(N_LAYERS):
            acc = jnp.dot(h, w_ref[i], preferred_element_type=jnp.int32
                          if x.dtype == jnp.int8 else jnp.float32)
            h = acc.astype(x.dtype) if acc.shape[1] == x.shape[1] else x
        o_ref[...] = jnp.sum(h.astype(jnp.float32), axis=1, keepdims=True)
    else:
        acc = jnp.zeros((x.shape[0], w_ref.shape[2]), jnp.float32)
        for i in range(N_LAYERS):
            r = jnp.dot(x, w_ref[i], preferred_element_type=jnp.int32
                        if x.dtype == jnp.int8 else jnp.float32)
            acc = acc + r.astype(jnp.float32)
        o_ref[...] = jnp.sum(acc, axis=1, keepdims=True)


def run_shape(M, K, N, dtype, n_tiles=32, chained=False):
    name = f"{'chain' if chained else 'free'}_{dtype.__name__}_M{M}_K{K}_N{N}"
    key = jax.random.key(0)
    if dtype == jnp.int8:
        w = jax.random.randint(key, (N_LAYERS, K, N), -127, 127, jnp.int32
                               ).astype(jnp.int8)
        x = jax.random.randint(jax.random.key(1), (n_tiles * M, K),
                               -127, 127, jnp.int32).astype(jnp.int8)
    else:
        w = (jax.random.normal(key, (N_LAYERS, K, N), jnp.float32) * 0.05
             ).astype(dtype)
        x = jax.random.normal(jax.random.key(1), (n_tiles * M, K),
                              jnp.float32).astype(dtype)
    vmem_w = N_LAYERS * K * N * (1 if dtype == jnp.int8 else 2)
    if vmem_w > 12 * 1024 * 1024:
        log({"name": name, "skip": "weights too big for VMEM"})
        return

    kern = functools.partial(unchained_kernel, chained=chained)

    def apply_(x):
        out = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_LAYERS, K, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * M, 1), jnp.float32),
        )(x, w)
        return jnp.sum(out)

    idx = jnp.arange(K_REPS)

    @jax.jit
    def run(x, idx):
        # roll x by one row per rep so executions aren't CSE'd
        return jnp.sum(jax.lax.map(
            lambda i: apply_(jnp.roll(x, i, axis=0)), idx))

    t0 = time.time()
    try:
        float(run(x, idx))
    except Exception as e:  # noqa: BLE001
        log({"name": name, "error": repr(e)[:300]})
        return
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, idx))
        times.append(time.perf_counter() - t0)
    dt = min(times) / K_REPS
    flops = 2 * n_tiles * M * K * N * N_LAYERS
    peak = 394e12 if dtype == jnp.int8 else 197e12
    log({"name": name, "ms": round(dt * 1e3, 3),
         "tops": round(flops / dt / 1e12, 1),
         "mfu": round(flops / dt / peak, 3),
         "compile_s": round(compile_s, 1)})


def main():
    log({"name": "device", "kind": str(jax.devices()[0].device_kind)})
    for dtype in (jnp.int8, jnp.bfloat16):
        for (M, K, N) in [(1024, 256, 256), (2048, 256, 256),
                          (1024, 512, 256), (1024, 256, 512),
                          (1024, 512, 512), (512, 256, 256),
                          (1024, 1024, 256)]:
            run_shape(M, K, N, dtype)
    # chained square versions (dependency-limited)
    run_shape(1024, 256, 256, jnp.int8, chained=True)
    run_shape(1024, 512, 512, jnp.int8, n_tiles=16, chained=True)
    log({"name": "done"})


if __name__ == "__main__":
    main()
