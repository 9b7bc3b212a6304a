"""Probe 7: what is the int8 body's fixed ~4.8 ms/frame overhead?

  a) mxu_only   — same int8 input for every layer, outputs accumulated in
                  int32 (1 VPU op/elem/layer): upper bound on MXU rate.
  b) mincast    — dot -> truncating int8 cast -> next layer (2 ops/elem).
  c) realistic  — production epilogue (quant mul+round+clip+cast, dequant
                  FMA, relu, bf16 residual).

If (a) ~5.3 ms (90% int8 MFU): MXU fine, epilogue is additive VPU time ->
attack op count / overlap. If (a) ~9 ms: per-matmul stalls (weight loads /
issue) dominate -> attack M or weight layout.

Usage: python exp/probe_wall.py   (appends exp/probe7.jsonl)
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

N_LAYERS = 86
W = 256
N_RAYS = 163840
K_REPS = 8
OUT = "exp/probe7.jsonl"
FPF = N_RAYS * N_LAYERS * 2 * W * W


def log(rec):
    rec["ts"] = time.time()
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def kern(x_ref, w_ref, m_ref, o_ref, *, mode):
    if mode == "mxu_only":
        q = jnp.clip(jnp.round(x_ref[...] * 32.0), -127, 127
                     ).astype(jnp.int8)
        acc = jnp.zeros((x_ref.shape[0], W), jnp.int32)
        for i in range(N_LAYERS):
            acc = acc + jnp.dot(q, w_ref[i],
                                preferred_element_type=jnp.int32)
        o_ref[...] = acc.astype(jnp.float32)
    elif mode == "mincast":
        q = jnp.clip(jnp.round(x_ref[...] * 32.0), -127, 127
                     ).astype(jnp.int8)
        for i in range(N_LAYERS):
            acc = jnp.dot(q, w_ref[i], preferred_element_type=jnp.int32)
            q = jax.lax.shift_right_arithmetic(acc, 8).astype(jnp.int8)
        o_ref[...] = q.astype(jnp.float32)
    else:  # realistic
        h = x_ref[...].astype(jnp.bfloat16)
        for i in range(N_LAYERS):
            q = jnp.clip(jnp.round(h.astype(jnp.float32) * 32.0),
                         -127, 127).astype(jnp.int8)
            acc = jnp.dot(q, w_ref[i], preferred_element_type=jnp.int32)
            h = jnp.maximum(acc.astype(jnp.float32)
                            * m_ref[pl.ds(i, 1), :], 0.0
                            ).astype(jnp.bfloat16)
        o_ref[...] = h.astype(jnp.float32)


def make(mode, tile):
    key = jax.random.key(0)
    w = jax.random.randint(key, (N_LAYERS, W, W), -4, 4,
                           jnp.int32).astype(jnp.int8)
    m = jnp.full((N_LAYERS, W), 1e-3, jnp.float32)

    def apply_(x):
        out = pl.pallas_call(
            functools.partial(kern, mode=mode),
            grid=(N_RAYS // tile,),
            in_specs=[
                pl.BlockSpec((tile, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_LAYERS, W, W), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_LAYERS, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_RAYS, W), jnp.float32),
        )(x, w, m)
        return jnp.sum(out)

    return apply_


def main():
    log({"name": "device", "kind": str(jax.devices()[0].device_kind)})
    x = jax.random.normal(jax.random.key(1), (N_RAYS, W), jnp.float32)
    scales = jnp.linspace(1.0, 1.0001, K_REPS)
    for mode in ("mxu_only", "mincast", "realistic"):
        for tile in (1024, 512):
            fn = make(mode, tile)

            @jax.jit
            def run(x, scales, fn=fn):
                return jnp.sum(jax.lax.map(lambda s: fn(x * s), scales))

            t0 = time.time()
            try:
                float(run(x, scales))
            except Exception as e:  # noqa: BLE001
                log({"name": f"{mode}_t{tile}", "error": repr(e)[:300]})
                continue
            cs = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(x, scales))
                times.append(time.perf_counter() - t0)
            dt = min(times) / K_REPS
            log({"name": f"{mode}_t{tile}",
                 "ms_per_frame": round(dt * 1e3, 3),
                 "mfu_int8": round(FPF / dt / 394e12, 3),
                 "compile_s": round(cs, 1)})
    log({"name": "done"})


if __name__ == "__main__":
    main()
