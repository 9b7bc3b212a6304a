"""MXU probe: why does the W=256 bf16 matmul chain cap at ~50% MFU on v5e?

Round-1 measured the fused 86-layer chain at ~97 TF/s (v5e bf16 peak 197).
This probe times isolated matmul-chain kernels (no head/tail/PE) under the
honest protocol (K reps inside ONE jit, scalar checksum readback — see
CLAUDE.md) across the hypotheses:

  A  chain_fori_full     current production style (fori over blocks, f32
                         epilogue with casts, res_scale mul)
  B  chain_unroll_full   python-unrolled blocks (static weight indices)
  C  chain_fori_lean     bf16 matmul output, bf16 bias/relu/residual,
                         res_scale folded into weights
  D  chain_unroll_lean
  E  chain_unroll_none   matmuls only (pure MXU ceiling for this shape)
  F  chain_bigN          alternating [256,512]x[512,256] (is N=256 the cap?)
  G  dual stream         two independent 512-row streams interleaved
  I  int8 static scales  int8 MXU (394 TOPS peak), no in-kernel max-reduce

plus tile-size and dimension_semantics sweeps on the winner.

Usage: python exp/probe_mxu.py [quick]   (appends JSONL to exp/probe1.jsonl)
"""
from __future__ import annotations

import functools
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_LAYERS = 86          # body of the canonical D=88 net (43 blocks x 2)
W = 256
N_RAYS = 163840        # ~one 400x400 frame, tile-aligned
K_REPS = 8
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12

OUT = "exp/probe1.jsonl"


def log(rec):
    rec["ts"] = time.time()
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _mk_weights(key, n_layers, w_in, w_out, dtype):
    ks = jax.random.split(key, 2)
    w = jax.random.normal(ks[0], (n_layers, w_in, w_out), jnp.float32) * 0.05
    b = jax.random.normal(ks[1], (n_layers, w_out), jnp.float32) * 0.01
    return w.astype(dtype), b


def time_variant(name, fn, x, extra=None, flops_per_frame=None):
    """fn: (x) -> scalar, jitted inside. Times K_REPS frames in one jit."""
    scales = jnp.linspace(1.0, 1.0001, K_REPS)

    @jax.jit
    def run(x, scales):
        return jnp.sum(jax.lax.map(lambda s: fn(x * s), scales))

    t0 = time.time()
    try:
        r = float(run(x, scales))
    except Exception as e:  # noqa: BLE001 — record and move on
        log({"name": name, "error": repr(e)[:500]})
        return None
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, scales))
        times.append(time.perf_counter() - t0)
    dt = min(times) / K_REPS
    rec = {"name": name, "ms_per_frame": round(dt * 1e3, 3),
           "compile_s": round(compile_s, 1), "checksum": r}
    if flops_per_frame:
        rec["tflops"] = round(flops_per_frame / dt / 1e12, 1)
        rec["mfu_bf16"] = round(flops_per_frame / dt / PEAK_BF16, 3)
    if extra:
        rec.update(extra)
    log(rec)
    return dt


# --------------------------------------------------------------- kernels ---

def chain_kernel(x_ref, w_ref, b_ref, o_ref, *, n_layers, mode, unroll,
                 dual=False):
    """One tile [T, W] through n_layers [W,W] matmuls."""

    def layer_full(h, i):
        acc = jnp.dot(h, w_ref[i], preferred_element_type=jnp.float32)
        acc = acc + b_ref[pl.ds(i, 1), :]
        acc = jnp.maximum(acc, 0.0)
        return acc.astype(jnp.bfloat16)

    def layer_lean(h, i):
        acc = jnp.dot(h, w_ref[i], preferred_element_type=jnp.bfloat16)
        return jnp.maximum(acc + b_ref[pl.ds(i, 1), :].astype(jnp.bfloat16),
                           jnp.bfloat16(0))

    def layer_none(h, i):
        return jnp.dot(h, w_ref[i],
                       preferred_element_type=jnp.bfloat16)

    layer = {"full": layer_full, "lean": layer_lean, "none": layer_none}[mode]

    if dual:
        t = x_ref.shape[0] // 2
        ha = x_ref[:t].astype(jnp.bfloat16)
        hb = x_ref[t:].astype(jnp.bfloat16)
        if unroll:
            for i in range(n_layers):
                ha = layer(ha, i)
                hb = layer(hb, i)
        else:
            def body(i, hs):
                return layer(hs[0], i), layer(hs[1], i)
            ha, hb = jax.lax.fori_loop(0, n_layers, body, (ha, hb))
        o_ref[:t] = ha.astype(jnp.float32)
        o_ref[t:] = hb.astype(jnp.float32)
        return

    h = x_ref[...].astype(jnp.bfloat16)
    if unroll:
        for i in range(n_layers):
            h = layer(h, i)
    else:
        h = jax.lax.fori_loop(0, n_layers, lambda i, h: layer(h, i), h)
    o_ref[...] = h.astype(jnp.float32)


def make_chain(tile, n_layers, mode, unroll, dual=False, semantics=None,
               n_rays=N_RAYS):
    key = jax.random.key(0)
    wq, b = _mk_weights(key, n_layers, W, W, jnp.bfloat16)
    const = lambda i: (0, 0)  # noqa: E731
    kern = functools.partial(chain_kernel, n_layers=n_layers, mode=mode,
                             unroll=unroll, dual=dual)
    cp = None
    if semantics is not None:
        cp = pltpu.CompilerParams(dimension_semantics=(semantics,))

    def apply_(x):
        out = pl.pallas_call(
            kern,
            grid=(n_rays // tile,),
            in_specs=[
                pl.BlockSpec((tile, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_layers, W, W), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_layers, W), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rays, W), jnp.float32),
            compiler_params=cp,
        )(x, wq, b)
        return jnp.sum(out)

    return apply_


def bign_kernel(x_ref, w1_ref, w2_ref, o_ref, *, n_pairs):
    h = x_ref[...].astype(jnp.bfloat16)
    for i in range(n_pairs):
        a = jnp.maximum(jnp.dot(h, w1_ref[i],
                                preferred_element_type=jnp.bfloat16),
                        jnp.bfloat16(0))          # [T, 512]
        h = jnp.maximum(jnp.dot(a, w2_ref[i],
                                preferred_element_type=jnp.bfloat16),
                        jnp.bfloat16(0))          # [T, 256]
    o_ref[...] = h.astype(jnp.float32)


def make_bign(tile, n_pairs):
    key = jax.random.key(0)
    w1, _ = _mk_weights(key, n_pairs, W, 2 * W, jnp.bfloat16)
    w2, _ = _mk_weights(key, n_pairs, 2 * W, W, jnp.bfloat16)

    def apply_(x):
        out = pl.pallas_call(
            functools.partial(bign_kernel, n_pairs=n_pairs),
            grid=(N_RAYS // tile,),
            in_specs=[
                pl.BlockSpec((tile, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pairs, W, 2 * W), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pairs, 2 * W, W), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_RAYS, W), jnp.float32),
        )(x, w1, w2)
        return jnp.sum(out)

    return apply_


def int8_kernel(x_ref, w_ref, s_ref, o_ref, *, n_layers, inv_s):
    h = x_ref[...].astype(jnp.bfloat16)
    for i in range(n_layers):
        q = jnp.clip(jnp.round(h.astype(jnp.float32) * inv_s),
                     -127, 127).astype(jnp.int8)
        acc = jnp.dot(q, w_ref[i], preferred_element_type=jnp.int32)
        h = jnp.maximum(acc.astype(jnp.float32) * s_ref[pl.ds(i, 1), :],
                        0.0).astype(jnp.bfloat16)
    o_ref[...] = h.astype(jnp.float32)


def make_int8(tile, n_layers):
    key = jax.random.key(0)
    wf, _ = _mk_weights(key, n_layers, W, W, jnp.float32)
    ws = jnp.max(jnp.abs(wf), axis=1) / 127.0            # [L, W] per-col
    wq = jnp.clip(jnp.round(wf / ws[:, None, :]), -127, 127).astype(jnp.int8)
    # static activation scale folded with the weight scale: one mul/elem
    a_scale = 4.0 / 127.0
    s = (ws * a_scale).astype(jnp.float32)

    def apply_(x):
        out = pl.pallas_call(
            functools.partial(int8_kernel, n_layers=n_layers,
                              inv_s=1.0 / a_scale),
            grid=(N_RAYS // tile,),
            in_specs=[
                pl.BlockSpec((tile, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_layers, W, W), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_layers, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_RAYS, W), jnp.float32),
        )(x, wq, s)
        return jnp.sum(out)

    return apply_


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    dev = jax.devices()[0]
    log({"name": "device", "kind": str(dev.device_kind),
         "platform": dev.platform})
    fpf = N_RAYS * N_LAYERS * 2 * W * W  # flops per "frame"

    x = jax.random.normal(jax.random.key(1), (N_RAYS, W), jnp.float32)
    x = jax.block_until_ready(x)

    runs = [
        ("E_unroll_none_t1024", make_chain(1024, N_LAYERS, "none", True)),
        ("D_unroll_lean_t1024", make_chain(1024, N_LAYERS, "lean", True)),
        ("A_fori_full_t1024", make_chain(1024, N_LAYERS, "full", False)),
    ]
    if not quick:
        runs += [
            ("B_unroll_full_t1024", make_chain(1024, N_LAYERS, "full", True)),
            ("C_fori_lean_t1024", make_chain(1024, N_LAYERS, "lean", False)),
            ("E_unroll_none_t512", make_chain(512, N_LAYERS, "none", True)),
            ("E_unroll_none_t2048", make_chain(2048, N_LAYERS, "none", True)),
            ("G_dual_lean_t1024", make_chain(1024, N_LAYERS, "lean", True,
                                             dual=True)),
            ("E_none_t1024_par",
             make_chain(1024, N_LAYERS, "none", True, semantics="parallel")),
            ("E_none_t1024_arb",
             make_chain(1024, N_LAYERS, "none", True, semantics="arbitrary")),
        ]

    for name, fn in runs:
        time_variant(name, fn, x, flops_per_frame=fpf)

    if not quick:
        # F: big-N pairs — 43 pairs of 256->512->256 = same layer count,
        # 2x the flops of the plain chain
        fn = make_bign(1024, N_LAYERS // 2)
        time_variant("F_bigN_unroll_t1024", fn, x,
                     flops_per_frame=N_RAYS * (N_LAYERS // 2) * 2 * 2
                     * W * W * 2)
        # I: int8 static
        fn = make_int8(1024, N_LAYERS)
        dt = time_variant("I_int8_static_t1024", fn, x, flops_per_frame=fpf)
        if dt:
            log({"name": "I_int8_static_t1024_mfu_int8",
                 "mfu_int8": round(fpf / dt / PEAK_INT8, 3)})

    log({"name": "done"})


if __name__ == "__main__":
    main()
