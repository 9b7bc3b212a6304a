"""Probe 2: realistic int8 ResMLP-chain kernels (static activation scales).

Probe 1 (exp/probe1.jsonl) showed the plain int8 chain at 10.0 ms vs 15.2
(bf16 unrolled) for the 86-layer body. This probe measures the REAL ResMLP
epilogue cost (bias + relu + scaled residual), requant folding, dual-stream
interleaving, and tile sizes, to pick the production kernel design.

Usage: python exp/probe_int8.py   (appends JSONL to exp/probe2.jsonl)
"""
from __future__ import annotations

import functools
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BLOCKS = 43
W = 256
N_RAYS = 163840
K_REPS = 8
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
RS = 0.5  # res_scale

OUT = "exp/probe2.jsonl"
FPF = N_RAYS * N_BLOCKS * 2 * 2 * W * W  # flops per frame (body only)


def log(rec):
    rec["ts"] = time.time()
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def time_variant(name, fn, x, extra=None):
    scales = jnp.linspace(1.0, 1.0001, K_REPS)

    @jax.jit
    def run(x, scales):
        return jnp.sum(jax.lax.map(lambda s: fn(x * s), scales))

    t0 = time.time()
    try:
        r = float(run(x, scales))
    except Exception as e:  # noqa: BLE001
        log({"name": name, "error": repr(e)[:300]})
        return None
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, scales))
        times.append(time.perf_counter() - t0)
    dt = min(times) / K_REPS
    rec = {"name": name, "ms_per_frame": round(dt * 1e3, 3),
           "compile_s": round(compile_s, 1), "checksum": r,
           "tflops": round(FPF / dt / 1e12, 1),
           "mfu_int8": round(FPF / dt / PEAK_INT8, 3)}
    if extra:
        rec.update(extra)
    log(rec)
    return dt


def mk_weights(seed=0):
    """Per-block (w1, w2, b1, b2) float weights shaped like a trained net."""
    rng = np.random.default_rng(seed)
    wf = rng.normal(size=(2 * N_BLOCKS, W, W)).astype(np.float32) * 0.08
    bf = rng.normal(size=(2 * N_BLOCKS, W)).astype(np.float32) * 0.02
    return jnp.asarray(wf), jnp.asarray(bf)


def quantize(wf, bf, a_scale=1.0):
    """Per-(layer, out-col) symmetric weight int8 + folded dequant scales.

    Returns wq [L,W,W] int8, m [L,W] f32 (so acc_i32 * m = float out),
    bq [L,W] f32. a_scale is the static activation scale (x_int8 =
    x / a_scale); the dequant mul folds it: m = w_s * a_scale.
    """
    ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=1), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / ws[:, None, :]), -127, 127).astype(jnp.int8)
    m = (ws * a_scale).astype(jnp.float32)
    return wq, m, bf.astype(jnp.float32)


A_SCALE = 2.0 / 127.0     # static activation scale (residual stream ~[-2,2])
INV_A = 1.0 / A_SCALE


def _quant(h):
    """float -> int8 with the static scale (mul+round+clip+cast)."""
    return jnp.clip(jnp.round(h.astype(jnp.float32) * INV_A),
                    -127, 127).astype(jnp.int8)


# --- variant: realistic resmlp epilogue, float h stream ---------------------

def resmlp_kernel(x_ref, wq, m, b, o_ref, *, dual, fold):
    def one_stream(h):
        for i in range(N_BLOCKS):
            w1, w2 = wq[2 * i], wq[2 * i + 1]
            m1 = m[pl.ds(2 * i, 1), :]
            m2 = m[pl.ds(2 * i + 1, 1), :]
            b1 = b[pl.ds(2 * i, 1), :]
            b2 = b[pl.ds(2 * i + 1, 1), :]
            q0 = _quant(h)
            a1 = jnp.dot(q0, w1, preferred_element_type=jnp.int32)
            if fold:
                # relu+requant folded into the int32->int8 path: the next
                # quant's inv scale folds into m1, relu folds into the
                # [0,127] clip.
                q1 = jnp.clip(jnp.round(a1.astype(jnp.float32)
                                        * (m1 * INV_A) + b1 * INV_A),
                              0, 127).astype(jnp.int8)
            else:
                t = jnp.maximum(a1.astype(jnp.float32) * m1 + b1, 0.0)
                q1 = _quant(t)
            a2 = jnp.dot(q1, w2, preferred_element_type=jnp.int32)
            # res_scale folded into m2/b2 at prepare time (here: at trace
            # time, same cost profile)
            h = (a2.astype(jnp.float32) * (m2 * RS) + b2 * RS
                 + h.astype(jnp.float32)).astype(jnp.bfloat16)
        return h

    if dual:
        t = x_ref.shape[0] // 2
        ha = one_stream(x_ref[:t].astype(jnp.bfloat16))
        hb = one_stream(x_ref[t:].astype(jnp.bfloat16))
        o_ref[:t] = ha.astype(jnp.float32)
        o_ref[t:] = hb.astype(jnp.float32)
    else:
        o_ref[...] = one_stream(
            x_ref[...].astype(jnp.bfloat16)).astype(jnp.float32)


def resmlp_kernel_interleaved(x_ref, wq, m, b, o_ref):
    """Dual stream with LAYER-LEVEL interleave (a's matmul then b's, so
    Mosaic can overlap a's epilogue with b's matmul)."""
    t = x_ref.shape[0] // 2
    ha = x_ref[:t].astype(jnp.bfloat16)
    hb = x_ref[t:].astype(jnp.bfloat16)
    for i in range(N_BLOCKS):
        w1, w2 = wq[2 * i], wq[2 * i + 1]
        m1 = m[pl.ds(2 * i, 1), :]
        m2 = m[pl.ds(2 * i + 1, 1), :]
        b1 = b[pl.ds(2 * i, 1), :]
        b2 = b[pl.ds(2 * i + 1, 1), :]

        qa, qb = _quant(ha), _quant(hb)
        aa = jnp.dot(qa, w1, preferred_element_type=jnp.int32)
        ab = jnp.dot(qb, w1, preferred_element_type=jnp.int32)
        ta = jnp.maximum(aa.astype(jnp.float32) * m1 + b1, 0.0)
        tb = jnp.maximum(ab.astype(jnp.float32) * m1 + b1, 0.0)
        qa2, qb2 = _quant(ta), _quant(tb)
        aa2 = jnp.dot(qa2, w2, preferred_element_type=jnp.int32)
        ab2 = jnp.dot(qb2, w2, preferred_element_type=jnp.int32)
        ha = (aa2.astype(jnp.float32) * (m2 * RS) + b2 * RS
              + ha.astype(jnp.float32)).astype(jnp.bfloat16)
        hb = (ab2.astype(jnp.float32) * (m2 * RS) + b2 * RS
              + hb.astype(jnp.float32)).astype(jnp.bfloat16)
    o_ref[:t] = ha.astype(jnp.float32)
    o_ref[t:] = hb.astype(jnp.float32)


def bf16_kernel(x_ref, wf, b, o_ref, *, dual):
    """bf16 control: full resmlp epilogue, f32 acc (fixed from probe 1)."""
    wb = wf  # pre-cast outside

    def one_stream(h):
        for i in range(N_BLOCKS):
            b1 = b[pl.ds(2 * i, 1), :]
            b2 = b[pl.ds(2 * i + 1, 1), :]
            a1 = jnp.dot(h, wb[2 * i], preferred_element_type=jnp.float32)
            t = jnp.maximum(a1 + b1, 0.0).astype(jnp.bfloat16)
            a2 = jnp.dot(t, wb[2 * i + 1],
                         preferred_element_type=jnp.float32)
            h = ((a2 + b2) * RS + h.astype(jnp.float32)).astype(jnp.bfloat16)
        return h

    if dual:
        t = x_ref.shape[0] // 2
        o_ref[:t] = one_stream(x_ref[:t].astype(jnp.bfloat16)).astype(
            jnp.float32)
        o_ref[t:] = one_stream(x_ref[t:].astype(jnp.bfloat16)).astype(
            jnp.float32)
    else:
        o_ref[...] = one_stream(x_ref[...].astype(jnp.bfloat16)).astype(
            jnp.float32)


def make_runner(kern, tile, n_w_arrays, arrays, vmem_mb=None):
    const2 = lambda i: (0, 0)  # noqa: E731
    const3 = lambda i: (0, 0, 0)  # noqa: E731
    specs = [pl.BlockSpec((tile, W), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)]
    for a in arrays:
        idx = const3 if a.ndim == 3 else const2
        specs.append(pl.BlockSpec(a.shape, idx, memory_space=pltpu.VMEM))
    cp = None
    if vmem_mb:
        cp = pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)

    def apply_(x):
        out = pl.pallas_call(
            kern,
            grid=(N_RAYS // tile,),
            in_specs=specs,
            out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_RAYS, W), jnp.float32),
            compiler_params=cp,
        )(x, *arrays)
        return jnp.sum(out)

    return apply_


def main():
    dev = jax.devices()[0]
    log({"name": "device", "kind": str(dev.device_kind)})
    wf, bf = mk_weights()
    wq, m, b = quantize(wf, bf, A_SCALE)
    wb16 = wf.astype(jnp.bfloat16)

    x = jax.random.normal(jax.random.key(1), (N_RAYS, W), jnp.float32)
    x = jax.block_until_ready(x)

    runs = [
        ("int8_resmlp_t1024",
         make_runner(functools.partial(resmlp_kernel, dual=False,
                                       fold=False), 1024, 3, (wq, m, b))),
        ("int8_resmlp_fold_t1024",
         make_runner(functools.partial(resmlp_kernel, dual=False,
                                       fold=True), 1024, 3, (wq, m, b))),
        ("int8_resmlp_t2048",
         make_runner(functools.partial(resmlp_kernel, dual=False,
                                       fold=False), 2048, 3, (wq, m, b))),
        ("int8_resmlp_dual_t1024",
         make_runner(functools.partial(resmlp_kernel, dual=True,
                                       fold=False), 1024, 3, (wq, m, b))),
        ("int8_resmlp_ilv_t1024",
         make_runner(resmlp_kernel_interleaved, 1024, 3, (wq, m, b))),
        ("int8_resmlp_ilv_t2048",
         make_runner(resmlp_kernel_interleaved, 2048, 3, (wq, m, b))),
        ("bf16_resmlp_t1024",
         make_runner(functools.partial(bf16_kernel, dual=False), 1024, 2,
                     (wb16, b))),
        ("bf16_resmlp_dual_t1024",
         make_runner(functools.partial(bf16_kernel, dual=True), 1024, 2,
                     (wb16, b))),
    ]
    for name, fn in runs:
        time_variant(name, fn, x)
    log({"name": "done"})


if __name__ == "__main__":
    main()
