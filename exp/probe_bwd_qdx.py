"""int8 dL/dx backward probe — can the dx half of the backward walk run
at the int8 MXU rate?

The fused backward (kernels/r2l_train_pallas.py::bwd_group) is ~17 ms of
the 24.4 ms int8 training step; its FLOPs split evenly between dW
(x^T @ g, accuracy-critical, stays bf16) and dx (g @ W^T). The weights
are ALREADY int8 (fp.body_q, per-out-column scales with the input scale
absorbed), so dx can run int8 if the gradient is quantized per tile:

  w_ij = (w_q[i,j] / q_j) * (1 / inv_i)           (calibration algebra)
  dx_i = sum_j g_j w_ij
       = (1/inv_i)^-1 ...                         fold per-col 1/q_j = m_j
  u_j  = g_j * m_j;  s = 127/max|u|;  u_q = round(u*s)
  dx   = (u_q @ w_q^T) * (1/(inv * s))            per-channel inv, scalar s

(the res_scale folded into block-tail m is exactly the rs factor the
bf16 path multiplies separately, so u = dh * m_full needs no extra rs).
dW keeps the bf16 contraction over the dequantized stash; the quantized
dt1r only enters dW1 through the relu mask + dt1, i.e. this adds
~0.8%-scale noise to half the weight gradients.

RESULT (r3_qdx_* in exp/probe_train.jsonl): **NEGATIVE on accuracy,
timing never pursued.** A numpy error model at canonical width (T=2048,
W=256, heavy-tailed gradients) caps the per-layer dx cosine at 0.972
with a per-tile scalar scale and 0.984 with per-ROW scales; the
production gradient bar is >0.99 per leaf across the WHOLE 86-layer
walk (the int8-stash experiment's contract), and the interpret-mode
4-block walk confirms the compounding (cos_dh 0.90, min dW-group cos
0.74). Root cause: gradients are heavy-tailed and int8's 7 magnitude
bits cannot span their dynamic range — the formats that work for
backward quantization in practice are exponent-heavy (fp8 E5M2 /
per-block exponents), which the v5e MXU does not implement. The dx
half of the backward stays bf16; this file is kept as the record of
the attempt.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from r2l_tpu.kernels.r2l_pallas import calibrate_r2l_int8_pe
from r2l_tpu.kernels.r2l_train_pallas import bwd_group, train_fwd_int8
from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler

OUT = "exp/probe_train.jsonl"


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def bwd_group_qdx(body_w, body_q, body_m, stash, dh_in, cfg, b_start,
                  b_count, tile=512, interpret=None, body_scale=None):
    """bwd_group variant: dx matmuls int8 (dW stays bf16).

    Extra operands vs bwd_group: body_q [2nb, W, W] int8 and body_m
    [2nb, W] f32 from the SAME calibration that quantized the forward.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb = cfg.num_blocks
    W = cfg.netwidth
    n_pad = dh_in.shape[0]
    rs = cfg.res_scale
    cd = body_w.dtype
    quant = body_scale is not None
    assert quant, "qdx probe runs on the int8-stash contract"

    def rowsT(a, b):
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def mm_wT_q(u, wq):
        """int8 u [T, W] @ wq [W, W]^T -> int32 [T, W]."""
        return jax.lax.dot_general(u, wq, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def kern(w_ref, q_ref, m_ref, dh_ref, *refs):
        h_refs = refs[:b_count]
        t_refs = refs[b_count:2 * b_count]
        rest = refs[2 * b_count:]
        sc_ref, rest = rest[0], rest[1:]
        dh_out_ref, dw_ref, db_ref = rest
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def qdx(g, li):
            """int8 dx: g [T, W] f32 grad wrt layer li's OUTPUT ->
            [T, W] f32 grad wrt its INPUT (m/q from calibration)."""
            u = g * m_ref[pl.ds(li, 1), :]
            s = 127.0 / (jnp.max(jnp.abs(u)) + 1e-30)
            uq = jnp.round(u * s).clip(-127, 127).astype(jnp.int8)
            acc = mm_wT_q(uq, q_ref[li])
            inv = sc_ref[pl.ds(li, 1), :]   # sc = 1/inv_in = dequant scale
            return acc.astype(jnp.float32) * (inv / s)

        dh = dh_ref[...]
        for k in range(b_count - 1, -1, -1):
            li = 2 * k
            h_in = (h_refs[k][...].astype(jnp.float32)
                    * sc_ref[pl.ds(li, 1), :]).astype(cd)
            t1f = (t_refs[k][...].astype(jnp.float32)
                   * sc_ref[pl.ds(li + 1, 1), :])
            t1r = t1f.astype(cd)
            mask = t1f > 0.0
            dt2 = (dh * rs).astype(cd)
            dw_ref[li + 1] += rowsT(t1r, dt2)
            db_ref[pl.ds(li + 1, 1), :] += jnp.sum(
                dt2.astype(jnp.float32), axis=0, keepdims=True)
            # int8 dx through fc2 (m includes rs for block tails, which
            # is exactly the dh*rs factor -> feed raw dh)
            dt1r = qdx(dh, li + 1)
            dt1 = jnp.where(mask, dt1r, 0.0).astype(cd)
            dw_ref[li] += rowsT(h_in, dt1)
            db_ref[pl.ds(li, 1), :] += jnp.sum(
                dt1.astype(jnp.float32), axis=0, keepdims=True)
            # int8 dx through fc1
            dh = dh + qdx(jnp.where(mask, dt1r, 0.0), li)
        dh_out_ref[...] = dh

    const = lambda i: (0, 0)  # noqa: E731
    w_slice = jax.lax.dynamic_slice_in_dim(body_w, 2 * b_start,
                                           2 * b_count).astype(cd)
    q_slice = jax.lax.dynamic_slice_in_dim(body_q, 2 * b_start, 2 * b_count)
    m_slice = jax.lax.dynamic_slice_in_dim(body_m, 2 * b_start,
                                           2 * b_count).astype(jnp.float32)
    in_specs = [
        pl.BlockSpec((2 * b_count, W, W), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * b_count, W, W), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * b_count, W), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, W), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [w_slice, q_slice, m_slice, dh_in]
    nb_ = cfg.num_blocks
    for b in range(b_start, b_start + b_count):
        in_specs.append(pl.BlockSpec((tile, W), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(stash[b])
    for b in range(b_start, b_start + b_count):
        in_specs.append(pl.BlockSpec((tile, W), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(stash[nb_ + 1 + b])
    in_specs.append(pl.BlockSpec((2 * b_count, W), const,
                                 memory_space=pltpu.VMEM))
    operands.append(jax.lax.dynamic_slice_in_dim(
        body_scale, 2 * b_start, 2 * b_count).astype(jnp.float32))

    dh_out, dw, db = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tile, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * b_count, W, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * b_count, W), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, W), jnp.float32),
            jax.ShapeDtypeStruct((2 * b_count, W, W), jnp.float32),
            jax.ShapeDtypeStruct((2 * b_count, W), jnp.float32),
        ),
        interpret=interpret,
    )(*operands)
    return dh_out, dw, db


def walk(variant, cfg, body_w, fp, stash, dh0, gb, tile):
    """Full top-down group walk, returns (dh, dW_stack_sum_checksum)."""
    nb = cfg.num_blocks
    body_scale = 1.0 / fp.body_inv
    dh = dh0
    dws = []
    b = nb
    while b > 0:
        cnt = min(gb, b)
        b -= cnt
        if variant == "qdx":
            dh, dw_g, db_g = bwd_group_qdx(
                body_w, fp.body_q, fp.body_m, stash, dh, cfg, b, cnt,
                tile=tile, body_scale=body_scale)
        else:
            dh, dw_g, db_g = bwd_group(body_w, stash, dh, cfg, b, cnt,
                                       tile=tile, body_scale=body_scale)
        dws.append(dw_g)
    return dh, dws


def main():
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    B, tile, gb = 81920, 512, 4
    pts = jax.block_until_ready(
        jax.random.uniform(jax.random.key(4), (B, 48), jnp.float32,
                           -1.0, 1.0))
    sub = PointSampler(H=32, W=32, focal=555.555 / 12.5, n_sample=16,
                       near=2.0, far=6.0)
    calib = jnp.concatenate([
        sub.sample_test(jnp.asarray(
            np.asarray(pose_spherical(t, -30.0, 4.0))[:3, :4]))
        for t in (0.0, 90.0, 180.0, 270.0)])

    log({"probe": "bwd_qdx", "device": str(jax.devices()[0]),
         "ts": time.time()})

    fp = jax.jit(lambda p: calibrate_r2l_int8_pe(
        p, cfg, 48, 10, calib_pts=calib))(params)
    _, stash = jax.jit(lambda f, x: train_fwd_int8(
        f, cfg, x, 48, 10, tile=tile, stash_q=True))(fp, pts)
    stash = jax.block_until_ready(stash)
    body_w = params["body"]["w"].reshape(2 * cfg.num_blocks, cfg.netwidth,
                                         cfg.netwidth).astype(jnp.bfloat16)
    dh0 = jax.block_until_ready(jax.random.normal(
        jax.random.key(7), (stash.shape[1], cfg.netwidth), jnp.float32)
        * 1e-3)

    fns = {}
    for variant in ("bf16", "qdx"):
        fns[variant] = jax.jit(lambda dh, v=variant: walk(
            v, cfg, body_w, fp, stash, dh, gb, tile))

    # accuracy: cosine of dh_out and dW vs the bf16 walk
    dh_b, dws_b = fns["bf16"](dh0)
    dh_q, dws_q = fns["qdx"](dh0)

    def cos(a, b):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        return float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b),
                                 1e-30))
    cos_dh = cos(dh_q, dh_b)
    cos_dw = min(cos(q, b) for q, b in zip(dws_q, dws_b))
    log({"name": "r3_qdx_cosine", "cos_dh": round(cos_dh, 5),
         "min_cos_dw_group": round(cos_dw, 5)})

    # timing: N walks enqueued, one readback
    N = 20
    for variant in ("bf16", "qdx"):
        f = fns[variant]
        dh, _ = f(dh0)
        float(jnp.sum(dh))
        t0 = time.perf_counter()
        for _ in range(N):
            dh, dws = f(dh0)
        float(jnp.sum(dh))
        ms = 1000.0 * (time.perf_counter() - t0) / N
        log({"name": f"r3_qdx_walk_{variant}", "ms": round(ms, 2),
             "tile": tile, "gb": gb})

    log({"probe": "bwd_qdx_done", "ts": time.time()})


if __name__ == "__main__":
    main()
