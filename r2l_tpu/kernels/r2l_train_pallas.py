"""Fused R2L TRAINING forward/backward (custom VJP) in Pallas.

Re-implements the gradient path of the reference's distillation step —
the ``NeRF_v3_2`` forward of `model/nerf_raybased.py:480-544` under the
MSE loss + backward of `main.py:1374-1406` — as hand-written TPU kernels
(the reference relies on torch autograd + cuBLAS).

MEASURED RESULT (v5e, canonical 81,920-ray step, exp/probe_train.jsonl):
38.1 ms vs the XLA schedule's 34.1 ms — gradients are EXACT (f32 parity
to 2e-7 vs jax.grad; identical losses step-for-step in bf16) but the
backward hits the same ~50% bf16 matmul ceiling as everything else at
K=N=256, and XLA's own schedule turned out better than the naive
HBM-traffic estimate suggested. Kept as an OPT-IN
(``--fused_train_vjp``): on v5p the MXU:HBM ratio roughly doubles
(459 TF/s vs ~2.8 TB/s), which moves the XLA schedule into the
HBM-bound regime this path avoids. Design:

  * ``train_fwd``: the PE-fused bf16 forward (weights VMEM-resident),
    which also DMAs a compact stash to HBM — per ResMLP block its input
    h_i and its post-ReLU inner activation t_i, plus the head output
    (2*nb + 1 rows of [B, W] bf16 ≈ 3.7 GB for the canonical step).
  * ``train_bwd``: walks the blocks top-down in LAYER GROUPS; each group
    is one Pallas call with grid over ray tiles — dW/db accumulate in a
    REVISITED output block (init at tile 0), dh flows between groups as
    a [B, W] array. Head/tail/PE edges run in XLA (cheap).

``fused_r2l_train_apply`` wraps both in a ``jax.custom_vjp`` whose
primal signature is (params, pts) -> rgb; pts are data (no grad).
Gradients are numerically checked against ``jax.grad`` of ``apply_r2l``
in tests/test_train_pallas.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.r2l import R2LConfig
from .r2l_pallas import (_pe_row_permutation, _pe_sin_cos_ladder, _q8,
                         _round_up, prepare_fused_params_pe)

Array = jax.Array
_LANE = 128
_STASH_RING_DEPTH = 4  # stash DMA ring depth


@functools.partial(jax.jit, static_argnames=("cfg", "dim_pts", "L", "tile",
                                             "interpret"))
def train_fwd(fparams, cfg: R2LConfig, pts: Array, dim_pts: int,
              L: int = 10, tile: int = 512,
              interpret: bool | None = None):
    """PE-fused bf16 forward with an HBM activation stash.

    pts [N, dim_pts] -> (rgb [N, out_dim] f32, stash [2nb+1, N, W] bf16).
    Stash rows: [h_0 (head out / block-0 input), h_1 .. h_{nb-1}
    (block inputs), h_nb (body output, pre-global-residual)] at rows
    0..nb, then t_i (block i's post-ReLU inner activation) at rows
    nb+1+i. Requires the canonical n_learnable == 2 resmlp body.
    """
    assert cfg.n_learnable == 2 and cfg.body_arch == "resmlp"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pts.shape[0]
    in_pad = fparams.head_w.shape[0]
    out_pad = fparams.tail_w.shape[1]
    nb = cfg.num_blocks
    W = cfg.netwidth
    n_pad = _round_up(max(n, 1), tile)
    in_dim = dim_pts * (2 * L + 1)
    cd = fparams.head_w.dtype   # compute dtype follows the packed weights

    if n_pad == n:
        pp = pts.astype(jnp.float32)
    else:
        pp = jnp.zeros((n_pad, dim_pts), jnp.float32)
        pp = pp.at[:n].set(pts.astype(jnp.float32))

    n_stash = 2 * nb + 1

    NSLOT = _STASH_RING_DEPTH  # (immediate waits cost ~0.65 us each)

    def kern(p_ref, head_w, head_b, body_w, body_b, tail_w, tail_b,
             o_ref, stash_ref, bufs, sems):
        i = pl.program_id(0)
        p = p_ref[...]
        sins, coss = _pe_sin_cos_ladder(p, L)
        parts = [s.astype(cd) for s in sins]
        parts += [c.astype(cd) for c in coss]
        parts.append(p.astype(cd))
        pad = in_pad - in_dim
        if pad:
            parts.append(jnp.zeros((p.shape[0], pad), cd))
        x = jnp.concatenate(parts, axis=1)

        def mm(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32)

        counter = [0]

        def stash(row, val, _unused=None):
            """Deferred-wait DMA ring: wait for the copy NSLOT stashes ago,
            reuse its buffer, kick the new copy."""
            c = counter[0]
            slot = c % NSLOT
            if c >= NSLOT:
                pltpu.make_async_copy(bufs.at[slot], bufs.at[slot],
                                      sems.at[slot]).wait()
            bufs[slot] = val
            pltpu.make_async_copy(
                bufs.at[slot], stash_ref.at[row, pl.ds(i * tile, tile), :],
                sems.at[slot]).start()
            counter[0] = c + 1

        def stash_drain():
            c = counter[0]
            for k in range(min(NSLOT, c)):
                slot = (c - 1 - k) % NSLOT
                pltpu.make_async_copy(bufs.at[slot], bufs.at[slot],
                                      sems.at[slot]).wait()

        h0 = jnp.maximum(mm(x, head_w[...]) + head_b[...], 0.0).astype(cd)
        stash(0, h0, 0)
        h = h0
        for b in range(nb):
            t1 = mm(h, body_w[2 * b]) + body_b[pl.ds(2 * b, 1), :]
            t1r = jnp.maximum(t1, 0.0).astype(cd)
            stash(nb + 1 + b, t1r, 1)
            t2 = mm(t1r, body_w[2 * b + 1]) + body_b[pl.ds(2 * b + 1, 1), :]
            h = (t2 * cfg.res_scale
                 + h.astype(jnp.float32)).astype(cd)
            stash(b + 1, h, 0)
        hf = h.astype(jnp.float32)
        if cfg.use_residual:
            hf = hf + h0.astype(jnp.float32)
        out = mm(hf.astype(cd), tail_w[...]) + tail_b[...]
        if not cfg.linear_tail:
            out = jax.nn.sigmoid(out)
        o_ref[...] = out
        stash_drain()

    nbl = fparams.body_w.shape[0]
    const = lambda i: (0, 0)  # noqa: E731
    rgb, stash = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, dim_pts), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_pad, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, out_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, out_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_stash, n_pad, W), cd),
        ),
        scratch_shapes=[pltpu.VMEM((_STASH_RING_DEPTH, tile, W), cd),
                        pltpu.SemaphoreType.DMA((_STASH_RING_DEPTH,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pp, fparams.head_w, fparams.head_b, fparams.body_w, fparams.body_b,
      fparams.tail_w, fparams.tail_b)
    return rgb[:n, :cfg.output_dim], stash


@functools.partial(jax.jit, static_argnames=("cfg", "dim_pts", "L", "tile",
                                             "interpret", "stash_q"))
def train_fwd_int8(fp, cfg: R2LConfig, pts: Array, dim_pts: int,
                   L: int = 10, tile: int = 512,
                   interpret: bool | None = None, stash_q: bool = False):
    """Static-scale int8 TRAINING forward with the same bf16 HBM
    activation stash contract as ``train_fwd`` (rows h_0..h_nb then t_i).

    The round-3 MFU experiment (VERDICT r2 Next #6): run the forward
    matmuls at the MXU's 2x int8 rate — the quantization noise perturbs
    the distill loss like data augmentation — while the backward consumes
    the (dequantized) stashed activations with bf16 weights, i.e. a
    straight-through gradient at the quantized forward's activations.
    ``fp`` must come from ``calibrate_r2l_int8_pe`` on the CURRENT
    params (re-calibrated as they drift; see make_fused_train_apply).

    ``stash_q=True``: stash the int8 Q VALUES the forward already
    computes instead of bf16 dequants — HALVES the stash HBM traffic
    (the measured bound on the training forward, PERF.md). Contract
    changes: stash dtype int8; row nb holds the quantized TAIL input
    (h + global residual, scale 1/tail_inv) rather than the
    pre-residual body output; rows 0..nb-1 quantized with
    1/body_inv[2b], t rows with 1/body_inv[2b+1]. The backward must
    dequantize with the same scales (``bwd_group(body_scale=...)``).
    """
    assert cfg.n_learnable == 2 and cfg.body_arch == "resmlp"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pts.shape[0]
    in_pad = fp.head_q.shape[0]
    out_pad = fp.tail_q.shape[1]
    nb = cfg.num_blocks
    W = cfg.netwidth
    n_pad = _round_up(max(n, 1), tile)
    in_dim = dim_pts * (2 * L + 1)
    cd = jnp.bfloat16
    NSLOT = _STASH_RING_DEPTH

    if n_pad == n:
        pp = pts.astype(jnp.float32)
    else:
        pp = jnp.zeros((n_pad, dim_pts), jnp.float32)
        pp = pp.at[:n].set(pts.astype(jnp.float32))

    n_stash = 2 * nb + 1

    def kern(p_ref, head_q, head_m, head_b, head_inv, body_q, body_m,
             body_b, body_inv, tail_q, tail_m, tail_b, tail_inv,
             o_ref, stash_ref, bufs, sems):
        i = pl.program_id(0)
        p = p_ref[...]
        sins, coss = _pe_sin_cos_ladder(p, L)
        parts = []
        for j in range(L):
            parts.append(_q8(sins[j], head_inv[:, pl.ds(j * dim_pts,
                                                        dim_pts)]))
        for j in range(L):
            parts.append(_q8(coss[j], head_inv[:, pl.ds((L + j) * dim_pts,
                                                        dim_pts)]))
        parts.append(_q8(p, head_inv[:, pl.ds(2 * L * dim_pts, dim_pts)]))
        pad = in_pad - in_dim
        if pad:
            parts.append(jnp.zeros((p.shape[0], pad), jnp.int8))
        xq = jnp.concatenate(parts, axis=1)

        counter = [0]

        def stash(row, val):
            c = counter[0]
            slot = c % NSLOT
            if c >= NSLOT:
                pltpu.make_async_copy(bufs.at[slot], bufs.at[slot],
                                      sems.at[slot]).wait()
            bufs[slot] = val
            pltpu.make_async_copy(
                bufs.at[slot], stash_ref.at[row, pl.ds(i * tile, tile), :],
                sems.at[slot]).start()
            counter[0] = c + 1

        def stash_drain():
            c = counter[0]
            for k in range(min(NSLOT, c)):
                slot = (c - 1 - k) % NSLOT
                pltpu.make_async_copy(bufs.at[slot], bufs.at[slot],
                                      sems.at[slot]).wait()

        acc = jnp.dot(xq, head_q[...], preferred_element_type=jnp.int32)
        h0f = jnp.maximum(acc.astype(jnp.float32) * head_m[...]
                          + head_b[...], 0.0)
        if stash_q:
            h = h0f               # no bf16 bounce: nothing bf16 is stashed
        else:
            h = h0f.astype(cd)
            stash(0, h)
        for b in range(nb):
            idx = 2 * b
            q = _q8(h.astype(jnp.float32), body_inv[pl.ds(idx, 1), :])
            if stash_q:
                stash(b, q)       # the q the matmul consumes IS the stash
            acc = jnp.dot(q, body_q[idx], preferred_element_type=jnp.int32)
            t1r = jnp.maximum(acc.astype(jnp.float32)
                              * body_m[pl.ds(idx, 1), :]
                              + body_b[pl.ds(idx, 1), :], 0.0)
            if not stash_q:
                t1r = t1r.astype(cd)
            q = _q8(t1r.astype(jnp.float32),
                    body_inv[pl.ds(idx + 1, 1), :])
            stash(nb + 1 + b, q if stash_q else t1r)
            acc = jnp.dot(q, body_q[idx + 1],
                          preferred_element_type=jnp.int32)
            # res_scale folded into the block tail's m/b at calibration
            t2 = (acc.astype(jnp.float32) * body_m[pl.ds(idx + 1, 1), :]
                  + body_b[pl.ds(idx + 1, 1), :])
            if stash_q:
                h = t2 + h
            else:
                h = (t2 + h.astype(jnp.float32)).astype(cd)
                stash(b + 1, h)
        hf = h.astype(jnp.float32)
        if cfg.use_residual:
            hf = hf + h0f
        q = _q8(hf, tail_inv[...])
        if stash_q:
            stash(nb, q)          # quantized TAIL input (residual included)
        acc = jnp.dot(q, tail_q[...], preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * tail_m[...] + tail_b[...]
        if not cfg.linear_tail:
            out = jax.nn.sigmoid(out)
        o_ref[...] = out
        stash_drain()

    nbl = fp.body_q.shape[0]
    const = lambda i: (0, 0)  # noqa: E731
    rgb, stash = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, dim_pts), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_pad, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, in_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, out_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, out_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_stash, n_pad, W),
                                 jnp.int8 if stash_q else cd),
        ),
        scratch_shapes=[pltpu.VMEM((_STASH_RING_DEPTH, tile, W),
                                   jnp.int8 if stash_q else cd),
                        pltpu.SemaphoreType.DMA((_STASH_RING_DEPTH,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pp, fp.head_q, fp.head_m, fp.head_b, fp.head_inv, fp.body_q,
      fp.body_m, fp.body_b, fp.body_inv, fp.tail_q, fp.tail_m, fp.tail_b,
      fp.tail_inv)
    return rgb[:n, :cfg.output_dim], stash


@functools.partial(jax.jit, static_argnames=("cfg", "b_start", "b_count",
                                             "tile", "interpret"))
def bwd_group(body_w: Array, stash: Array, dh_in: Array, cfg: R2LConfig,
              b_start: int, b_count: int, tile: int = 512,
              interpret: bool | None = None,
              body_scale: Array | None = None):
    """Backward through blocks [b_start, b_start+b_count) (descending
    order inside), accumulating weight/bias grads across ray tiles in a
    REVISITED output block.

    body_w [2nb, W, W], stash from train_fwd, dh_in [N_pad, W] f32
    (grad wrt block b_start+b_count-1's OUTPUT). Returns
    (dh_out [N_pad, W] f32, dW [2*b_count, W, W] f32, db [2*b_count, W]).

    ``body_scale`` [2nb, W] f32 (= 1/body_inv from the int8 calibration)
    switches to the int8-stash contract of ``train_fwd_int8(stash_q=
    True)``: stash row b holds the QUANTIZED block-b input, row nb+1+b
    the quantized inner activation; the kernel dequantizes in-VMEM —
    HALF the stash HBM reads of the bf16 contract.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb = cfg.num_blocks
    W = cfg.netwidth
    n_pad = dh_in.shape[0]
    rs = cfg.res_scale
    cd = body_w.dtype           # compute dtype follows the weights
    quant = body_scale is not None

    # contraction helpers: rows-contracted (activation^T @ grad) and
    # transposed-weight matmul, both as dot_general (no explicit
    # transposes in VMEM)
    def rowsT(a, b):     # [T, W]^T @ [T, W] -> [W, W]
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def mm_wT(a, w):     # a @ w^T via contraction on w's last axis
        return jax.lax.dot_general(a, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def kern(w_ref, dh_ref, *refs):
        h_refs = refs[:b_count]            # block inputs, ascending
        t_refs = refs[b_count:2 * b_count]  # inner activations, ascending
        rest = refs[2 * b_count:]
        if quant:
            sc_ref, rest = rest[0], rest[1:]   # [2*b_count, W] f32
        dh_out_ref, dw_ref, db_ref = rest
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        dh = dh_ref[...]                                   # [T, W] f32
        for k in range(b_count - 1, -1, -1):
            li = 2 * k                    # local layer index (fc1 of blk)
            if quant:
                h_in = (h_refs[k][...].astype(jnp.float32)
                        * sc_ref[pl.ds(li, 1), :]).astype(cd)
                t1f = (t_refs[k][...].astype(jnp.float32)
                       * sc_ref[pl.ds(li + 1, 1), :])
                t1r = t1f.astype(cd)
                mask = t1f > 0.0
            else:
                h_in = h_refs[k][...]                      # [T, W] bf16
                t1r = t_refs[k][...]                       # [T, W] bf16
                # mask in f32: Mosaic rejects bf16 vector compares
                mask = t1r.astype(jnp.float32) > 0.0
            dt2 = (dh * rs).astype(cd)
            # fc2: t2 = t1r @ W2 + b2
            dw_ref[li + 1] += rowsT(t1r, dt2)
            db_ref[pl.ds(li + 1, 1), :] += jnp.sum(
                dt2.astype(jnp.float32), axis=0, keepdims=True)
            dt1r = mm_wT(dt2, w_ref[li + 1])               # [T, W] f32
            dt1 = jnp.where(mask, dt1r, 0.0).astype(cd)
            # fc1: t1 = h_in @ W1 + b1
            dw_ref[li] += rowsT(h_in, dt1)
            db_ref[pl.ds(li, 1), :] += jnp.sum(
                dt1.astype(jnp.float32), axis=0, keepdims=True)
            # residual: h_out = t2*rs + h_in
            dh = dh + mm_wT(dt1, w_ref[li])
        dh_out_ref[...] = dh

    const = lambda i: (0, 0)  # noqa: E731
    w_slice = jax.lax.dynamic_slice_in_dim(body_w, 2 * b_start,
                                           2 * b_count).astype(cd)
    in_specs = [
        pl.BlockSpec((2 * b_count, W, W), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, W), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [w_slice, dh_in]
    for b in range(b_start, b_start + b_count):   # block inputs h_b
        in_specs.append(pl.BlockSpec((tile, W), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(stash[b])
    for b in range(b_start, b_start + b_count):   # inner t1r_b
        in_specs.append(pl.BlockSpec((tile, W), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(stash[nb + 1 + b])
    if quant:
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


def make_fused_train_apply(cfg: R2LConfig, dim_pts: int, L: int = 10,
                           tile: int = 512, group_blocks: int = 4,
                           compute_dtype=jnp.bfloat16,
                           interpret: bool | None = None,
                           quantize: str = "",
                           calib_pts: Array | None = None,
                           stash_q: bool = True,
                           external_calib: bool = False):
    """Build ``apply(params, pts) -> rgb`` with a fused Pallas VJP.

    The primal runs ``train_fwd`` (one fused pass + activation stash);
    the cotangent walks the body top-down through ``bwd_group`` calls of
    ``group_blocks`` blocks each, with the tail/head/PE edges in XLA.
    ``pts`` are data: their cotangent is zero. Gradients match
    ``jax.grad`` of ``apply_r2l`` (tests/test_train_pallas.py).

    ``quantize='int8'`` (requires ``calib_pts`` [n, dim_pts]): the
    forward runs ``train_fwd_int8`` at the MXU's 2x int8 rate, with the
    static activation scales RE-CALIBRATED from the live params inside
    every step (params drift during training; the calibration forward
    over calib_pts is a small f32 pass). Backward is the same bf16 walk
    over the stashed (dequantized) activations — a straight-through
    gradient. Accuracy impact is measured on the verify scene (PERF.md).

    ``external_calib`` (int8 only): returns ``(apply_fp, calibrate)``
    instead, where ``apply_fp(params, pts, fp)`` consumes a
    pre-calibrated ``FusedParamsInt8PE`` and ``calibrate(params) -> fp``
    packs one from live params. Lets the caller hoist the per-step
    recalibration (a measured ~1.2 ms, PERF.md r3 decomp) OUT of a
    ``lax.scan`` over K steps: calibrate once per dispatch, scales at
    most K-1 steps stale. ``params`` still feeds the backward (the bf16
    weight walk), so gradients flow to the live weights as before.

    ``stash_q`` (int8 only, default on): stash the int8 q-values the
    forward already computes instead of bf16 dequants — halves the
    stash HBM traffic, the measured bound on the fused training step
    (PERF.md r3). The backward dequantizes in-VMEM with the same
    calibration scales, so the straight-through gradient is taken at
    exactly the activations the quantized forward consumed.
    """
    assert cfg.n_learnable == 2 and cfg.body_arch == "resmlp"
    assert cfg.act == "relu" and cfg.inact == "relu" and cfg.outact == "none"
    # the stash DMA ring slices [1, tile, W] buffers: the lane dim must be
    # tiling-aligned on real hardware (interpret mode does not care —
    # CPU tests run small widths)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret:
        assert cfg.netwidth % _LANE == 0, (
            f"fused_train_vjp needs netwidth % {_LANE} == 0 (got "
            f"{cfg.netwidth}) — the stash DMA lane dim must be "
            "tile-aligned")
        assert tile % 8 == 0, f"tile must be sublane-aligned (got {tile})"
        if quantize == "int8" and stash_q:
            assert tile % 32 == 0, (
                f"int8 stash needs tile % 32 == 0 (got {tile}) — int8 "
                "VMEM tiling is (32, 128)")
    nb = cfg.num_blocks
    W = cfg.netwidth
    out_dim = cfg.output_dim
    perm = _pe_row_permutation(dim_pts, L)
    inv_perm = np.argsort(perm)
    wd = compute_dtype

    def _freq_major_embed(pts):
        """The kernel's freq-major embedding, in XLA (head-grad edge)."""
        p = pts.astype(jnp.float32)
        sins, coss = _pe_sin_cos_ladder(p, L)
        return jnp.concatenate(sins + coss + [p], axis=1)

    int8 = quantize == "int8"
    if int8:
        assert calib_pts is not None, "int8 training needs calib_pts"
        from .r2l_pallas import calibrate_r2l_int8_pe
        calib_const = jnp.asarray(np.asarray(calib_pts), jnp.float32)

    sq = bool(int8 and stash_q)

    def _run_fwd(params, pts):
        """-> (rgb, stash, scales) — scales (body [2nb,W], tail [1,W])
        dequant multipliers when the stash is int8, else None."""
        if int8:
            fp = calibrate_r2l_int8_pe(params, cfg, dim_pts, L,
                                       calib_pts=calib_const)
            rgb, stash = train_fwd_int8(fp, cfg, pts, dim_pts, L,
                                        tile=tile, interpret=interpret,
                                        stash_q=sq)
            scales = ((1.0 / fp.body_inv, 1.0 / fp.tail_inv)
                      if sq else None)
            return rgb, stash, scales
        fp = prepare_fused_params_pe(params, cfg, dim_pts, L,
                                     weight_dtype=wd)
        rgb, stash = train_fwd(fp, cfg, pts, dim_pts, L, tile=tile,
                               interpret=interpret)
        return rgb, stash, None

    @jax.custom_vjp
    def apply_(params, pts):
        rgb, _, _ = _run_fwd(params, pts)
        return rgb

    def fwd(params, pts):
        rgb, stash, scales = _run_fwd(params, pts)
        return rgb, (params, pts, stash, rgb, scales)

    def bwd(res, d_rgb):
        params, pts, stash, rgb, scales = res
        return _bwd_core(params, pts, stash, rgb, scales, d_rgb)

    def _bwd_core(params, pts, stash, rgb, scales, d_rgb):
        n = pts.shape[0]
        n_pad = stash.shape[1]
        cd = wd

        body_w = params["body"]["w"].reshape(2 * nb, W, W).astype(cd)

        # ---- tail edge (XLA) ----
        if scales is not None:
            # int8-stash contract: row nb is the quantized TAIL input
            # with the global residual already folded in.
            body_scale, tail_scale = scales
            hf = stash[nb].astype(jnp.float32) * tail_scale
        else:
            body_scale = None
            hf = stash[nb].astype(jnp.float32)
            if cfg.use_residual:
                hf = hf + stash[0].astype(jnp.float32)
        d_out = d_rgb.astype(jnp.float32)
        if not cfg.linear_tail:
            d_out = d_out * rgb * (1.0 - rgb)   # sigmoid'
        d_out_pad = jnp.zeros((n_pad, out_dim), jnp.float32)
        d_out_pad = d_out_pad.at[:n].set(d_out)
        hf_b = hf.astype(cd)
        d_tw = jax.lax.dot_general(
            hf_b, d_out_pad.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [W, out_dim]
        d_tb = jnp.sum(d_out_pad, axis=0)
        dh = jax.lax.dot_general(
            d_out_pad.astype(cd),
            params["tail"]["w"].astype(cd),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [n_pad, W]
        dh0_extra = dh if cfg.use_residual else None

        # ---- body groups (fused Pallas), top-down ----
        dws, dbs = [None] * nb, [None] * nb
        b = nb
        while b > 0:
            cnt = min(group_blocks, b)
            b -= cnt
            dh, dw_g, db_g = bwd_group(body_w, stash, dh, cfg, b, cnt,
                                       tile=tile, interpret=interpret,
                                       body_scale=body_scale)
            for k in range(cnt):
                dws[b + k] = dw_g[2 * k:2 * k + 2]
                dbs[b + k] = db_g[2 * k:2 * k + 2]
        d_body_w = jnp.stack(dws).reshape(nb, 2, W, W)
        d_body_b = jnp.stack(dbs).reshape(nb, 2, W)

        # ---- head + PE edge (XLA) ----
        if dh0_extra is not None:
            dh = dh + dh0_extra
        d_pre = jnp.where(stash[0] > 0, dh, 0.0)         # relu'
        pp = jnp.zeros((n_pad, dim_pts), jnp.float32).at[:n].set(
            pts.astype(jnp.float32))
        x_fm = _freq_major_embed(pp).astype(cd)          # [n_pad, in_dim]
        d_hw_fm = jax.lax.dot_general(
            x_fm, d_pre.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [in_dim, W]
        d_hw = d_hw_fm[jnp.asarray(inv_perm)]            # pytree row order
        d_hb = jnp.sum(d_pre, axis=0)

        def like(g, p):
            return g.astype(p.dtype)

        d_params = {
            "head": {"w": like(d_hw, params["head"]["w"]),
                     "b": like(d_hb, params["head"]["b"])},
            "body": {"w": like(d_body_w, params["body"]["w"]),
                     "b": like(d_body_b, params["body"]["b"])},
            "tail": {"w": like(d_tw[:, :out_dim], params["tail"]["w"]),
                     "b": like(d_tb[:out_dim], params["tail"]["b"])},
        }
        return d_params, jnp.zeros_like(pts)

    apply_.defvjp(fwd, bwd)
    if not external_calib:
        return apply_

    # --- external-calibration mode: fp is an explicit (non-diff) arg ---
    assert int8, "external_calib requires quantize='int8'"
    import numpy as _np

    def calibrate(params):
        return calibrate_r2l_int8_pe(params, cfg, dim_pts, L,
                                     calib_pts=calib_const)

    def _fwd_fp(params, pts, fp):
        rgb, stash = train_fwd_int8(fp, cfg, pts, dim_pts, L,
                                    tile=tile, interpret=interpret,
                                    stash_q=sq)
        scales = ((1.0 / fp.body_inv, 1.0 / fp.tail_inv) if sq else None)
        return rgb, stash, scales

    @jax.custom_vjp
    def apply_fp(params, pts, fp):
        rgb, _, _ = _fwd_fp(params, pts, fp)
        return rgb

    def fwd_fp(params, pts, fp):
        rgb, stash, scales = _fwd_fp(params, pts, fp)
        return rgb, (params, pts, fp, stash, rgb, scales)

    def bwd_fp(res, d_rgb):
        params, pts, fp, stash, rgb, scales = res
        d_params, d_pts = _bwd_core(params, pts, stash, rgb, scales, d_rgb)
        # fp is packed calibration data, never differentiated: float0
        # cotangents for integer leaves, zeros for the float ones.
        d_fp = jax.tree.map(
            lambda x: _np.zeros(x.shape, jax.dtypes.float0)
            if jnp.issubdtype(x.dtype, jnp.integer) else jnp.zeros_like(x),
            fp)
        return d_params, d_pts, d_fp

    apply_fp.defvjp(fwd_fp, bwd_fp)
    return apply_fp, calibrate
