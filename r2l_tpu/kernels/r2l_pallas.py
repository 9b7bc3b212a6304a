"""Fused R2L light-field forward as a single Pallas TPU kernel.

The R2L student (reference `model/nerf_raybased.py:480-544`) is a deep
residual MLP: head Linear+ReLU, ``n_block`` ResMLP blocks (two WxW linears,
ReLU between, scaled residual add), tail Linear+Sigmoid, plus a global
residual. Canonical W=256/D=88 weights are ~11 MB in bf16 — they fit in
VMEM. This kernel grids over ray tiles: each grid step DMAs one
[TILE, input_dim] tile of embedded rays into VMEM, runs ALL 88 layers
on-chip (f32 MXU accumulation), and writes [TILE, 128] RGB (3 used lanes).

HBM traffic per 400x400 frame drops from ~21 GB (XLA schedule: the
[160k, 256] activation matrix round-trips HBM between every layer) to
~0.4 GB (embedded inputs + outputs + one weight fetch), turning the frame
from HBM-bound into MXU-bound.

Weight/bias refs use constant index maps, so Mosaic fetches them once and
keeps them VMEM-resident across all grid steps.
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

Array = jax.Array

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedParams(NamedTuple):
    """Kernel-layout parameters (padded, stacked, cast)."""
    head_w: Array   # [in_pad, W]   weight dtype (bf16 by default)
    head_b: Array   # [1, W]        f32
    body_w: Array   # [nb*nl, W, W] weight dtype
    body_b: Array   # [nb*nl, W]    f32
    tail_w: Array   # [W, 128]      weight dtype (out_dim used lanes)
    tail_b: Array   # [1, 128]      f32


def prepare_fused_params(params: dict, cfg: R2LConfig,
                         weight_dtype=jnp.bfloat16) -> FusedParams:
    """Pack an r2l param pytree into the kernel layout.

    Zero-pads the head input dim to a lane multiple (mathematically a
    no-op because the input is padded with zeros the same way) and the
    tail output dim to one 128-lane register.
    """
    _assert_fused_supported(cfg)
    in_dim = params["head"]["w"].shape[0]
    in_pad = _round_up(in_dim, _LANE)
    W = cfg.netwidth
    nb, nl = cfg.num_blocks, cfg.n_learnable

    head_w = jnp.zeros((in_pad, W), weight_dtype)
    head_w = head_w.at[:in_dim].set(params["head"]["w"].astype(weight_dtype))
    head_b = params["head"]["b"].astype(jnp.float32).reshape(1, W)

    body_w = params["body"]["w"].reshape(nb * nl, W, W).astype(weight_dtype)
    body_b = params["body"]["b"].reshape(nb * nl, W).astype(jnp.float32)

    out_dim = params["tail"]["w"].shape[1]
    out_pad = _round_up(out_dim, _LANE)
    tail_w = jnp.zeros((W, out_pad), weight_dtype)
    tail_w = tail_w.at[:, :out_dim].set(params["tail"]["w"].astype(weight_dtype))
    tail_b = jnp.zeros((1, out_pad), jnp.float32)
    tail_b = tail_b.at[0, :out_dim].set(params["tail"]["b"].astype(jnp.float32))
    return FusedParams(head_w, head_b, body_w, body_b, tail_w, tail_b)


def _assert_fused_supported(cfg: R2LConfig) -> None:
    """The fused kernels hardcode the canonical activations (ReLU head/
    in-block, no block out-activation). Other configs must use the jnp
    path (``apply_r2l``) — callers like ``make_r2l_frame_fn`` fall back."""
    if not fused_kernel_supported(cfg):
        raise NotImplementedError(
            f"fused kernel supports act/inact='relu', outact='none', "
            f"body_arch='resmlp'; got act={cfg.act!r} inact={cfg.inact!r} "
            f"outact={cfg.outact!r} body_arch={cfg.body_arch!r}")


def fused_kernel_supported(cfg: R2LConfig) -> bool:
    return (cfg.act == "relu" and cfg.inact == "relu"
            and cfg.outact == "none" and cfg.body_arch == "resmlp")


def _kernel(x_ref, head_w, head_b, body_w, body_b, tail_w, tail_b, out_ref,
            *, cfg: R2LConfig, compute_dtype):
    x = x_ref[...].astype(compute_dtype)
    _kernel_body(x, head_w, head_b, body_w, body_b, tail_w, tail_b,
                 out_ref, cfg, compute_dtype)


# ---------------------------------------------------------------------------
# Variant 3: int8 weights + dynamic per-ray int8 activations.
#
# v5e's MXU runs int8 at 2x the bf16 rate (394 TOPS); the weight stack
# shrinks to ~5.7 MB. Weights are quantized per-(layer, output-column)
# symmetric; activations per-row (per-ray) each layer. Residual adds and
# the sigmoid stay float. Opt-in fast path (--quantize int8): expected
# rounding error is ~1e-2 on RGB worst case — validate PSNR before use.
# ---------------------------------------------------------------------------

class FusedParamsInt8(NamedTuple):
    head_w: Array    # [in_pad, W] int8
    head_s: Array    # [1, W] f32 — per-column weight scale
    head_b: Array    # [1, W] f32
    body_w: Array    # [nb*nl, W, W] int8
    body_s: Array    # [nb*nl, W] f32
    body_b: Array    # [nb*nl, W] f32
    tail_w: Array    # [W, 128] int8
    tail_s: Array    # [1, 128] f32
    tail_b: Array    # [1, 128] f32


def _quant_cols(w: Array) -> tuple[Array, Array]:
    """[in, out] float -> (int8, per-out-column scale)."""
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def prepare_fused_params_int8(params: dict, cfg: R2LConfig) -> FusedParamsInt8:
    _assert_fused_supported(cfg)
    in_dim = params["head"]["w"].shape[0]
    in_pad = _round_up(in_dim, _LANE)
    W = cfg.netwidth
    nb, nl = cfg.num_blocks, cfg.n_learnable

    hw = jnp.zeros((in_pad, W), jnp.float32)
    hw = hw.at[:in_dim].set(params["head"]["w"].astype(jnp.float32))
    head_q, head_s = _quant_cols(hw)

    bw = params["body"]["w"].reshape(nb * nl, W, W).astype(jnp.float32)
    body_s = jnp.maximum(jnp.max(jnp.abs(bw), axis=1), 1e-12) / 127.0
    body_q = jnp.clip(jnp.round(bw / body_s[:, None, :]), -127,
                      127).astype(jnp.int8)

    out_dim = params["tail"]["w"].shape[1]
    out_pad = _round_up(out_dim, _LANE)
    tw = jnp.zeros((W, out_pad), jnp.float32)
    tw = tw.at[:, :out_dim].set(params["tail"]["w"].astype(jnp.float32))
    tail_q, tail_s = _quant_cols(tw)
    tb = jnp.zeros((1, out_pad), jnp.float32)
    tb = tb.at[0, :out_dim].set(params["tail"]["b"].astype(jnp.float32))

    return FusedParamsInt8(
        head_q, head_s,
        params["head"]["b"].astype(jnp.float32).reshape(1, W),
        body_q, body_s.astype(jnp.float32),
        params["body"]["b"].reshape(nb * nl, W).astype(jnp.float32),
        tail_q, tail_s, tb)


def _quant_rows(a: Array) -> tuple[Array, Array]:
    """[m, k] float -> (int8, per-row scale [m, 1])."""
    s = jnp.max(jnp.abs(a), axis=1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)
    return q, s


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def fused_r2l_apply_int8(fp: FusedParamsInt8, cfg: R2LConfig, x: Array,
                         tile: int = 512,
                         interpret: bool | None = None) -> Array:
    """x [N, input_dim] float -> RGB [N, output_dim] f32 via int8 MXU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, in_dim = x.shape
    in_pad = fp.head_w.shape[0]
    out_pad = fp.tail_w.shape[1]
    n_pad = _round_up(max(n, 1), tile)
    xp = jnp.zeros((n_pad, in_pad), jnp.float32)
    xp = xp.at[:n, :in_dim].set(x.astype(jnp.float32))

    nl = cfg.n_learnable

    def kern(x_ref, hw, hs, hb, bw, bs, bb, tw, ts, tb, o_ref):
        def qmm(a_f, w_q, w_s):
            a_q, a_s = _quant_rows(a_f)
            acc = jnp.dot(a_q, w_q[...], preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * a_s * w_s

        h0 = jnp.maximum(qmm(x_ref[...], hw[...], hs[...]) + hb[...], 0.0)

        def block(i, h):
            acc = h
            for j in range(nl):
                w = bw[i * nl + j]
                s = bs[pl.ds(i * nl + j, 1), :]
                b = bb[pl.ds(i * nl + j, 1), :]
                acc = qmm(acc, w, s) + b
                if j < nl - 1:
                    acc = jnp.maximum(acc, 0.0)
            return acc * cfg.res_scale + h

        h = jax.lax.fori_loop(0, cfg.num_blocks, block, h0)
        if cfg.use_residual:
            h = h + h0
        out = qmm(h, tw[...], ts[...]) + tb[...]
        if not cfg.linear_tail:
            out = jax.nn.sigmoid(out)
        o_ref[...] = out

    W = cfg.netwidth
    nbl = fp.body_w.shape[0]
    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, in_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_pad, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, out_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
        interpret=interpret,
    )(xp, fp.head_w, fp.head_s, fp.head_b, fp.body_w, fp.body_s, fp.body_b,
      fp.tail_w, fp.tail_s, fp.tail_b)
    return out[:n, :cfg.output_dim]


# ---------------------------------------------------------------------------
# Variant 2: positional encoding fused INTO the kernel.
#
# The r2l_embed layout is per-scalar ([sin(s f0..f9), cos(s f0..f9), s] for
# each of the 48 scalars); producing it in-kernel would need a lane-dim
# reshape Mosaic handles poorly. Instead the kernel computes a freq-major
# layout (21 contiguous [TILE, 48] parts: sin f0..f9 | cos f0..f9 | id) and
# ``prepare_fused_params_pe`` permutes the head-weight ROWS to match, so the
# matmul is mathematically identical. This removes the [n_ray, 1008]
# embedded-activation round-trip through HBM (~320 MB per 400x400 frame).
# ---------------------------------------------------------------------------

def _pe_row_permutation(dim_pts: int, L: int) -> np.ndarray:
    """Freq-major feature (p, s) <- per-scalar feature s*(2L+1) + p.

    Both layouts enumerate the same 2L+1 parts (sin f0..f_{L-1},
    cos f0..f_{L-1}, identity) in the same order p, so the old column
    index is simply p."""
    per = 2 * L + 1
    perm = np.empty(dim_pts * per, dtype=np.int64)
    for p in range(per):
        for s in range(dim_pts):
            perm[p * dim_pts + s] = s * per + p
    return perm


def prepare_fused_params_pe(params: dict, cfg: R2LConfig, dim_pts: int,
                            L: int = 10,
                            weight_dtype=jnp.bfloat16) -> FusedParams:
    """Pack params for the PE-fused kernel (freq-major head-row order)."""
    _assert_fused_supported(cfg)
    assert cfg.input_dim == dim_pts * (2 * L + 1)
    perm = _pe_row_permutation(dim_pts, L)
    permuted = dict(params)
    permuted["head"] = {"w": params["head"]["w"][perm],
                        "b": params["head"]["b"]}
    return prepare_fused_params(permuted, cfg, weight_dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "dim_pts", "L", "tile",
                                             "interpret"))
def fused_r2l_apply_pe(fparams: FusedParams, cfg: R2LConfig, pts: Array,
                       dim_pts: int, L: int = 10, tile: int = 512,
                       interpret: bool | None = None) -> Array:
    """pts [N, dim_pts] raw sample points -> RGB [N, output_dim] f32.

    Positional encoding runs inside the kernel (VPU) overlapped with the
    MXU matmul chain; params must come from ``prepare_fused_params_pe``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pts.shape[0]
    in_pad = fparams.head_w.shape[0]
    out_pad = fparams.tail_w.shape[1]
    n_pad = _round_up(max(n, 1), tile)
    cd = (jnp.float32 if fparams.head_w.dtype == jnp.float32
          else cfg.compute_dtype)

    pp = jnp.zeros((n_pad, dim_pts), jnp.float32)
    pp = pp.at[:n].set(pts.astype(jnp.float32))

    def kern(p_ref, head_w, head_b, body_w, body_b, tail_w, tail_b,
             out_ref):
        p = p_ref[...]
        # Each part cast to the compute dtype before concat: halves the
        # VMEM transient (21 x [tile, dim_pts] buffers).
        parts = [jnp.sin(p * (2.0 ** j)).astype(cd) for j in range(L)]
        parts += [jnp.cos(p * (2.0 ** j)).astype(cd) for j in range(L)]
        parts.append(p.astype(cd))
        pad = in_pad - dim_pts * (2 * L + 1)
        if pad:
            parts.append(jnp.zeros((p.shape[0], pad), cd))
        x = jnp.concatenate(parts, axis=1)
        _kernel_body(x, head_w, head_b, body_w, body_b, tail_w, tail_b,
                     out_ref, cfg, cd)

    W = cfg.netwidth
    nbl = fparams.body_w.shape[0]
    const = lambda i: (0, 0)  # noqa: E731
    flops_tile = 2 * tile * (in_pad * W + nbl * W * W + W * out_pad)
    out = pl.pallas_call(
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
        out_specs=pl.BlockSpec((tile, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * (n_pad // tile),
            bytes_accessed=n_pad * dim_pts * 4,
            transcendentals=n_pad * dim_pts * 2 * L),
        interpret=interpret,
    )(pp, fparams.head_w, fparams.head_b, fparams.body_w, fparams.body_b,
      fparams.tail_w, fparams.tail_b)
    return out[:n, :cfg.output_dim]


def _kernel_body(x, head_w, head_b, body_w, body_b, tail_w, tail_b,
                 out_ref, cfg: R2LConfig, cd):
    """Shared matmul chain: embedded x -> out_ref (the single source of
    truth for the fused forward; ``_kernel`` and the PE kernel wrap it).
    Activations are the canonical relu/relu/none — enforced by
    ``_assert_fused_supported`` in the prepare_* functions."""
    def mm(a, w):
        return jnp.dot(a, w[...], preferred_element_type=jnp.float32)

    h0 = jnp.maximum(mm(x, head_w) + head_b[...], 0.0).astype(cd)
    nl = cfg.n_learnable

    def block(i, h):
        acc = h
        for j in range(nl):
            w = body_w[i * nl + j]
            b = body_b[pl.ds(i * nl + j, 1), :]
            acc_f = mm(acc, w) + b
            if j < nl - 1:
                acc_f = jnp.maximum(acc_f, 0.0)
            acc = acc_f.astype(cd)
        return (acc.astype(jnp.float32) * cfg.res_scale
                + h.astype(jnp.float32)).astype(cd)

    h = jax.lax.fori_loop(0, cfg.num_blocks, block, h0)
    if cfg.use_residual:
        h = (h.astype(jnp.float32) + h0.astype(jnp.float32)).astype(cd)
    out = mm(h, tail_w) + tail_b[...]
    if not cfg.linear_tail:
        out = jax.nn.sigmoid(out)
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def fused_r2l_apply(fparams: FusedParams, cfg: R2LConfig, x: Array,
                    tile: int = 256, interpret: bool | None = None) -> Array:
    """x [N, input_dim] (any float dtype) -> RGB [N, output_dim] f32.

    Pads N to a tile multiple and the feature dim to the kernel's padded
    input dim; numerics match ``apply_r2l`` up to the weight dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, in_dim = x.shape
    in_pad = fparams.head_w.shape[0]
    out_pad = fparams.tail_w.shape[1]
    n_pad = _round_up(max(n, 1), tile)

    cd = (jnp.float32 if fparams.head_w.dtype == jnp.float32
          else cfg.compute_dtype)
    xp = jnp.zeros((n_pad, in_pad), cd)
    xp = xp.at[:n, :in_dim].set(x.astype(cd))

    kern = functools.partial(_kernel, cfg=cfg, compute_dtype=cd)

    W = cfg.netwidth
    nbl = fparams.body_w.shape[0]
    const = lambda i: (0, 0)  # noqa: E731 — weights: same block every step

    flops_tile = 2 * tile * (in_pad * W + nbl * W * W + W * out_pad)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, in_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_pad, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, out_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * (n_pad // tile),
            bytes_accessed=n_pad * in_pad * xp.dtype.itemsize,
            transcendentals=n_pad * out_pad),
        interpret=interpret,
    )(xp, fparams.head_w, fparams.head_b, fparams.body_w, fparams.body_b,
      fparams.tail_w, fparams.tail_b)
    return out[:n, :cfg.output_dim]
