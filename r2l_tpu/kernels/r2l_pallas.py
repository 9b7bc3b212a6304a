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

def _pe_sin_cos_ladder(p, L: int):
    """sin/cos of p * 2^j for j in [0, L) via the double-angle recurrence.

    2 transcendentals per element instead of 2L (sin(2x) = 2 sin x cos x,
    cos(2x) = 1 - 2 sin^2 x): the VPU transcendental budget of the PE drops
    ~10x. f32 error after L-1 doublings is bounded by ~2^L ulp ≈ 6e-5 for
    L=10 — invisible under the bf16/int8 quantization that follows.
    Returns (sins, coss) lists of length L.
    """
    s = jnp.sin(p)
    c = jnp.cos(p)
    sins, coss = [s], [c]
    for _ in range(1, L):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sins.append(s)
        coss.append(c)
    return sins, coss


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

    if n_pad == n:
        pp = pts.astype(jnp.float32)
    else:
        pp = jnp.zeros((n_pad, dim_pts), jnp.float32)
        pp = pp.at[:n].set(pts.astype(jnp.float32))

    def kern(p_ref, head_w, head_b, body_w, body_b, tail_w, tail_b,
             out_ref):
        p = p_ref[...]
        # Each part cast to the compute dtype before concat: halves the
        # VMEM transient (21 x [tile, dim_pts] buffers).
        sins, coss = _pe_sin_cos_ladder(p, L)
        parts = [s.astype(cd) for s in sins]
        parts += [c.astype(cd) for c in coss]
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
            # PE ladder: 2 transcendentals per input scalar (the L-1
            # octaves are doubling recurrences), + the sigmoid tail
            transcendentals=n_pad * (dim_pts * 2 + 3)),
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


# ---------------------------------------------------------------------------
# Variant 4 (production fast path): PE-fused int8 with STATIC calibrated
# per-channel activation scales.
#
# Round-1's int8 kernel (`fused_r2l_apply_int8`) computed a per-ray max-abs
# reduction for every matmul — a cross-lane VPU reduction that made int8
# SLOWER than bf16 on v5e. This variant removes all in-kernel reductions:
# activation scales are calibrated OFFLINE per (layer, channel) and absorbed
# into the weight quantization (exact algebra: x @ w == (x / s) @ (w * s)),
# so in-kernel quantization is one broadcast multiply + round + clip.
# Measured on v5e (exp/probe2.jsonl): the 86-layer body drops from 15.2 ms
# (bf16, full ResMLP epilogue) to 10.0 ms — 184 bf16-equivalent TF/s, 93%
# of the chip's bf16 peak, using the MXU's 394 TOPS int8 rate.
# ---------------------------------------------------------------------------

class FusedParamsInt8PE(NamedTuple):
    """Static-scale int8 kernel params (all scales folded, PE freq-major)."""
    head_q: Array     # [in_pad, W] int8 (rows freq-major, input scales in)
    head_m: Array     # [1, W] f32 dequant multiplier
    head_b: Array     # [1, W] f32
    head_inv: Array   # [1, in_pad] f32 — inv input scale per column
    body_q: Array     # [nb*nl, W, W] int8
    body_m: Array     # [nb*nl, W] f32 (res_scale folded into block tails)
    body_b: Array     # [nb*nl, W] f32 (res_scale folded into block tails)
    body_inv: Array   # [nb*nl, W] f32 — inv input scale per channel
    tail_q: Array     # [W, 128] int8
    tail_m: Array     # [1, 128] f32
    tail_b: Array     # [1, 128] f32
    tail_inv: Array   # [1, W] f32


def _quant_cols_scaled(w: Array, s_in: Array) -> tuple[Array, Array]:
    """Absorb per-input-channel scales then quantize per out column.

    w [in, out] float, s_in [in] activation scales ->
    (int8 [in, out], per-col dequant multiplier [1, out]).
    """
    w_eff = w.astype(jnp.float32) * s_in[:, None]
    ws = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=0, keepdims=True),
                     1e-12) / 127.0
    q = jnp.clip(jnp.round(w_eff / ws), -127, 127).astype(jnp.int8)
    return q, ws.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "dim_pts", "L",
                                             "margin", "fold_requant"))
def calibrate_r2l_int8_pe(params: dict, cfg: R2LConfig, dim_pts: int,
                          L: int, calib_pts: Array,
                          margin: float = 1.1,
                          fold_requant: bool = False) -> FusedParamsInt8PE:
    """Calibrate per-(layer, channel) activation ranges on sample rays and
    pack the int8 kernel params.

    ``calib_pts`` [n, dim_pts] should come from the deployment distribution
    (e.g. ``PointSampler.sample_test`` on a few poses). Scales use the
    observed max-abs x ``margin``; the kernel clips outliers to ±127.

    ``fold_requant``: pre-multiply the NEXT intermediate layer's inverse
    input scale into this layer's dequant multiplier/bias (exact algebra:
    relu(acc*m + b) * inv == relu(acc*(m*inv) + b*inv) for inv > 0), so
    the in-kernel requantize of within-block layers is round+clip with no
    multiply. Must be paired with ``fold_requant=True`` on the apply fn.

    Jitted (cfg/dims static): eagerly this is ~500 dispatches — at the
    ~30 ms tunnel RTT that made every in-training eval rebuild pay ~15 s.
    """
    _assert_fused_supported(cfg)
    W, nb, nl = cfg.netwidth, cfg.num_blocks, cfg.n_learnable
    in_dim = dim_pts * (2 * L + 1)
    in_pad = _round_up(in_dim, _LANE)
    rs = jnp.float32(cfg.res_scale)

    # Freq-major embedded calibration input (must match the kernel layout).
    p = calib_pts.astype(jnp.float32)
    parts = [jnp.sin(p * (2.0 ** j)) for j in range(L)]
    parts += [jnp.cos(p * (2.0 ** j)) for j in range(L)]
    parts.append(p)
    x = jnp.concatenate(parts, axis=1)                       # [n, in_dim]

    perm = _pe_row_permutation(dim_pts, L)
    head_w = params["head"]["w"][perm].astype(jnp.float32)   # [in_dim, W]
    head_b = params["head"]["b"].astype(jnp.float32)

    # --- f32 reference forward, capturing per-layer input max-abs ---
    # activation scale = maxabs*margin/127 so x/s spans the full int8
    # range (q = round(x/s) in [-127, 127])
    s_x = jnp.maximum(jnp.max(jnp.abs(x), axis=0), 1e-6) * (margin / 127.0)
    h = jax.nn.relu(x @ head_w + head_b)
    h0 = h
    body_w = params["body"]["w"].reshape(nb * nl, W, W).astype(jnp.float32)
    body_bias = params["body"]["b"].reshape(nb * nl, W).astype(jnp.float32)
    s_body, q_body, m_body, b_body = [], [], [], []
    for i in range(nb):
        h_in = h
        for j in range(nl):
            idx = i * nl + j
            s_in = (jnp.maximum(jnp.max(jnp.abs(h), axis=0), 1e-6)
                    * (margin / 127.0))
            s_body.append(s_in)
            t = h @ body_w[idx] + body_bias[idx]
            if j < nl - 1:
                t = jax.nn.relu(t)
            h = t
        h = h * rs + h_in
    if cfg.use_residual:
        h = h + h0
    s_tail = (jnp.maximum(jnp.max(jnp.abs(h), axis=0), 1e-6)
              * (margin / 127.0))

    # --- quantize with the captured scales; fold res_scale into each
    # block's last layer (multiplier AND bias) ---
    head_q, head_m = _quant_cols_scaled(
        jnp.pad(head_w, ((0, in_pad - in_dim), (0, 0))),
        jnp.pad(s_x, (0, in_pad - in_dim), constant_values=1.0))
    qs, ms, bs = [], [], []
    for idx in range(nb * nl):
        q, m = _quant_cols_scaled(body_w[idx], s_body[idx])
        b = body_bias[idx]
        if idx % nl == nl - 1:                 # block tail: fold res_scale
            m, b = m * rs, b * rs
        elif fold_requant:
            # within-block layer: fold the NEXT layer's inverse input
            # scale so its requantize needs no multiply (relu commutes
            # with the positive per-channel scaling).
            inv_next = 1.0 / s_body[idx + 1]
            m, b = m * inv_next[None, :], b * inv_next
        qs.append(q)
        ms.append(m[0])
        bs.append(b)

    out_dim = params["tail"]["w"].shape[1]
    out_pad = _round_up(out_dim, _LANE)
    tw = jnp.zeros((W, out_pad), jnp.float32)
    tw = tw.at[:, :out_dim].set(params["tail"]["w"].astype(jnp.float32))
    tail_q, tail_m = _quant_cols_scaled(tw, s_tail)
    tail_b = jnp.zeros((1, out_pad), jnp.float32)
    tail_b = tail_b.at[0, :out_dim].set(
        params["tail"]["b"].astype(jnp.float32))

    return FusedParamsInt8PE(
        head_q=head_q, head_m=head_m,
        head_b=head_b.reshape(1, W),
        head_inv=(1.0 / jnp.pad(s_x, (0, in_pad - in_dim),
                                constant_values=1.0)).reshape(1, in_pad),
        body_q=jnp.stack(qs), body_m=jnp.stack(ms), body_b=jnp.stack(bs),
        body_inv=1.0 / jnp.stack(s_body),
        tail_q=tail_q, tail_m=tail_m, tail_b=tail_b,
        tail_inv=(1.0 / s_tail).reshape(1, W))


def _q8(x_f32, inv):
    return jnp.clip(jnp.round(x_f32 * inv), -127.0, 127.0).astype(jnp.int8)


def _int8_pe_chain(p, head_q, head_m, head_b, head_inv, body_q, body_m,
                   body_b, body_inv, tail_q, tail_m, tail_b, tail_inv,
                   *, cfg: R2LConfig, dim_pts: int, L: int,
                   in_dim: int, in_pad: int, bf16_resid: bool = False,
                   fold_requant: bool = False,
                   nobf16_inner: bool = False):
    """Shared int8 PE + matmul chain: raw points p [T, dim_pts] (f32,
    in-VMEM) -> out [T, out_pad] f32 (single source of truth for the
    int8 forward; returned, not written, so a caller can run several
    independent chains per grid step — see ``chains`` below).

    ``bf16_resid``: residual adds in bf16 (no f32 up/downcast per block;
    the error is bounded by the following requantize).
    ``fold_requant``: within-block requantize is round+clip only — the
    inverse input scale was pre-multiplied into the previous layer's
    dequant m/b at calibration (params MUST come from
    ``calibrate_r2l_int8_pe(..., fold_requant=True)``).
    ``nobf16_inner`` (with fold_requant): within-block activations skip
    the bf16 bounce entirely — their only consumer is the immediate
    round+clip requantize, so they stay f32 (2 fewer casts/layer).
    """
    q8 = _q8
    nb, nl = cfg.num_blocks, cfg.n_learnable
    # PE parts quantized per part (transients stay [tile, dim_pts]):
    # the per-column input scales were absorbed into head_q, so each
    # part quantizes with its own slice of head_inv.
    sins, coss = _pe_sin_cos_ladder(p, L)
    parts = []
    for j in range(L):
        inv = head_inv[:, pl.ds(j * dim_pts, dim_pts)]
        parts.append(q8(sins[j], inv))
    for j in range(L):
        inv = head_inv[:, pl.ds((L + j) * dim_pts, dim_pts)]
        parts.append(q8(coss[j], inv))
    parts.append(q8(p, head_inv[:, pl.ds(2 * L * dim_pts, dim_pts)]))
    pad = in_pad - in_dim
    if pad:
        parts.append(jnp.zeros((p.shape[0], pad), jnp.int8))
    xq = jnp.concatenate(parts, axis=1)

    acc = jnp.dot(xq, head_q[...], preferred_element_type=jnp.int32)
    h0 = jnp.maximum(acc.astype(jnp.float32) * head_m[...]
                     + head_b[...], 0.0)
    h = h0.astype(jnp.bfloat16)
    if bf16_resid:
        h0 = h  # keep the global-residual copy in bf16 too

    for i in range(nb):
        h_in = h
        t = h
        for j in range(nl):
            idx = i * nl + j
            if fold_requant and j > 0:
                # previous layer's m/b already carry this layer's inverse
                # input scale: requantize = round + clip, no multiply
                q = jnp.clip(jnp.round(t.astype(jnp.float32)),
                             -127.0, 127.0).astype(jnp.int8)
            else:
                inv = body_inv[pl.ds(idx, 1), :]
                q = q8(t.astype(jnp.float32), inv)
            acc = jnp.dot(q, body_q[idx],
                          preferred_element_type=jnp.int32)
            tf = (acc.astype(jnp.float32) * body_m[pl.ds(idx, 1), :]
                  + body_b[pl.ds(idx, 1), :])
            if j < nl - 1:
                tf = jnp.maximum(tf, 0.0)
            if fold_requant and nobf16_inner and j < nl - 1:
                t = tf  # f32 straight into the next round+clip
            else:
                t = tf.astype(jnp.bfloat16)
        # res_scale already folded into the block tail's m/b
        if bf16_resid:
            h = t + h_in
        else:
            h = (t.astype(jnp.float32)
                 + h_in.astype(jnp.float32)).astype(jnp.bfloat16)
    if bf16_resid:
        hf = ((h + h0) if cfg.use_residual else h).astype(jnp.float32)
    else:
        hf = h.astype(jnp.float32)
        if cfg.use_residual:
            hf = hf + h0
    q = q8(hf, tail_inv[...])
    acc = jnp.dot(q, tail_q[...], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * tail_m[...] + tail_b[...]
    if not cfg.linear_tail:
        out = jax.nn.sigmoid(out)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "dim_pts", "L", "tile",
                                             "interpret", "bf16_resid",
                                             "fold_requant",
                                             "nobf16_inner", "chains"))
def fused_r2l_apply_int8_pe(fp: FusedParamsInt8PE, cfg: R2LConfig,
                            pts: Array, dim_pts: int, L: int = 10,
                            tile: int = 1024,
                            interpret: bool | None = None,
                            bf16_resid: bool = False,
                            fold_requant: bool = False,
                            nobf16_inner: bool = False,
                            chains: int = 1) -> Array:
    """pts [N, dim_pts] raw sample points -> RGB [N, output_dim] f32.

    PE on the VPU, whole int8 weight stack (~5.9 MB) VMEM-resident, every
    matmul on the MXU's 2x int8 rate, residual stream in bf16/f32.
    ``fold_requant`` requires params calibrated with the same flag.

    ``chains`` splits each ray tile into C independent sub-chains run
    side by side in one grid step — the teacher kernel's r4 overlap
    lever (PERF.md): the int8 forward is partially VPU-bound on the
    inter-layer requantize, and independent chains let the scheduler run
    one chain's requant under another's matmul. Bit-identical output
    (rows never mix). tile % chains == 0 required.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert tile % max(chains, 1) == 0, (tile, chains)
    n = pts.shape[0]
    in_pad = fp.head_q.shape[0]
    out_pad = fp.tail_q.shape[1]
    n_pad = _round_up(max(n, 1), tile)
    in_dim = dim_pts * (2 * L + 1)

    if n_pad == n:
        pp = pts.astype(jnp.float32)
    else:
        pp = jnp.zeros((n_pad, dim_pts), jnp.float32)
        pp = pp.at[:n].set(pts.astype(jnp.float32))

    def kern(p_ref, head_q, head_m, head_b, head_inv, body_q, body_m,
             body_b, body_inv, tail_q, tail_m, tail_b, tail_inv, o_ref):
        def chain(p):
            return _int8_pe_chain(
                p, head_q, head_m, head_b, head_inv,
                body_q, body_m, body_b, body_inv, tail_q, tail_m,
                tail_b, tail_inv, cfg=cfg, dim_pts=dim_pts,
                L=L, in_dim=in_dim, in_pad=in_pad,
                bf16_resid=bf16_resid, fold_requant=fold_requant,
                nobf16_inner=nobf16_inner)
        if chains <= 1:
            o_ref[...] = chain(p_ref[...])
        else:
            sub = tile // chains
            outs = [chain(p_ref[pl.ds(c * sub, sub), :])
                    for c in range(chains)]
            for c, o in enumerate(outs):
                o_ref[pl.ds(c * sub, sub), :] = o

    W = cfg.netwidth
    nbl = fp.body_q.shape[0]
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
        out_specs=pl.BlockSpec((tile, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * (n_pad // tile),
            bytes_accessed=n_pad * dim_pts * 4,
            # PE ladder: 2 transcendentals per input scalar (the L-1
            # octaves are doubling recurrences), + the sigmoid tail
            transcendentals=n_pad * (dim_pts * 2 + 3)),
        interpret=interpret,
    )(pp, fp.head_q, fp.head_m, fp.head_b, fp.head_inv, fp.body_q,
      fp.body_m, fp.body_b, fp.body_inv, fp.tail_q, fp.tail_m, fp.tail_b,
      fp.tail_inv)
    return out[:n, :cfg.output_dim]
