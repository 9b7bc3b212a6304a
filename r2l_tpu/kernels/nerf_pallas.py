"""Fused NeRF-MLP point query as a Pallas TPU kernel.

The teacher's volumetric render pushes [n_ray * n_sample, 63+27] encoded
points through the classic 8x256 MLP (reference `model/nerf_raybased.py:
377-401` via `run_network`, `main.py:51-87`). Under the XLA schedule the
[N, 256] activations round-trip HBM between every layer (measured
~16 TFLOP/s, 2.9 s per 400^2 frame with 64+128 samples on v5e). This
kernel grids over point tiles and keeps the whole padded weight stack
(<1 MB bf16) plus the activation tile in VMEM: HBM traffic collapses to
the encoded inputs + raw outputs.

Weight layout: every linear is zero-padded to lane multiples
([fan_in_pad, fan_out_pad]); the skip concat pads [input_pts | h] the
same way so the padded matmul is exact. Used by the volumetric renderer
for inference/datagen (training keeps the XLA path for its backward).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.nerf import NeRFConfig

Array = jax.Array
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_w(w: Array, in_pad: int, out_pad: int, dtype) -> Array:
    out = jnp.zeros((in_pad, out_pad), dtype)
    return out.at[:w.shape[0], :w.shape[1]].set(w.astype(dtype))


def _pad_b(b: Array, out_pad: int) -> Array:
    out = jnp.zeros((1, out_pad), jnp.float32)
    return out.at[0, :b.shape[0]].set(b.astype(jnp.float32))


class FusedNeRFParams(NamedTuple):
    pts_w: tuple      # per-layer [in_pad, W] (skip layers wider)
    pts_b: tuple      # per-layer [1, W]
    alpha_w: Array    # [W, 128] (1 used)
    alpha_b: Array
    feat_w: Array     # [W, W]
    feat_b: Array
    views_w: Array    # [W + views_pad, W//2 pad]
    views_b: Array
    rgb_w: Array      # [W//2 pad, 128] (3 used)
    rgb_b: Array
    out_w: Array      # no-viewdirs head [W, 128] (output_ch used)
    out_b: Array


def prepare_fused_nerf(params: dict, cfg: NeRFConfig,
                       weight_dtype=jnp.bfloat16) -> FusedNeRFParams:
    in_pad = _round_up(cfg.input_ch, _LANE)
    v_pad = _round_up(max(cfg.input_ch_views, 1), _LANE)
    W = cfg.W
    h_pad = _round_up(W // 2, _LANE)

    pts_w, pts_b = [], []
    for i, layer in enumerate(params["pts_linears"]):
        if i > 0 and (i - 1) in cfg.skips:
            # Layer input is the kernel's concat [pts(in_pad) | h(W)]:
            # original rows 0..input_ch-1 are pts, input_ch.. are h —
            # split them around the padded pts block.
            w = jnp.zeros((in_pad + W, W), weight_dtype)
            w = w.at[:cfg.input_ch].set(
                layer["w"][:cfg.input_ch].astype(weight_dtype))
            w = w.at[in_pad:].set(
                layer["w"][cfg.input_ch:].astype(weight_dtype))
            pts_w.append(w)
        else:
            fan_in = in_pad if i == 0 else W
            pts_w.append(_pad_w(layer["w"], fan_in, W, weight_dtype))
        pts_b.append(_pad_b(layer["b"], W))

    zero_wd = jnp.zeros((2, 2), weight_dtype)
    zero_b = jnp.zeros((1, 2), jnp.float32)
    if cfg.use_viewdirs:
        # views_linears[0] input is concat([feature(W), viewdirs(n_v)])
        # (apply_nerf / reference `model:394-397`): rows 0..W-1 feature,
        # W.. viewdirs — append-only padding keeps both aligned with the
        # kernel's [feat | views_pad] concat.
        vw_re = _pad_w(params["views_linears"][0]["w"], W + v_pad, h_pad,
                       weight_dtype)
        return FusedNeRFParams(
            tuple(pts_w), tuple(pts_b),
            _pad_w(params["alpha_linear"]["w"], W, _LANE, weight_dtype),
            _pad_b(params["alpha_linear"]["b"], _LANE),
            _pad_w(params["feature_linear"]["w"], W, W, weight_dtype),
            _pad_b(params["feature_linear"]["b"], W),
            vw_re, _pad_b(params["views_linears"][0]["b"], h_pad),
            _pad_w(params["rgb_linear"]["w"], h_pad, _LANE, weight_dtype),
            _pad_b(params["rgb_linear"]["b"], _LANE),
            zero_wd, zero_b)
    return FusedNeRFParams(
        tuple(pts_w), tuple(pts_b),
        zero_wd, zero_b, zero_wd, zero_b, zero_wd, zero_b, zero_wd, zero_b,
        _pad_w(params["output_linear"]["w"], W, _LANE, weight_dtype),
        _pad_b(params["output_linear"]["b"], _LANE))


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def fused_nerf_query(fp: FusedNeRFParams, cfg: NeRFConfig, emb: Array,
                     tile: int = 2048,
                     interpret: bool | None = None) -> Array:
    """emb [N, input_ch(+input_ch_views)] float -> raw [N, output_ch] f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = emb.shape[0]
    in_pad = _round_up(cfg.input_ch, _LANE)
    v_pad = _round_up(max(cfg.input_ch_views, 1), _LANE)
    W = cfg.W
    n_pad = _round_up(max(n, 1), tile)
    cd = fp.pts_w[0].dtype

    # Pad points and viewdirs into separate lane-aligned blocks.
    x = jnp.zeros((n_pad, in_pad + v_pad), cd)
    x = x.at[:n, :cfg.input_ch].set(emb[:, :cfg.input_ch].astype(cd))
    if cfg.use_viewdirs:
        x = x.at[:n, in_pad:in_pad + cfg.input_ch_views].set(
            emb[:, cfg.input_ch:cfg.input_ch + cfg.input_ch_views]
            .astype(cd))

    n_layers = len(fp.pts_w)
    out_ch = 4 if cfg.use_viewdirs else cfg.output_ch

    def kern(x_ref, *refs):
        pw = refs[:n_layers]
        pb = refs[n_layers:2 * n_layers]
        (aw, ab, fw, fb, vw, vb, rw, rb, ow, ob, o_ref) = refs[2 * n_layers:]

        def mm(a, w_ref, b_ref):
            acc = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)
            return acc + b_ref[...]

        pts = x_ref[:, :in_pad]
        h = jnp.maximum(mm(pts, pw[0], pb[0]), 0.0).astype(cd)
        for i in range(1, n_layers):
            if (i - 1) in cfg.skips:
                h = jnp.concatenate([pts, h], axis=1)
            h = jnp.maximum(mm(h, pw[i], pb[i]), 0.0).astype(cd)

        if cfg.use_viewdirs:
            alpha = mm(h, aw, ab)                     # [T, 128] f32
            feat = mm(h, fw, fb).astype(cd)           # [T, W]
            views = x_ref[:, in_pad:]
            hv = jnp.concatenate([feat, views], axis=1)
            hv = jnp.maximum(mm(hv, vw, vb), 0.0).astype(cd)
            rgb = mm(hv, rw, rb)                      # [T, 128] f32
            o_ref[:, 0:3] = rgb[:, 0:3]
            o_ref[:, 3:4] = alpha[:, 0:1]
            o_ref[:, 4:] = jnp.zeros_like(o_ref[:, 4:])
        else:
            out = mm(h, ow, ob)
            o_ref[...] = out[:, :_LANE]

    def const(i):
        return (0, 0)

    in_specs = [pl.BlockSpec((tile, in_pad + v_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    operands = [x]
    for w in fp.pts_w:
        in_specs.append(pl.BlockSpec(w.shape, const,
                                     memory_space=pltpu.VMEM))
        operands.append(w)
    for b in fp.pts_b:
        in_specs.append(pl.BlockSpec(b.shape, const,
                                     memory_space=pltpu.VMEM))
        operands.append(b)
    for arr in (fp.alpha_w, fp.alpha_b, fp.feat_w, fp.feat_b, fp.views_w,
                fp.views_b, fp.rgb_w, fp.rgb_b, fp.out_w, fp.out_b):
        in_specs.append(pl.BlockSpec(arr.shape, const,
                                     memory_space=pltpu.VMEM))
        operands.append(arr)

    out = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, _LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
        interpret=interpret,
    )(*operands)
    return out[:n, :out_ch]
