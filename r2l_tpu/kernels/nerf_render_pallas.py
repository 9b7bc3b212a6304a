"""Fully-fused volumetric NeRF pass as ONE Pallas kernel per ray tile.

The teacher's hot loop (reference `main.py:624-756`: sample points along
rays -> positional-encode -> 8x256 MLP -> alpha-composite) is HBM-bound
under both the XLA schedule (~21 GB of [N_pts, 256] activations per frame)
and a per-point fused query (whose 128-lane-padded raw output alone is
~16 GB/frame — exp/probe9.jsonl). This kernel eliminates both: the grid is
(ray_tile, sample) with the SAMPLE axis innermost and sequential; each
grid step builds one sample's points (o + d*z), positional-encodes them
in-VMEM (sin/cos double-angle ladder), runs the whole MLP with
VMEM-resident weights, and folds the result into the transmittance
compositing state held in VMEM scratch. HBM traffic collapses to the rays
in (o, d, z per sample) and per-ray outputs (packed rgb/acc/depth + the
[N, S] weights the hierarchical resampler needs).

Forward-only (datagen / evaluation; training keeps the XLA path for its
backward) and deterministic (raw_noise_std=0 — the reference's test
kwargs, `main.py:528-536`). Compositing mirrors `volume.raw2outputs`
exactly: dists to the next sample padded with 1e10 and scaled by ||d||,
alpha = 1 - exp(-relu(sigma) * dist), exclusive-cumprod transmittance
(1e-10 eps), optional white-background composite.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from typing import NamedTuple

from ..models.nerf import NeRFConfig
from .r2l_pallas import _pe_sin_cos_ladder, _round_up

Array = jax.Array
_LANE = 128


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




@functools.partial(jax.jit, static_argnames=("cfg", "L_pts", "L_views",
                                             "white_bkgd", "tile",
                                             "interpret"))
def fused_nerf_render(fp: FusedNeRFParams, cfg: NeRFConfig,
                      rays_o: Array, rays_d: Array, z_vals: Array,
                      L_pts: int = 10, L_views: int = 4,
                      white_bkgd: bool = False, tile: int = 1024,
                      interpret: bool | None = None):
    """One volumetric pass over flat rays.

    rays_o/d [N, 3], z_vals [N, S] -> (rgb [N, 3] f32, acc [N], depth [N],
    weights [N, S]). ``rays_d`` is the UNNORMALIZED camera direction (its
    norm scales dists, its normalization is the viewdir) — the
    reference's convention.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, S = z_vals.shape
    n_pad = _round_up(max(n, 1), tile)
    in_pad = _round_up(cfg.input_ch, _LANE)
    v_pad = _round_up(max(cfg.input_ch_views, 1), _LANE)
    cd = fp.pts_w[0].dtype
    n_layers = len(fp.pts_w)

    def padn(x):
        out = jnp.zeros((n_pad, x.shape[1]), jnp.float32)
        return out.at[:n].set(x.astype(jnp.float32))

    ro, rd, zv = padn(rays_o), padn(rays_d), padn(z_vals)
    # dist to the next sample, with the reference's 1e10 tail pad
    # (`main.py:578-584`) — precomputed so every grid step is uniform.
    z_next = jnp.concatenate([zv[:, 1:], zv[:, -1:] + 1e10], axis=1)
    # The per-sample z columns travel TRANSPOSED [S8, N] in (8, tile)
    # sublane blocks: Mosaic requires lane-dim indices to be 128-aligned,
    # so per-sample (tile, 1) lane blocks are illegal while dynamic
    # SUBLANE slices are fine; the [1, tile] <-> [tile, 1] transposes in
    # the kernel are trivial relayouts.
    S8 = _round_up(S, 8)

    def pad_t(x):
        out = jnp.zeros((S8, n_pad), jnp.float32)
        return out.at[:S].set(x.T)

    zv_t, znx_t = pad_t(zv), pad_t(z_next)

    def kern(ro_ref, rd_ref, z_ref, znx_ref, *refs):
        # z_ref/znx_ref: (8, tile) sublane blocks of the transposed z
        pw = refs[:n_layers]
        pb = refs[n_layers:2 * n_layers]
        (aw, ab, fw, fb, vw, vb, rw, rb, ow, ob,
         out_ref, w_ref, trans_ref, views_ref) = refs[2 * n_layers:]
        j = pl.program_id(1)
        S_total = pl.num_programs(1)

        d = rd_ref[...]
        d_norm = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))  # [T,1]

        def mm(a, w_r, b_r):
            acc = jnp.dot(a, w_r[...], preferred_element_type=jnp.float32)
            return acc + b_r[...]

        def embed(p, L, width, d_in):
            sins, coss = _pe_sin_cos_ladder(p, L)
            parts = [p.astype(cd)]
            for s, c in zip(sins, coss):
                parts += [s.astype(cd), c.astype(cd)]
            pad = width - (2 * L + 1) * d_in
            if pad:
                parts.append(jnp.zeros((p.shape[0], pad), cd))
            return jnp.concatenate(parts, axis=1)

        @pl.when(j == 0)
        def _init():
            trans_ref[...] = jnp.ones_like(trans_ref)
            out_ref[...] = jnp.zeros_like(out_ref)
            if cfg.use_viewdirs:
                vd = d / jnp.maximum(d_norm, 1e-12)
                views_ref[...] = embed(vd, L_views, v_pad,
                                       3).astype(jnp.float32)

        r = pl.program_id(1) % 8
        z_i = jnp.transpose(z_ref[pl.ds(r, 1), :])        # [T, 1]
        z_n = jnp.transpose(znx_ref[pl.ds(r, 1), :])
        dist = (z_n - z_i) * d_norm

        p = ro_ref[...] + d * z_i                         # [T, 3]
        pts_e = embed(p, L_pts, in_pad, 3)
        h = jnp.maximum(mm(pts_e, pw[0], pb[0]), 0.0).astype(cd)
        for li in range(1, n_layers):
            if (li - 1) in cfg.skips:
                h = jnp.concatenate([pts_e, h], axis=1)
            h = jnp.maximum(mm(h, pw[li], pb[li]), 0.0).astype(cd)

        if cfg.use_viewdirs:
            sigma = mm(h, aw, ab)[:, 0:1]                 # [T, 1]
            feat = mm(h, fw, fb).astype(cd)
            hv = jnp.concatenate([feat, views_ref[...].astype(cd)], axis=1)
            hv = jnp.maximum(mm(hv, vw, vb), 0.0).astype(cd)
            rgb_raw = mm(hv, rw, rb)                      # [T, 128]
        else:
            out_all = mm(h, ow, ob)
            rgb_raw = out_all
            sigma = out_all[:, 3:4]

        trans = trans_ref[...]
        alpha = 1.0 - jnp.exp(-jnp.maximum(sigma, 0.0) * dist)
        w = alpha * trans                                 # [T, 1]
        trans_ref[...] = trans * (1.0 - alpha + 1e-10)
        w_ref[pl.ds(r, 1), :] = jnp.transpose(w)

        # accumulate packed per-ray outputs:
        # lanes 0-2 rgb, lane 3 acc, lane 4 depth
        lane = jax.lax.broadcasted_iota(jnp.int32, rgb_raw.shape, 1)
        contrib = jnp.where(lane < 3, w * jax.nn.sigmoid(rgb_raw), 0.0)
        contrib = contrib + jnp.where(lane == 3,
                                      jnp.broadcast_to(w, rgb_raw.shape),
                                      0.0)
        contrib = contrib + jnp.where(
            lane == 4, jnp.broadcast_to(w * z_i, rgb_raw.shape), 0.0)
        acc_out = out_ref[...] + contrib

        if white_bkgd:
            # composite onto white once, at the last sample
            # (rgb += 1 - acc; acc lives in lane 3)
            @pl.when(j == S_total - 1)
            def _white():
                # lane 3 -> lane 0 (pltpu.roll needs non-negative shift)
                a = pltpu.roll(acc_out, _LANE - 3, axis=1)[:, 0:1]
                out_ref[...] = acc_out + jnp.where(
                    lane < 3, 1.0 - jnp.broadcast_to(a, rgb_raw.shape),
                    0.0)

            @pl.when(j < S_total - 1)
            def _nowhite():
                out_ref[...] = acc_out
        else:
            out_ref[...] = acc_out

    const = lambda i, j: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((tile, 3), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tile), lambda i, j: (j // 8, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tile), lambda i, j: (j // 8, i),
                     memory_space=pltpu.VMEM),
    ]
    operands = [ro, rd, zv_t, znx_t]
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

    packed, weights_t = pl.pallas_call(
        kern,
        grid=(n_pad // tile, S),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tile, _LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i, j: (j // 8, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((S8, n_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, 1), jnp.float32),        # transmittance
            pltpu.VMEM((tile, v_pad), jnp.float32),    # viewdir embedding
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)
    weights = weights_t[:S, :n].T
    return (packed[:n, :3], packed[:n, 3], packed[:n, 4], weights)
