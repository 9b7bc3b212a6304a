"""Fully-fused volumetric NeRF pass as ONE Pallas kernel per ray tile.

The teacher's hot loop (reference `main.py:624-756`: sample points along
rays -> positional-encode -> 8x256 MLP -> alpha-composite) is HBM-bound
under both the XLA schedule (~21 GB of [N_pts, 256] activations per frame)
and a per-point fused query (whose 128-lane-padded raw output alone is
~16 GB/frame — exp/probe9.jsonl). This kernel eliminates both: the grid is
(ray_tile, sample) with the SAMPLE axis innermost and sequential; each
grid step builds one sample's points (o + d*z), positional-encodes them
in-VMEM, runs the whole MLP with VMEM-resident weights, and folds the
result into the transmittance compositing state held in VMEM scratch.

LAYOUT: rays live in LANES, features in SUBLANES ([feature, ray]
everywhere, matmuls as w.T @ x). A first-generation row-major kernel
([ray, feature]) spent a large share of its runtime on per-sample
[T,1] <-> [1,T] relayouts and 128-lane-padded epilogues; in the
transposed layout every per-ray scalar (z, dist, alpha, transmittance,
weights) is a NATIVE [1, T] row, sigma/rgb are static sublane slices of
the head outputs, and the positional encoding runs as a
sin/cos double-angle ladder (2 transcendental passes on [3, T] + L-1
doubling recurrences; a matmul+sin fallback via pe_ladder=False) — no
transposes anywhere. Measured per canonical 400^2 teacher frame on v5e
(8x256 + skip, viewdirs, 64 coarse + 128 fine, chunk 32768,
exp/probe_teacher_tile.jsonl, tile 4096): 316.9 ms bf16, 221.9 ms
static-scale int8 (the R2L int8 recipe: offline per-(layer, channel)
activation scales absorbed into the weight quantization), vs 866 ms for
the XLA schedule at the same config.

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from typing import NamedTuple

from ..models.nerf import NeRFConfig
from .r2l_pallas import _round_up

Array = jax.Array
_LANE = 128


def _embed_f32(p, L: int):
    """The kernel's PE layout in plain f32: [p, sin f0, cos f0, ...] —
    exactly ``encoding.nerf_embed`` (used by the int8 calibration
    forward; single source of truth for the PE convention)."""
    from ..encoding import nerf_embed
    return nerf_embed(p.astype(jnp.float32), L)


# ---------------------------------------------------------------------------
# Transposed-layout fused volumetric pass: rays live in LANES, features in
# SUBLANES ([feature, ray] everywhere, matmuls as w.T @ x). Why: the
# row-major kernel above spends ~45% of its runtime on per-sample
# [T,1] <-> [1,T] relayouts and 128-lane-padded epilogues (605 ms vs the
# ~335 ms its own matmul chain measures in isolation). In this layout every
# per-ray scalar (z, dist, alpha, transmittance, weights) is a NATIVE [1,T]
# row, sigma/rgb are static sublane slices of the head outputs, and the
# positional encoding runs as a sin/cos double-angle ladder (matmul+sin
# fallback behind pe_ladder=False) — no transposes anywhere in the
# kernel. Outputs come back transposed and are un-transposed once per
# frame in XLA.
# ---------------------------------------------------------------------------


def _pe_matrix(L: int) -> tuple:
    """A [rows8, 3], b [rows8, 1] with sin(A @ p + b) == the NeRF PE's
    [sin f0, cos f0, sin f1, ...] rows (3 dims per part); rows8 is
    8-aligned (zero rows are harmless: sin(0)=0, matching zero weights)."""
    rows = 6 * L
    rows8 = _round_up(rows, 8)
    A = np.zeros((rows8, 3), np.float32)
    b = np.zeros((rows8, 1), np.float32)
    for j in range(L):
        for t in range(2):              # 0: sin, 1: cos
            for k in range(3):
                A[6 * j + 3 * t + k, k] = 2.0 ** j
                b[6 * j + 3 * t + k, 0] = t * (np.pi / 2.0)
    return jnp.asarray(A), jnp.asarray(b)


def _pe_row_map(L: int) -> np.ndarray:
    """Kernel K-row index for each original PE feature row.

    Original layout (nerf_embed): [p(3), sin f0(3), cos f0(3), ...].
    Kernel layout: [p padded to 8 | sin f0, cos f0, ... padded to 8-mult].
    """
    idx = np.empty(3 + 6 * L, np.int64)
    idx[0:3] = [0, 1, 2]
    for r in range(6 * L):
        idx[3 + r] = 8 + r
    return idx


class FusedNeRFParamsT(NamedTuple):
    """Transposed-layout params; int8 mode carries scales, bf16 mode
    carries m=None sentinels (empty arrays)."""
    pts_w: tuple      # per layer [W, K_rows] (wT)
    pts_m: tuple      # [W, 1] dequant multipliers (int8) or dummy
    pts_b: tuple      # [W, 1]
    pts_inv: tuple    # [K_rows, 1] inverse input scales (int8) or dummy
    alpha_w: Array    # [8, W] (row 0 used)
    alpha_m: Array
    alpha_b: Array
    feat_w: Array     # [W, W]
    feat_m: Array
    feat_b: Array
    h_inv: Array      # [W, 1]
    views_w: Array    # [h_pad, W + v_rows]
    views_m: Array
    views_b: Array
    hv_inv: Array     # [W + v_rows, 1]
    rgb_w: Array      # [8, h_pad] (rows 0..2 used)
    rgb_m: Array
    rgb_b: Array
    hr_inv: Array     # [h_pad, 1]
    out_w: Array      # [8, W] no-viewdirs head (output_ch rows)
    out_m: Array
    out_b: Array


def _fold_chain(pts_m, pts_b, pts_inv, cfg, k_pts: int, h_inv):
    """Pre-multiply each pts-chain consumer's inverse input scale into
    its producer's dequant m/b (relu commutes with the positive scale);
    the last chain layer absorbs h_inv (its output feeds the heads'
    quantize)."""
    pts_m, pts_b = list(pts_m), list(pts_b)
    for li in range(1, len(pts_m)):
        inv_next = (pts_inv[li][k_pts:, :] if (li - 1) in cfg.skips
                    else pts_inv[li])
        pts_m[li - 1] = pts_m[li - 1] * inv_next
        pts_b[li - 1] = pts_b[li - 1] * inv_next
    pts_m[-1] = pts_m[-1] * h_inv
    pts_b[-1] = pts_b[-1] * h_inv
    return tuple(pts_m), tuple(pts_b)


def _quant_rows_scaled_t(wt: Array, s_in: Array) -> tuple[Array, Array]:
    """Transposed twin of _quant_cols_scaled: wt [out, in] float, s_in
    [in] -> (int8 [out, in], per-out-ROW multiplier [out, 1])."""
    w_eff = wt.astype(jnp.float32) * s_in[None, :]
    ws = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=1, keepdims=True),
                     1e-12) / 127.0
    q = jnp.clip(jnp.round(w_eff / ws), -127, 127).astype(jnp.int8)
    return q, ws.astype(jnp.float32)


def prepare_fused_nerf_t(params: dict, cfg: NeRFConfig, L_pts: int,
                         L_views: int, calib: tuple | None = None,
                         weight_dtype=jnp.bfloat16,
                         margin: float = 1.1,
                         fold_requant: bool = False) -> FusedNeRFParamsT:
    """Pack teacher params for the transposed kernel.

    ``calib=(pts [n,3], viewdirs [n,3]|None)`` switches to static-scale
    int8 (per-(layer, channel) activation scales absorbed into the weight
    quantization — the R2L recipe). Without it, weights are cast to
    ``weight_dtype`` and the m/inv slots hold empty sentinels.

    ``fold_requant`` (int8 only): pre-multiply each consumer layer's
    inverse input scale into its producer's dequant m/b (relu commutes
    with the positive per-channel scale; the feature head is linear), so
    every in-kernel activation requantize is round+clip with no multiply
    — the student kernel's round-3 epilogue win (PERF.md). Must be
    paired with ``fold_requant=True`` on ``fused_nerf_render_t``. The
    viewdir-PE slice of hv_inv is NOT folded (the PE has no producer
    layer); the kernel still uses it at sample 0.
    """
    W = cfg.W
    h_pad = _round_up(W // 2, _LANE)
    k_pts = 8 + _round_up(6 * L_pts, 8)
    v_rows = 8 + _round_up(6 * L_views, 8)
    row_map_p = _pe_row_map(L_pts)
    row_map_v = _pe_row_map(L_views)
    int8 = calib is not None
    none = jnp.zeros((1, 1), jnp.float32)

    # f32 calibration forward (original layout) capturing input scales.
    if int8:
        c_pts, c_vd = calib
        x = _embed_f32(c_pts.astype(jnp.float32), L_pts)    # [n, 63]
        s_x = (jnp.maximum(jnp.max(jnp.abs(x), axis=0), 1e-6)
               * (margin / 127.0))

    def pack_rows(w, row_map, k_rows):
        """[in_orig, out] -> transposed [out, k_rows] with row remap."""
        wt = jnp.zeros((w.shape[1], k_rows), jnp.float32)
        return wt.at[:, row_map].set(w.astype(jnp.float32).T)

    def s_of(a):
        return (jnp.maximum(jnp.max(jnp.abs(a), axis=0), 1e-6)
                * (margin / 127.0))

    pts_w, pts_m, pts_b, pts_inv = [], [], [], []
    h = x if int8 else None
    for i, layer in enumerate(params["pts_linears"]):
        w = layer["w"]
        if i == 0:
            wt = pack_rows(w, row_map_p, k_pts)
            s_pack = (jnp.ones((k_pts,), jnp.float32)
                      .at[row_map_p].set(s_x) if int8 else None)
        elif (i - 1) in cfg.skips:
            wt = jnp.zeros((W, k_pts + W), jnp.float32)
            wt = wt.at[:, row_map_p].set(
                w[:cfg.input_ch].astype(jnp.float32).T)
            wt = wt.at[:, k_pts:].set(w[cfg.input_ch:].astype(jnp.float32).T)
            if int8:
                s_h = s_of(h)
                s_pack = jnp.concatenate([
                    jnp.ones((k_pts,), jnp.float32).at[row_map_p].set(s_x),
                    s_h])
        else:
            wt = w.astype(jnp.float32).T
            s_pack = s_of(h) if int8 else None
        if int8:
            q, m = _quant_rows_scaled_t(wt, s_pack)
            pts_w.append(q)
            pts_m.append(m)
            pts_inv.append((1.0 / s_pack).reshape(-1, 1))
            inp = (jnp.concatenate([x, h], axis=1)
                   if (i > 0 and (i - 1) in cfg.skips) else (x if i == 0 else h))
            h = jax.nn.relu(inp @ layer["w"].astype(jnp.float32)
                            + layer["b"].astype(jnp.float32))
        else:
            pts_w.append(wt.astype(weight_dtype))
            pts_m.append(none)
            pts_inv.append(none)
        pts_b.append(layer["b"].astype(jnp.float32).reshape(-1, 1))

    def pack_head(w, out_rows, s_in=None):
        """[in, out] -> transposed, row-padded ([out_rows, in], m)."""
        wt = jnp.zeros((out_rows, w.shape[0]), jnp.float32)
        wt = wt.at[:w.shape[1]].set(w.astype(jnp.float32).T)
        if s_in is not None:
            return _quant_rows_scaled_t(wt, s_in)
        return wt.astype(weight_dtype), none

    if cfg.use_viewdirs:
        s_h = s_of(h) if int8 else None
        aw, am = pack_head(params["alpha_linear"]["w"], 8, s_in=s_h)
        ab = jnp.zeros((8, 1), jnp.float32).at[0, 0].set(
            params["alpha_linear"]["b"].astype(jnp.float32)[0])
        fw_, fm = pack_head(params["feature_linear"]["w"], W, s_in=s_h)
        fb = params["feature_linear"]["b"].astype(jnp.float32).reshape(-1, 1)

        vw = params["views_linears"][0]["w"]        # [W + n_v, W//2]
        vwt = jnp.zeros((h_pad, W + v_rows), jnp.float32)
        vwt = vwt.at[:W // 2, :W].set(vw[:W].astype(jnp.float32).T)
        vwt = vwt.at[:W // 2, W + row_map_v[:cfg.input_ch_views]].set(
            vw[W:].astype(jnp.float32).T)
        if int8:
            feat = (h @ params["feature_linear"]["w"].astype(jnp.float32)
                    + params["feature_linear"]["b"].astype(jnp.float32))
            vd_e = _embed_f32(c_vd.astype(jnp.float32), L_views)
            s_hv = jnp.concatenate([
                s_of(feat),
                jnp.ones((v_rows,), jnp.float32)
                .at[row_map_v].set(s_of(vd_e))])
            vq, vm = _quant_rows_scaled_t(vwt, s_hv)
            hv = jax.nn.relu(
                jnp.concatenate([feat, vd_e], axis=1)
                @ vw.astype(jnp.float32)
                + params["views_linears"][0]["b"].astype(jnp.float32))
            s_hr = jnp.ones((h_pad,), jnp.float32).at[:W // 2].set(s_of(hv))
            # rgb_w input is [h_pad, T] padded — pack with padded rows
            rwt = jnp.zeros((8, h_pad), jnp.float32)
            rwt = rwt.at[:3, :W // 2].set(
                params["rgb_linear"]["w"].astype(jnp.float32).T)
            rw, rm = _quant_rows_scaled_t(rwt, s_hr)
            hv_inv = (1.0 / s_hv).reshape(-1, 1)
            hr_inv = (1.0 / s_hr).reshape(-1, 1)
            h_inv = (1.0 / s_h).reshape(-1, 1)
        else:
            rwt = jnp.zeros((8, h_pad), jnp.float32)
            rwt = rwt.at[:3, :W // 2].set(
                params["rgb_linear"]["w"].astype(jnp.float32).T)
            vq, vm = vwt.astype(weight_dtype), none
            rw, rm = rwt.astype(weight_dtype), none
            hv_inv = hr_inv = h_inv = none
        vb = jnp.zeros((h_pad, 1), jnp.float32).at[:W // 2, 0].set(
            params["views_linears"][0]["b"].astype(jnp.float32))
        rb = jnp.zeros((8, 1), jnp.float32).at[:3, 0].set(
            params["rgb_linear"]["b"].astype(jnp.float32))
        if int8 and fold_requant:
            pts_m, pts_b = _fold_chain(pts_m, pts_b, pts_inv, cfg, k_pts,
                                       h_inv)
            fm, fb = fm * hv_inv[:W, :], fb * hv_inv[:W, :]
            vm, vb = vm * hr_inv, vb * hr_inv
        z8 = jnp.zeros((2, 2), pts_w[0].dtype)
        return FusedNeRFParamsT(
            tuple(pts_w), tuple(pts_m), tuple(pts_b), tuple(pts_inv),
            aw, am, ab, fw_, fm, fb, h_inv, vq, vm, vb, hv_inv,
            rw, rm, rb, hr_inv, z8, none, none)

    s_h = s_of(h) if int8 else None
    ow_ = params["output_linear"]["w"]
    owt = jnp.zeros((8, W), jnp.float32)
    owt = owt.at[:ow_.shape[1]].set(ow_.astype(jnp.float32).T)
    if int8:
        oq, om = _quant_rows_scaled_t(owt, s_h)
        h_inv = (1.0 / s_h).reshape(-1, 1)
    else:
        oq, om = owt.astype(weight_dtype), none
        h_inv = none
    ob = jnp.zeros((8, 1), jnp.float32).at[:ow_.shape[1], 0].set(
        params["output_linear"]["b"].astype(jnp.float32))
    if int8 and fold_requant:
        pts_m, pts_b = _fold_chain(pts_m, pts_b, pts_inv, cfg, k_pts,
                                   h_inv)
    z8 = jnp.zeros((2, 2), pts_w[0].dtype)
    return FusedNeRFParamsT(
        tuple(pts_w), tuple(pts_m), tuple(pts_b), tuple(pts_inv),
        z8, none, none, z8, none, none, h_inv,
        z8, none, none, none, z8, none, none, none,
        oq, om, ob)


@functools.partial(jax.jit, static_argnames=("cfg", "L_pts", "L_views",
                                             "white_bkgd", "tile", "int8",
                                             "pe_ladder", "interpret",
                                             "fold_requant",
                                             "sample_pairs",
                                             "bf16_requant"))
def fused_nerf_render_t(fp: FusedNeRFParamsT, cfg: NeRFConfig,
                        rays_o: Array, rays_d: Array, z_vals: Array,
                        L_pts: int = 10, L_views: int = 4,
                        white_bkgd: bool = False, tile: int = 2048,
                        int8: bool = False, pe_ladder: bool = True,
                        interpret: bool | None = None,
                        fold_requant: bool = False,
                        sample_pairs: bool | int = False,
                        bf16_requant: bool = False):
    """Transposed-layout volumetric pass; same contract as
    ``fused_nerf_render`` (rgb [N,3], acc [N], depth [N], weights [N,S]).
    ``fold_requant`` needs params packed with the same flag: activation
    requantizes become round+clip (scales pre-folded into the producers'
    dequant constants).

    ``bf16_requant`` (int8 only): carry the inter-layer dequant·m+b
    arithmetic and relu of INTERMEDIATE activations in bf16 instead of
    f32 (halves the VPU element cost of the requant epilogue the r4
    decomposition showed the kernel is bound on). Lossy: the bf16
    product rounds at 2^-9 relative — comparable to the int8 LSB the
    very next round/clip quantizes to, but it can flip which integer a
    borderline value rounds to. Heads (sigma, rgb) stay f32 so the
    compositing math is untouched. Measure, don't assume (PERF.md r5).

    ``sample_pairs`` processes P samples per grid step (True == 2; 2/4/8
    accepted, must divide 8) as P INDEPENDENT interleaved MLP chains
    (compositing stays sequential, in-register). Why: the r4
    decomposition (PERF.md) showed the int8 kernel is VPU-bound on the
    inter-layer requantize epilogue (~160 ms of VPU work vs ~100 ms of
    MXU per canonical frame) and a single sample's chain serializes them
    (each matmul consumes the previous requant); in-flight siblings give
    the scheduler one sample's epilogue to run under another's matmul.
    Measured: P=2 at tile 4096 is −4.6% per frame, bit-identical output
    (exp/probe_teacher_decomp.jsonl r4_pairs_*). Needs S % P == 0 (falls
    back to P=1 otherwise) and VMEM for P activation sets.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, S = z_vals.shape
    P = int(sample_pairs) if not isinstance(sample_pairs, bool) else \
        (2 if sample_pairs else 1)
    assert P in (1, 2, 4, 8), f"sample_pairs P={P} must divide 8"
    if S % P != 0:
        P = 1  # odd/misaligned sample count: plain path
    n_pad = _round_up(max(n, 1), tile)
    W = cfg.W
    k_pts = 8 + _round_up(6 * L_pts, 8)
    v_rows = 8 + _round_up(6 * L_views, 8)
    n_layers = len(fp.pts_w)
    cd = jnp.bfloat16 if int8 else fp.pts_w[0].dtype
    A_p, b_p = _pe_matrix(L_pts)
    A_v, b_v = _pe_matrix(L_views)
    S8 = _round_up(S, 8)

    def pad_t3(x):
        out = jnp.zeros((8, n_pad), jnp.float32)
        return out.at[:3, :n].set(x.astype(jnp.float32).T)

    def pad_t(x):
        out = jnp.zeros((S8, n_pad), jnp.float32)
        return out.at[:S, :n].set(x.astype(jnp.float32).T)

    ro_t, rd_t = pad_t3(rays_o), pad_t3(rays_d)
    zv = z_vals.astype(jnp.float32)
    z_next = jnp.concatenate([zv[:, 1:], zv[:, -1:] + 1e10], axis=1)
    zv_t, znx_t = pad_t(zv), pad_t(jnp.asarray(z_next))

    def q8r(x, inv):        # row-scale int8 quantize ([rows,1] broadcast)
        return jnp.clip(jnp.round(x * inv), -127.0, 127.0
                        ).astype(jnp.int8)

    def q8n(x, inv):
        """Requantize of a produced activation: with fold_requant the
        producer's dequant constants already carry ``inv``."""
        # Mosaic cannot legalize math.roundeven on bf16 vectors (same
        # gap PERF.md r3 recorded for the student kernel) — under
        # bf16_requant the dequant/relu arithmetic stays bf16 and only
        # this final round/clip upcasts to f32.
        x = x.astype(jnp.float32)
        if fold_requant:
            return jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)
        return q8r(x, inv)

    def kern(ro_ref, rd_ref, z_ref, znx_ref, Ap, bp, Av, bv, *refs):
        pw = refs[:n_layers]
        pm = refs[n_layers:2 * n_layers]
        pb = refs[2 * n_layers:3 * n_layers]
        pinv = refs[3 * n_layers:4 * n_layers]
        (aw, am, ab, fw, fm, fb, h_inv, vw, vm, vb, hv_inv, rw, rm, rb,
         hr_inv, ow, om, ob,
         out_ref, w_ref, trans_ref, views_ref) = refs[4 * n_layers:]
        j = pl.program_id(1)
        S_total = pl.num_programs(1)

        d3 = rd_ref[0:3, :]                              # [3, T]
        d_norm = jnp.sqrt(jnp.sum(d3 * d3, axis=0, keepdims=True))

        def mmT(w_r, x, m_r, b_r, f32_out=False):
            if int8:
                acc = jnp.dot(w_r[...], x,
                              preferred_element_type=jnp.int32)
                if bf16_requant and not f32_out:
                    # intermediate dequant in bf16 (docstring above):
                    # the following round/clip re-quantizes to int8
                    # anyway; heads pass f32_out=True.
                    return (acc.astype(jnp.bfloat16)
                            * m_r[...].astype(jnp.bfloat16)
                            + b_r[...].astype(jnp.bfloat16))
                return acc.astype(jnp.float32) * m_r[...] + b_r[...]
            # f32 weights must honor cfg.precision (XLA's _linear does).
            # Mosaic's dot lowering supports only DEFAULT and HIGHEST —
            # 'high' (3-pass) promotes to 'highest' (6-pass): at least as
            # accurate as requested, never silently less.
            prec = (None if (cd != jnp.float32
                             or cfg.precision == "default")
                    else "highest")
            acc = jnp.dot(w_r[...].astype(cd), x,
                          preferred_element_type=jnp.float32,
                          precision=prec)
            return acc + b_r[...]

        def embed_t(p3, A, bias, L, inv):
            """[3,T] -> [8 + rows8, T] PE block ([p|sin f0|cos f0|...])."""
            T = p3.shape[1]
            if pe_ladder:
                # sin/cos double-angle ladder: 2 transcendental passes on
                # [3,T] + (L-1) doubling recurrences instead of one sin()
                # over [6L,T] (~10x fewer transcendentals; error ~2^L ulp,
                # the same bound the student kernel ships — PERF.md).
                s, c = jnp.sin(p3), jnp.cos(p3)
                parts = [p3, jnp.zeros((5, T), jnp.float32)]
                for jj in range(L):
                    parts += [s, c]
                    if jj + 1 < L:
                        s, c = 2.0 * s * c, (c - s) * (c + s)
                pad = _round_up(6 * L, 8) - 6 * L
                if pad:
                    parts.append(jnp.zeros((pad, T), jnp.float32))
                xx = jnp.concatenate(parts, axis=0)
            else:
                # One [rows8,3]@[3,T] matmul + a single sin() pass
                # (cos(x) = sin(x + pi/2) via the bias column). Always
                # full-precision: y feeds sin() at octaves up to 2^(L-1);
                # a bf16-rounded product is a phase error of up to
                # |p|·2^(L-10) radians. K=3, so the cost is nil.
                y = jnp.dot(A[...].astype(jnp.float32), p3,
                            preferred_element_type=jnp.float32,
                            precision="highest") + bias[...]
                sc = jnp.sin(y)
                xx = jnp.concatenate(
                    [p3, jnp.zeros((5, T), jnp.float32), sc], axis=0)
            if int8:
                return q8r(xx, inv)
            return xx.astype(cd)

        @pl.when(j == 0)
        def _init():
            trans_ref[...] = jnp.ones_like(trans_ref)
            out_ref[...] = jnp.zeros_like(out_ref)
            if cfg.use_viewdirs:
                vd = d3 / jnp.maximum(d_norm, 1e-12)
                inv_v = hv_inv[...][W:, :] if int8 else None
                views_ref[...] = embed_t(vd, Av, bv, L_views, inv_v)

        def sample_inputs(r):
            """z row r of the current block -> (z_i, dist, int8/bf16 PE)."""
            z_i = z_ref[pl.ds(r, 1), :]                  # [1, T]
            z_n = znx_ref[pl.ds(r, 1), :]
            dist = (z_n - z_i) * d_norm
            p3 = ro_ref[0:3, :] + d3 * z_i               # [3, T]
            xq = embed_t(p3, Ap, bp, L_pts,
                         pinv[0][...] if int8 else None)  # [k_pts, T]
            return z_i, dist, xq

        def chain(xq):
            """The full MLP for one sample -> (sigma [1,T], rgb_raw)."""
            h = jnp.maximum(mmT(pw[0], xq, pm[0], pb[0]), 0.0)
            h = h.astype(cd) if not int8 else h
            for li in range(1, n_layers):
                if int8:
                    if (li - 1) in cfg.skips:
                        hq = q8n(h, pinv[li][...][k_pts:, :])
                        q = jnp.concatenate([xq, hq], axis=0)
                    else:
                        q = q8n(h, pinv[li][...])
                else:
                    if (li - 1) in cfg.skips:
                        q = jnp.concatenate([xq, h.astype(cd)], axis=0)
                    else:
                        q = h.astype(cd)
                h = jnp.maximum(mmT(pw[li], q, pm[li], pb[li]), 0.0)
                if not int8:
                    h = h.astype(cd)

            hq = q8n(h, h_inv[...]) if int8 else h.astype(cd)
            if cfg.use_viewdirs:
                sigma = mmT(aw, hq, am, ab, f32_out=True)[0:1, :]  # [1,T]
                feat = mmT(fw, hq, fm, fb)               # [W, T]
                if int8:
                    fq = q8n(feat, hv_inv[...][:W, :])
                else:
                    fq = feat.astype(cd)
                hv_in = jnp.concatenate([fq, views_ref[...]], axis=0)
                hv = jnp.maximum(mmT(vw, hv_in, vm, vb), 0.0)
                hvq = q8n(hv, hr_inv[...]) if int8 else hv.astype(cd)
                rgb_raw = mmT(rw, hvq, rm, rb, f32_out=True)  # [8, T]
            else:
                rgb_raw = mmT(ow, hq, om, ob, f32_out=True)   # [8, T]
                sigma = rgb_raw[3:4, :]
            return sigma, rgb_raw

        def composite(sigma, rgb_raw, z_i, dist, r, trans):
            """One raw2outputs step; returns (contrib [8,T], new trans)."""
            alpha = 1.0 - jnp.exp(-jnp.maximum(sigma, 0.0) * dist)
            w = alpha * trans                            # [1, T]
            w_ref[pl.ds(r, 1), :] = w
            rgb_c = w * jax.nn.sigmoid(rgb_raw[0:3, :])  # [3, T]
            contrib = jnp.concatenate(
                [rgb_c, w, w * z_i,
                 jnp.zeros((3, w.shape[1]), jnp.float32)], axis=0)
            return contrib, trans * (1.0 - alpha + 1e-10)

        # P samples per step as P INDEPENDENT chains (the scheduler
        # overlaps one chain's requant epilogue with another's matmuls);
        # compositing stays sequential, in-register.
        trans = trans_ref[...]
        r0 = (P * j) % 8          # P | 8 -> all P rows share the block
        inputs = [sample_inputs(r0 + t) for t in range(P)]
        chains = [chain(xq) for (_, _, xq) in inputs]
        acc_out = out_ref[...]
        for t in range(P):
            z_i, dist, _ = inputs[t]
            sig, rgb_raw = chains[t]
            c, trans = composite(sig, rgb_raw, z_i, dist, r0 + t, trans)
            acc_out = acc_out + c
        trans_ref[...] = trans

        if white_bkgd:
            @pl.when(j == S_total - 1)
            def _white():
                a = acc_out[3:4, :]
                out_ref[...] = acc_out + jnp.concatenate(
                    [jnp.broadcast_to(1.0 - a, (3, a.shape[1])),
                     jnp.zeros((5, a.shape[1]), jnp.float32)], axis=0)

            @pl.when(j < S_total - 1)
            def _nowhite():
                out_ref[...] = acc_out
        else:
            out_ref[...] = acc_out

    const = lambda i, j: (0, 0)  # noqa: E731
    # z blocks hold 8 sample rows; a grid step consumes 1 (or 2) of them
    per_step = P
    zmap = lambda i, j: (j * per_step // 8, i)  # noqa: E731
    in_specs = [
        pl.BlockSpec((8, tile), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tile), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tile), zmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tile), zmap, memory_space=pltpu.VMEM),
        pl.BlockSpec(A_p.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(b_p.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(A_v.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(b_v.shape, const, memory_space=pltpu.VMEM),
    ]
    operands = [ro_t, rd_t, zv_t, znx_t, A_p, b_p, A_v, b_v]
    for group in (fp.pts_w, fp.pts_m, fp.pts_b, fp.pts_inv):
        for arr in group:
            in_specs.append(pl.BlockSpec(arr.shape, const,
                                         memory_space=pltpu.VMEM))
            operands.append(arr)
    for arr in (fp.alpha_w, fp.alpha_m, fp.alpha_b, fp.feat_w, fp.feat_m,
                fp.feat_b, fp.h_inv, fp.views_w, fp.views_m, fp.views_b,
                fp.hv_inv, fp.rgb_w, fp.rgb_m, fp.rgb_b, fp.hr_inv,
                fp.out_w, fp.out_m, fp.out_b):
        in_specs.append(pl.BlockSpec(arr.shape, const,
                                     memory_space=pltpu.VMEM))
        operands.append(arr)

    packed, weights_t = pl.pallas_call(
        kern,
        grid=(n_pad // tile, S // per_step),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((8, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), zmap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((S8, n_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, tile), jnp.float32),            # transmittance
            pltpu.VMEM((v_rows, tile),
                       jnp.int8 if int8 else cd),          # viewdir PE
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return (packed[0:3, :n].T, packed[3, :n], packed[4, :n],
            weights_t[:S, :n].T)
