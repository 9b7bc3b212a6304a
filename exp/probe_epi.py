"""Probe: cheaper int8 requantize epilogue variants, measured e2e
(16 frames per jit, lax.map, tile 800 — same protocol as bench.py).

V0: production chain (baseline, from r2l_pallas._int8_pe_chain)
V1: quantize in bf16 (t_bf16 * inv_bf16 -> round/clip -> int8)
V2: V1 + inner-layer ReLU folded into the quantize clip lower bound 0
    (the bf16 cast happens pre-ReLU; ReLU disappears as an op)

Appends JSONL to exp/probe_epi.jsonl.
"""
import functools
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

from r2l_tpu.evaluate import _prepare_r2l
from r2l_tpu.kernels.r2l_pallas import (_pe_sin_cos_ladder, _q8, _round_up,
                                        fused_r2l_apply_int8_pe)
from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler

H = W = 400
FOCAL = 555.5555155968841
K = 16
L = 10
TILE = 800
OUT = "exp/probe_epi.jsonl"


def log(rec):
    print(rec)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def chain_variant(p, fp, o_ref, *, cfg, dim_pts, L, in_dim, in_pad,
                  variant):
    (head_q, head_m, head_b, head_inv, body_q, body_m, body_b, body_inv,
     tail_q, tail_m, tail_b, tail_inv) = fp
    nb, nl = cfg.num_blocks, cfg.n_learnable
    sins, coss = _pe_sin_cos_ladder(p, L)
    parts = []
    for j in range(L):
        parts.append(_q8(sins[j], head_inv[:, pl.ds(j * dim_pts, dim_pts)]))
    for j in range(L):
        parts.append(_q8(coss[j],
                         head_inv[:, pl.ds((L + j) * dim_pts, dim_pts)]))
    parts.append(_q8(p, head_inv[:, pl.ds(2 * L * dim_pts, dim_pts)]))
    pad = in_pad - in_dim
    if pad:
        parts.append(jnp.zeros((p.shape[0], pad), jnp.int8))
    xq = jnp.concatenate(parts, axis=1)

    acc = jnp.dot(xq, head_q[...], preferred_element_type=jnp.int32)
    h0 = jnp.maximum(acc.astype(jnp.float32) * head_m[...]
                     + head_b[...], 0.0)
    h = h0.astype(jnp.bfloat16)

    for i in range(nb):
        h_in = h
        t = h
        relu_pending = False
        for j in range(nl):
            idx = i * nl + j
            inv = body_inv[pl.ds(idx, 1), :]
            if variant == 0:
                q = _q8(t.astype(jnp.float32), inv)
            else:
                lo = 0.0 if relu_pending else -127.0
                q = jnp.clip(jnp.round(t * inv.astype(jnp.bfloat16)),
                             lo, 127.0).astype(jnp.int8)
            acc = jnp.dot(q, body_q[idx], preferred_element_type=jnp.int32)
            tf = (acc.astype(jnp.float32) * body_m[pl.ds(idx, 1), :]
                  + body_b[pl.ds(idx, 1), :])
            relu_pending = False
            if j < nl - 1:
                if variant == 2:
                    relu_pending = True   # folded into next quantize clip
                else:
                    tf = jnp.maximum(tf, 0.0)
            t = tf.astype(jnp.bfloat16)
        h = (t.astype(jnp.float32)
             + h_in.astype(jnp.float32)).astype(jnp.bfloat16)
    hf = h.astype(jnp.float32)
    if cfg.use_residual:
        hf = hf + h0
    q = _q8(hf, tail_inv[...])
    acc = jnp.dot(q, tail_q[...], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * tail_m[...] + tail_b[...]
    if not cfg.linear_tail:
        out = jax.nn.sigmoid(out)
    o_ref[...] = out


@functools.partial(jax.jit,
                   static_argnames=("cfg", "dim_pts", "L", "tile",
                                    "variant"))
def apply_variant(fp, cfg, pts, dim_pts, L, tile, variant):
    n = pts.shape[0]
    in_pad = fp.head_q.shape[0]
    out_pad = fp.tail_q.shape[1]
    n_pad = _round_up(max(n, 1), tile)
    in_dim = dim_pts * (2 * L + 1)
    pp = pts.astype(jnp.float32) if n_pad == n else jnp.zeros(
        (n_pad, dim_pts), jnp.float32).at[:n].set(pts.astype(jnp.float32))

    def kern(p_ref, *refs):
        o_ref = refs[-1]
        chain_variant(p_ref[...], refs[:-1], o_ref, cfg=cfg,
                      dim_pts=dim_pts, L=L, in_dim=in_dim, in_pad=in_pad,
                      variant=variant)

    W_ = cfg.netwidth
    nbl = fp.body_q.shape[0]
    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, dim_pts), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_pad, W_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, in_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W_, W_), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, W_), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W_, out_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W_), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
        interpret=False,
    )(pp, *fp)
    return out[:n, :cfg.output_dim]


def main():
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=16,
                           near=2.0, far=6.0)
    poses = jnp.asarray(np.stack(
        [pose_spherical(t, -30.0, 4.0)[:3, :4]
         for t in np.linspace(-180, 180, K, endpoint=False)]))
    fp, kind, dim_pts, _ = _prepare_r2l(params, cfg, sampler, L, False,
                                        True, "int8")

    # accuracy reference: production kernel on one frame
    pts0 = sampler.sample_test(poses[0])
    ref = np.asarray(fused_r2l_apply_int8_pe(fp, cfg, pts0, dim_pts, L,
                                             tile=TILE))

    for variant in (0, 1, 2):
        @jax.jit
        def render_k(fp, poses, v=variant):
            def frame(c2w):
                pts = sampler.sample_test(c2w)
                rgb = apply_variant(fp, cfg, pts, dim_pts, L, TILE, v)
                return jnp.sum(rgb)
            return jnp.sum(jax.lax.map(frame, poses))

        try:
            t0 = time.perf_counter()
            float(render_k(fp, poses))
            cs = time.perf_counter() - t0
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(render_k(fp, poses))
                times.append(time.perf_counter() - t0)
            ms = 1000.0 * min(times) / K
            out = np.asarray(apply_variant(fp, cfg, pts0, dim_pts, L,
                                           TILE, variant))
            err = float(np.max(np.abs(out - ref)))
            log({"name": f"epi_v{variant}", "ms_per_frame": round(ms, 3),
                 "fps": round(1000.0 / ms, 2), "compile_s": round(cs, 1),
                 "max_abs_err_vs_prod": err})
        except Exception as e:  # noqa: BLE001
            log({"name": f"epi_v{variant}", "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
