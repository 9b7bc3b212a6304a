"""Probe 10: fully-fused volumetric pass vs XLA (canonical teacher frame).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python exp/probe_teacher2.py
"""
from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from r2l_tpu.encoding import nerf_embed_dim
from r2l_tpu.kernels.nerf_render_pallas import (fused_nerf_render,
                                                prepare_fused_nerf)
from r2l_tpu.models.nerf import NeRFConfig, init_nerf
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler
from r2l_tpu.volume import sample_pdf

H = W = 400
FOCAL = 555.5555155968841
K = 4
OUT = "exp/probe10.jsonl"


def log(rec):
    rec["ts"] = time.time()
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    log({"name": "device", "kind": str(jax.devices()[0].device_kind)})
    ncfg = NeRFConfig(D=8, W=256, input_ch=nerf_embed_dim(3, 10),
                      input_ch_views=nerf_embed_dim(3, 4), output_ch=5,
                      skips=(4,), use_viewdirs=True,
                      compute_dtype=jnp.bfloat16, precision="default")
    k1, k2 = jax.random.split(jax.random.key(0))
    pc, pf = init_nerf(k1, ncfg), init_nerf(k2, ncfg)
    fpc = prepare_fused_nerf(pc, ncfg)
    fpf = prepare_fused_nerf(pf, ncfg)
    sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=64,
                           near=2.0, far=6.0)
    poses = jnp.asarray(np.stack(
        [pose_spherical(t, -30.0, 4.0)[:3, :4]
         for t in np.linspace(-180, 180, K, endpoint=False)]))
    n_c, n_f = 64, 128

    for tile, chunk in [(1024, 40000), (2048, 40000), (4096, 160000)]:
        name = f"fullfused_t{tile}_c{chunk}"

        def frame(c2w):
            ro, rd = sampler.frame_rays(c2w)

            def body(args):
                o, d = args
                t = jnp.linspace(0.0, 1.0, n_c, dtype=jnp.float32)
                z = jnp.broadcast_to(2.0 * (1 - t) + 6.0 * t,
                                     (o.shape[0], n_c))
                rgb0, acc0, dep0, w = fused_nerf_render(
                    fpc, ncfg, o, d, z, white_bkgd=True, tile=tile)
                zm = 0.5 * (z[:, 1:] + z[:, :-1])
                zs = sample_pdf(None, zm, w[:, 1:-1], n_f, det=True)
                za = jnp.sort(jnp.concatenate([z, zs], -1), -1)
                rgb, acc, dep, _ = fused_nerf_render(
                    fpf, ncfg, o, d, za, white_bkgd=True, tile=tile)
                return jnp.sum(rgb)

            n = ro.shape[0]
            ro = ro.reshape(n // chunk, chunk, 3)
            rd = rd.reshape(n // chunk, chunk, 3)
            return jnp.sum(jax.lax.map(body, (ro, rd)))

        @jax.jit
        def render_k(poses):
            return jnp.sum(jax.lax.map(frame, poses))

        t0 = time.time()
        try:
            float(render_k(poses))
        except Exception as e:  # noqa: BLE001
            log({"name": name, "error": repr(e)[:300]})
            continue
        cs = time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(render_k(poses))
            times.append(time.perf_counter() - t0)
        log({"name": name, "ms_per_frame": round(min(times) / K * 1e3, 1),
             "compile_s": round(cs, 1)})
    log({"name": "done"})


if __name__ == "__main__":
    main()
