"""Probe 9: teacher volumetric frame — XLA vs fused NeRF-query kernel.

Canonical teacher (D=8/W=256, 64 coarse + 128 fine, use_viewdirs) on a
400x400 frame, honest protocol (K frames in one jit). Decides the fused
kernel's fate (VERDICT item 8): beat XLA or be deleted.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python exp/probe_teacher.py
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
from r2l_tpu.models.nerf import NeRFConfig, init_nerf
from r2l_tpu.rays import pose_spherical
from r2l_tpu.render import (VolRenderConfig, make_fused_nerf_query,
                            render_frame_nerf)
from r2l_tpu.sampler import PointSampler

H = W = 400
FOCAL = 555.5555155968841
K = 4
OUT = "exp/probe9.jsonl"


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
    vcfg = VolRenderConfig(n_coarse=64, n_fine=128, perturb=False,
                           white_bkgd=True, use_viewdirs=True,
                           near=2.0, far=6.0, ray_chunk=32768)
    sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=64,
                           near=2.0, far=6.0)
    poses = jnp.asarray(np.stack(
        [pose_spherical(t, -30.0, 4.0)[:3, :4]
         for t in np.linspace(-180, 180, K, endpoint=False)]))

    for name, fused, tile in [("xla", False, 0),
                              ("fused_t2048", True, 2048),
                              ("fused_t4096", True, 4096)]:
        qc = qf = None
        if fused:
            try:
                qc = make_fused_nerf_query(pc, ncfg, tile=tile)
                qf = make_fused_nerf_query(pf, ncfg, tile=tile)
            except Exception as e:  # noqa: BLE001
                log({"name": name, "error": repr(e)[:200]})
                continue

        @jax.jit
        def render_k(poses):
            def one(c2w):
                ro, rd = sampler.frame_rays(c2w)
                out = render_frame_nerf(pc, pf, ncfg, vcfg, ro, rd,
                                        query_coarse=qc, query_fine=qf)
                return jnp.sum(out["rgb"])
            return jnp.sum(jax.lax.map(one, poses))

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
        dt = min(times) / K
        log({"name": name, "ms_per_frame": round(dt * 1e3, 1),
             "compile_s": round(cs, 1)})
    log({"name": "done"})


if __name__ == "__main__":
    main()
