"""Headline benchmark: lego-class 400x400 full-frame R2L render throughput.

Times the flagship inference path (the reference's north-star workload,
`main.py:1124-1133` --benchmark: full-frame sample -> positional encode ->
88-layer W256 residual MLP -> RGB) on whatever device JAX sees (one TPU
chip under the driver). Prints ONE JSON line.

Timing protocol: K full frames rendered inside ONE jit (sequential
``lax.map`` over poses) with a single scalar checksum read back. This
measures pure device throughput — per-call dispatch through this image's
TPU tunnel costs ~30 ms RTT and `block_until_ready` does not reliably
block, so naive per-frame timing is meaningless here.

``vs_baseline`` is measured against the BASELINE.json north star of
100 FPS on one TPU chip (the reference achieves ~3.5 FPS on an RTX 2080 Ti:
8.5 s/frame teacher at ~30x the student's cost, README.md:17,87).
"""
from __future__ import annotations

import json
import time

import jax

# Persistent compile cache: first compiles through this image's remote-
# compile tunnel take 30-90 s; caching makes repeat runs instant.
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from r2l_tpu.encoding import r2l_embed
from r2l_tpu.kernels.r2l_pallas import (fused_r2l_apply_pe,
                                        prepare_fused_params_pe)
from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler

BASELINE_FPS = 100.0  # BASELINE.json north star (one TPU chip)

H = W = 400
FOCAL = 555.5555155968841  # lego: .5*800/tan(.5*camera_angle_x) at half_res
K = 16                     # frames per timed jit
EMBED_L = 10
PALLAS_TILE = 512


def main() -> None:
    # bf16 activations/weights on the MXU, f32 accumulation — the deployed
    # inference configuration (parity vs f32 covered in tests/).
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    fparams = prepare_fused_params_pe(params, cfg, dim_pts=48, L=EMBED_L)
    sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=16,
                           near=2.0, far=6.0)
    use_pallas = jax.default_backend() != "cpu"

    def one_frame(c2w):
        pts = sampler.sample_test(c2w)
        if use_pallas:
            rgb = fused_r2l_apply_pe(fparams, cfg, pts, 48, EMBED_L,
                                     tile=PALLAS_TILE, interpret=False)
        else:
            from r2l_tpu.models import apply_r2l
            rgb = apply_r2l(params, cfg, r2l_embed(pts, EMBED_L))
        return jnp.sum(rgb)

    @jax.jit
    def render_k(poses):
        return jnp.sum(jax.lax.map(one_frame, poses))

    poses = jnp.asarray(np.stack(
        [pose_spherical(t, -30.0, 4.0)[:3, :4]
         for t in np.linspace(-180, 180, K, endpoint=False)]))

    try:
        float(render_k(poses))  # compile + warmup (readback = execution)
    except Exception:
        # Cold-terminal Pallas compile flake: fall back to the XLA path
        # so the benchmark always reports.
        use_pallas = False
        render_k = jax.jit(lambda ps: jnp.sum(jax.lax.map(one_frame, ps)))
        float(render_k(poses))

    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(render_k(poses))
        times.append(time.perf_counter() - t0)
    dt = float(np.min(times)) / K

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "lego_400x400_render_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "extra": {
            "rays_per_sec_per_chip": round(fps * H * W, 1),
            "ms_per_frame": round(1000.0 * dt, 3),
            "device": str(jax.devices()[0].device_kind),
            "path": "pallas-pe-fused" if use_pallas else "xla",
            "model": "R2L W256 D88 (43 resmlp blocks), 16 samples/ray, L=10",
            "protocol": f"{K} frames per jit, scalar checksum readback",
        },
    }))


if __name__ == "__main__":
    main()
