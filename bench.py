"""Headline benchmark: lego-class 400x400 full-frame R2L render FPS.

Times the flagship inference path (the reference's north-star workload,
`main.py:1124-1133` --benchmark: full-frame sample -> positional encode ->
88-layer W256 residual MLP -> RGB) on whatever device JAX sees (one TPU
chip under the driver). Prints ONE JSON line.

``vs_baseline`` is measured against the BASELINE.json north star of
100 FPS on one TPU chip (the reference achieves ~3.5 FPS on an RTX 2080 Ti:
8.5 s/frame teacher at ~30x the student's cost, README.md:17,87).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.render import render_r2l_frame
from r2l_tpu.sampler import PointSampler

BASELINE_FPS = 100.0  # BASELINE.json north star (one TPU chip)

H = W = 400
FOCAL = 555.5555155968841  # lego: .5*800/tan(.5*camera_angle_x) at half_res


def main() -> None:
    # bf16 activations on the MXU, f32 params/accumulation — the deployed
    # inference configuration (parity vs f32 is tested in tests/test_models).
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(0), cfg)
    sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=16,
                           near=2.0, far=6.0)

    fn = jax.jit(lambda p, c2w: render_r2l_frame(p, cfg, sampler, c2w))

    poses = [jnp.asarray(pose_spherical(t, -30.0, 4.0)[:3, :4])
             for t in np.linspace(-180, 180, 8, endpoint=False)]

    # Warmup / compile.
    for p in poses:
        jax.block_until_ready(fn(params, p))

    # Median of repeated pipelined runs; every frame's output is synced at
    # the end of its run so async dispatch can't under-count.
    n_frames, n_runs = 20, 5
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        outs = [fn(params, poses[i % len(poses)]) for i in range(n_frames)]
        for o in outs:
            jax.block_until_ready(o)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    fps = n_frames / dt
    rays_per_s = fps * H * W
    print(json.dumps({
        "metric": "lego_400x400_render_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "extra": {
            "rays_per_sec_per_chip": round(rays_per_s, 1),
            "ms_per_frame": round(1000.0 * dt / n_frames, 3),
            "device": str(jax.devices()[0].platform),
            "model": "R2L W256 D88 (43 resmlp blocks), 16 samples/ray, L=10",
        },
    }))


if __name__ == "__main__":
    main()
