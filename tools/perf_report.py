"""Full performance report: inference FPS, training step, teacher frame.

Prints one JSON line per workload (bench.py stays the single headline
metric for the driver; this gives the complete picture). Uses the
K-frames-per-jit / pipelined-steps protocols — see CLAUDE.md for why
naive per-call timing lies on this image's TPU tunnel.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def report(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 3),
                      "unit": unit, **({"extra": extra} if extra else {})}),
          flush=True)


def infer_fps():
    from r2l_tpu.encoding import r2l_embed
    from r2l_tpu.kernels import fused_r2l_apply, prepare_fused_params
    from r2l_tpu.models import R2LConfig, init_r2l
    from r2l_tpu.rays import pose_spherical
    from r2l_tpu.sampler import PointSampler

    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    fp = prepare_fused_params(init_r2l(jax.random.key(0), cfg), cfg)
    sampler = PointSampler(H=400, W=400, focal=555.5, n_sample=16,
                           near=2.0, far=6.0)
    K = 8
    poses = jnp.asarray(np.stack(
        [pose_spherical(t, -30.0, 4.0)[:3, :4]
         for t in np.linspace(-180, 180, K, endpoint=False)]))

    @jax.jit
    def render_k(ps):
        def one(c2w):
            x = r2l_embed(sampler.sample_test(c2w), 10)
            return jnp.sum(fused_r2l_apply(fp, cfg, x, tile=1024,
                                           interpret=False))
        return jnp.sum(jax.lax.map(one, ps))

    float(render_k(poses))
    best = min(_timed(lambda: float(render_k(poses))) for _ in range(3))
    report("r2l_render_400x400", K / best, "frames/s",
           ms_per_frame=round(best / K * 1e3, 2),
           path="bf16 fused kernel, embed outside (diagnostic; the "
                "headline int8 PE-fused path is bench.py)")


def train_step_ms():
    from r2l_tpu.models import R2LConfig, init_r2l
    from r2l_tpu.sampler import PointSampler
    from r2l_tpu.train import (DistillConfig, init_train_state,
                               make_distill_step)

    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    dcfg = DistillConfig(batch_size=81920, n_hard_in=16384,
                         n_hard_out=16384, hard_mul=20.0)
    sampler = PointSampler(H=400, W=400, focal=555.5, n_sample=16,
                           near=2.0, far=6.0)
    state, tx = init_train_state(jax.random.key(1),
                                 init_r2l(jax.random.key(0), cfg), dcfg)
    # K steps inside ONE jit (lax.scan): per-call dispatch through this
    # image's tunnel floors at ~30 ms, which would mask any step below
    # that (CLAUDE.md timing protocol).
    n = 20
    scan = make_distill_step(cfg, dcfg, sampler, tx, scan_steps=n)
    batches = jax.random.uniform(
        jax.random.key(2), (n, dcfg.batch_size - dcfg.n_hard_out, 9))
    state, ms, key = scan(state, batches, jax.random.key(3))
    float(ms["loss"][-1])
    t0 = time.perf_counter()
    state, ms, key = scan(state, batches, key)
    float(ms["loss"][-1])
    dt = (time.perf_counter() - t0) / n
    report("r2l_distill_step", dt * 1e3, "ms",
           rays_per_sec=round(dcfg.batch_size / dt),
           full_1p2M_iters_hours=round(dt * 1.2e6 / 3600, 2))


def teacher_frame_ms():
    from r2l_tpu.models import NeRFConfig, init_nerf
    from r2l_tpu.rays import get_rays, pose_spherical
    from r2l_tpu.render import VolRenderConfig, render_frame_nerf

    ncfg = NeRFConfig(precision="default")
    k1, k2 = jax.random.split(jax.random.key(0))
    pc, pf = init_nerf(k1, ncfg), init_nerf(k2, ncfg)
    vcfg = VolRenderConfig(n_coarse=64, n_fine=128, perturb=False,
                           use_viewdirs=True, white_bkgd=True,
                           ray_chunk=32768)
    ro, rd = get_rays(400, 400, 555.5,
                      jnp.asarray(pose_spherical(30.0, -30.0, 4.0)[:3, :4]))
    ro = jnp.asarray(np.asarray(ro).reshape(-1, 3))
    rd = jnp.asarray(np.asarray(rd).reshape(-1, 3))

    K = 4  # frames per jit: amortize the ~30 ms dispatch RTT
    # Each iteration gets a DISTINCT (epsilon-shifted) ray set: mapping
    # the same operands lets XLA CSE the K renders into one (measured:
    # exactly time/K).
    ro_k = ro[None] + 1e-6 * jnp.arange(K, dtype=jnp.float32)[:, None, None]
    rd_k = jnp.broadcast_to(rd[None], (K, *rd.shape))

    @jax.jit
    def frames(ro_k, rd_k):
        return jnp.sum(jax.lax.map(
            lambda ab: jnp.sum(render_frame_nerf(pc, pf, ncfg, vcfg,
                                                 ab[0], ab[1])["rgb"]),
            (ro_k, rd_k)))

    float(frames(ro_k, rd_k))
    best = min(_timed(lambda: float(frames(ro_k, rd_k)))
               for _ in range(3)) / K
    report("teacher_frame_400x400_64p128", best * 1e3, "ms",
           pseudo_10k_poses_minutes=round(best * 1e4 / 60, 1))


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    infer_fps()
    train_step_ms()
    teacher_frame_ms()
