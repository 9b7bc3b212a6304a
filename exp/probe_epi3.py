"""Follow-up to probe_epi2: the fold_requant + nobf16_inner variant
(within-block activations stay f32 straight into round+clip) vs the
fold_requant winner, plus a 640-tile point. Appends exp/probe_epi2.jsonl.
"""
import sys, os, json, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from r2l_tpu.kernels.r2l_pallas import (calibrate_r2l_int8_pe,
                                        fused_r2l_apply_int8_pe)
from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler

H = W = 400; FOCAL = 555.5555155968841; K = 16; L = 10; DIM = 48
OUT = os.path.join(os.path.dirname(__file__), "probe_epi2.jsonl")

def log(rec):
    print(rec, flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
params = init_r2l(jax.random.key(0), cfg)
sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=16, near=2.0, far=6.0)
poses = jnp.asarray(np.stack([np.asarray(pose_spherical(t, -30.0, 4.0))[:3, :4]
                              for t in np.linspace(-180, 180, K, endpoint=False)]))
sub = PointSampler(H=50, W=50, focal=FOCAL / 8, n_sample=16, near=2.0, far=6.0)
calib = jnp.concatenate([sub.sample_test(poses[i]) for i in range(0, K, 2)])
fp_fold = calibrate_r2l_int8_pe(params, cfg, DIM, L, calib_pts=calib,
                                fold_requant=True)


def bench(name, tile, nobf16, reps=5):
    @jax.jit
    def render_k(fp, poses):
        def one(c2w):
            pts = sampler.sample_test(c2w)
            rgb = fused_r2l_apply_int8_pe(fp, cfg, pts, DIM, L, tile=tile,
                                          fold_requant=True,
                                          nobf16_inner=nobf16)
            return jnp.sum(rgb)
        return jnp.sum(jax.lax.map(one, poses))

    try:
        t0 = time.perf_counter(); float(render_k(fp_fold, poses))
        cs = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(render_k(fp_fold, poses))
            times.append(time.perf_counter() - t0)
        ms = 1000.0 * min(times) / K
        log({"variant": name, "tile": tile, "ms_per_frame": round(ms, 3),
             "fps": round(1000.0 / ms, 2), "compile_s": round(cs, 1),
             "all_ms": [round(1000.0 * t / K, 3) for t in sorted(times)]})
    except Exception as e:  # noqa: BLE001
        log({"variant": name, "tile": tile, "error": repr(e)[:300]})


bench("fold+nobf16@t800", 800, True)
bench("fold@t800-ctrl", 800, False)
bench("fold+nobf16@t640", 640, True)
bench("fold+nobf16@t800-rerun", 800, True)
log({"done3": True})
