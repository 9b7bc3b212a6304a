"""Tighter A/B for the dual-stream interleave winner (probe_pipe.py):
alternate control and streams2 measurements to cancel tunnel drift,
plus a small tile sweep around 800 for streams2.
Appends exp/probe_pipe.jsonl.
"""
import sys, os, json, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from probe_pipe_lib import apply_int8_pe_streams  # noqa: E402
from r2l_tpu.kernels.r2l_pallas import (calibrate_r2l_int8_pe,
                                        fused_r2l_apply_int8_pe)
from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler

H = W = 400; FOCAL = 555.5555155968841; K = 16; L = 10; DIM = 48
OUT = os.path.join(os.path.dirname(__file__), "probe_pipe.jsonl")

def log(rec):
    print(rec, flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
params = init_r2l(jax.random.key(0), cfg)
sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=16, near=2.0, far=6.0)
poses = jnp.asarray(np.stack([np.asarray(pose_spherical(t, -30.0, 4.0))[:3, :4]
                              for t in np.linspace(-180, 180, K,
                                                   endpoint=False)]))
sub_s = PointSampler(H=50, W=50, focal=FOCAL / 8, n_sample=16, near=2.0,
                     far=6.0)
calib = jnp.concatenate([sub_s.sample_test(poses[i]) for i in range(0, K, 2)])
fp = calibrate_r2l_int8_pe(params, cfg, DIM, L, calib_pts=calib,
                           fold_requant=True)


def make(fn):
    @jax.jit
    def render_k(fp, poses):
        def one(c2w):
            pts = sampler.sample_test(c2w)
            return jnp.sum(fn(fp, pts))
        return jnp.sum(jax.lax.map(one, poses))
    return render_k

variants = {
    "ctl_t800": make(lambda fp, pts: fused_r2l_apply_int8_pe(
        fp, cfg, pts, DIM, L, tile=800, fold_requant=True,
        nobf16_inner=True)),
    "s2_t640": make(lambda fp, pts: apply_int8_pe_streams(
        fp, cfg, pts, DIM, L, tile=640, streams=2)),
    "s2_t800": make(lambda fp, pts: apply_int8_pe_streams(
        fp, cfg, pts, DIM, L, tile=800, streams=2)),
    "s2_t960": make(lambda fp, pts: apply_int8_pe_streams(
        fp, cfg, pts, DIM, L, tile=960, streams=2)),
}

log({"probe": "pipe2-interleaved-AB", "device": str(jax.devices()[0]),
     "ts": time.time()})
times = {k: [] for k in variants}
for k, fn in variants.items():   # warm compiles
    float(fn(fp, poses))
for r in range(8):               # interleave rounds: drift cancels
    for k, fn in variants.items():
        t0 = time.perf_counter(); float(fn(fp, poses))
        times[k].append(1000.0 * (time.perf_counter() - t0) / K)
for k, ts in times.items():
    ts = sorted(ts)
    log({"variant": k, "ms_min": round(ts[0], 3),
         "ms_med": round(ts[len(ts) // 2], 3),
         "all_ms": [round(t, 3) for t in ts]})
log({"done": True, "ts": time.time()})
