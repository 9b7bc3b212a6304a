"""Round-3 epilogue probes for the int8 student kernel (VERDICT r2 #1):
(a/c) bf16 residual stream, folded requantize scales, and their combo,
then a tile sweep for the winner. Canonical 400^2 lego-class config,
K frames per jit, scalar checksum, min of repeats.
Appends exp/probe_epi2.jsonl.
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

fp_plain = calibrate_r2l_int8_pe(params, cfg, DIM, L, calib_pts=calib)
fp_fold = calibrate_r2l_int8_pe(params, cfg, DIM, L, calib_pts=calib,
                                fold_requant=True)


def bench(name, fp, tile, bf16_resid, fold_requant, reps=5):
    @jax.jit
    def render_k(fp, poses):
        def one(c2w):
            pts = sampler.sample_test(c2w)
            rgb = fused_r2l_apply_int8_pe(fp, cfg, pts, DIM, L, tile=tile,
                                          bf16_resid=bf16_resid,
                                          fold_requant=fold_requant)
            return jnp.sum(rgb)
        return jnp.sum(jax.lax.map(one, poses))

    try:
        t0 = time.perf_counter(); float(render_k(fp, poses))
        cs = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(render_k(fp, poses))
            times.append(time.perf_counter() - t0)
        ms = 1000.0 * min(times) / K
        log({"variant": name, "tile": tile, "ms_per_frame": round(ms, 3),
             "fps": round(1000.0 / ms, 2), "compile_s": round(cs, 1),
             "all_ms": [round(1000.0 * t / K, 3) for t in sorted(times)]})
        return ms
    except Exception as e:  # noqa: BLE001
        log({"variant": name, "tile": tile, "error": repr(e)[:300]})
        return float("inf")


results = {}
for name, fp, bf16r, fold in (
        ("base", fp_plain, False, False),
        ("bf16_resid", fp_plain, True, False),
        ("fold_requant", fp_fold, False, True),
        ("both", fp_fold, True, True)):
    results[name] = bench(name, fp, 800, bf16r, fold)

best = min(results, key=results.get)
log({"best_at_800": best, "ms": round(results[best], 3)})
fp_best = fp_fold if "fold" in best or best == "both" else fp_plain
bf16r = best in ("bf16_resid", "both")
fold = best in ("fold_requant", "both")
for tile in (1000, 1600, 2000):
    bench(f"{best}@t{tile}", fp_best, tile, bf16r, fold)
# re-measure the 800 winner last to bracket drift
bench(f"{best}@t800-rerun", fp_best, 800, bf16r, fold)
log({"done": True})
