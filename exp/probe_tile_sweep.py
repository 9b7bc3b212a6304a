"""int8 student kernel tile sweep at 400^2 (int8 weights are 4x smaller
than the bf16-era sweep assumed — VMEM headroom may admit bigger tiles).
K frames per jit, scalar checksum. Appends exp/probe_tile_sweep.jsonl."""
import sys, os, json, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from r2l_tpu.evaluate import make_r2l_bench_fn
from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler

H = W = 400; FOCAL = 555.5555155968841; K = 16
OUT = os.path.join(os.path.dirname(__file__), "probe_tile_sweep.jsonl")

def log(rec):
    print(rec, flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
params = init_r2l(jax.random.key(0), cfg)
sampler = PointSampler(H=H, W=W, focal=FOCAL, n_sample=16, near=2.0, far=6.0)
poses = jnp.asarray(np.stack([np.asarray(pose_spherical(t, -30.0, 4.0))[:3, :4]
                              for t in np.linspace(-180, 180, K, endpoint=False)]))
calib_poses = np.stack([np.asarray(pose_spherical(t, -30.0, 4.0))
                        for t in np.linspace(-180, 180, 4, endpoint=False)])

for tile in (800, 1000, 1600, 2000):
    try:
        fn = make_r2l_bench_fn(params, cfg, sampler, embed_L=10,
                               use_pallas=True, pallas_tile=tile,
                               quantize="int8", calib_poses=calib_poses)
        t0 = time.perf_counter(); float(fn(poses))
        cs = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter(); float(fn(poses))
            times.append(time.perf_counter() - t0)
        ms = 1000.0 * min(times) / K
        log({"tile": tile, "ms_per_frame": round(ms, 3),
             "fps": round(1000.0 / ms, 2), "compile_s": round(cs, 1)})
    except Exception as e:  # noqa: BLE001
        log({"tile": tile, "error": repr(e)[:200]})
