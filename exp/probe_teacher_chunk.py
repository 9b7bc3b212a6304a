"""Teacher fused-kernel ray_chunk sweep (tile 4096, ladder PE)."""
import sys, os, json, time, dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from r2l_tpu.encoding import nerf_embed_dim
from r2l_tpu.models.nerf import NeRFConfig, init_nerf
from r2l_tpu.rays import get_rays, pose_spherical
from r2l_tpu.render import VolRenderConfig, render_frame_nerf_fused

H = W = 400; FOCAL = 555.5555155968841; K = 4
OUT = os.path.join(os.path.dirname(__file__), "probe_teacher_chunk.jsonl")

def log(rec):
    print(rec, flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

cfg = NeRFConfig(D=8, W=256, skips=(4,), use_viewdirs=True,
                 input_ch=nerf_embed_dim(3, 10),
                 input_ch_views=nerf_embed_dim(3, 4), output_ch=5,
                 compute_dtype=jnp.bfloat16)
k1, k2 = jax.random.split(jax.random.key(0))
pc, pf = init_nerf(k1, cfg), init_nerf(k2, cfg)
poses = [pose_spherical(t, -30.0, 4.0)[:3, :4]
         for t in np.linspace(-180, 180, K, endpoint=False)]
ros, rds = [], []
for p in poses:
    ro, rd = get_rays(H, W, FOCAL, jnp.asarray(np.asarray(p)))
    ros.append(np.asarray(ro).reshape(-1, 3))
    rds.append(np.asarray(rd).reshape(-1, 3))
ro = jnp.asarray(np.stack(ros)); rd = jnp.asarray(np.stack(rds))
z = np.linspace(2.0, 6.0, 9, dtype=np.float32)
sub = slice(None, None, 640)
c_pts = np.concatenate([(o[sub, None, :] + d[sub, None, :]
                         * z[None, :, None]).reshape(-1, 3)
                        for o, d in zip(ros, rds)])
c_vds = np.concatenate([np.broadcast_to(
    (d[sub] / np.linalg.norm(d[sub], axis=-1, keepdims=True))[:, None, :],
    (d[sub].shape[0], 9, 3)).reshape(-1, 3) for d in rds])
calib = (jnp.asarray(c_pts), jnp.asarray(c_vds))

for chunk in (65536, 160000):
    vcfg = VolRenderConfig(n_coarse=64, n_fine=128, perturb=False,
                           use_viewdirs=True, white_bkgd=True,
                           near=2.0, far=6.0, ray_chunk=chunk)
    for mode, cal in (("int8", calib), ("bf16", None)):
        def frame(args, cal=cal, vcfg=vcfg):
            o, d = args
            return render_frame_nerf_fused(pc, pf, cfg, vcfg, o, d,
                                           int8_calib=cal)["rgb"]
        @jax.jit
        def render_k(ro, rd):
            return jnp.sum(jax.lax.map(lambda a: jnp.sum(frame(a)),
                                       (ro, rd)))
        try:
            t0 = time.perf_counter(); float(render_k(ro, rd))
            cs = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter(); float(render_k(ro, rd))
                times.append(time.perf_counter() - t0)
            log({"chunk": chunk, "mode": mode,
                 "ms_per_frame": round(1000.0 * min(times) / K, 1),
                 "compile_s": round(cs, 1)})
        except Exception as e:  # noqa: BLE001
            log({"chunk": chunk, "mode": mode, "error": repr(e)[:180]})
