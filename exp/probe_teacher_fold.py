"""Probe: folded-requant int8 epilogue in the fused volumetric TEACHER
kernel (the student kernel's r3 win applied to the teacher chain).
Canonical 8x256+skip, viewdirs, 64+128 samples, 400^2, tile 4096.
K frames/jit, scalar checksum. Appends exp/probe_teacher_int8.jsonl.
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from r2l_tpu.encoding import nerf_embed_dim
from r2l_tpu.models.nerf import NeRFConfig, init_nerf
from r2l_tpu.rays import get_rays, pose_spherical
from r2l_tpu.render import VolRenderConfig, render_frame_nerf_fused

H = W = 400
FOCAL = 555.5555155968841
K = 4
OUT = "exp/probe_teacher_int8.jsonl"


def log(rec):
    print(rec, flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    cfg = NeRFConfig(D=8, W=256, skips=(4,), use_viewdirs=True,
                     input_ch=nerf_embed_dim(3, 10),
                     input_ch_views=nerf_embed_dim(3, 4), output_ch=5,
                     compute_dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.key(0))
    pc, pf = init_nerf(k1, cfg), init_nerf(k2, cfg)
    vcfg = VolRenderConfig(n_coarse=64, n_fine=128, perturb=False,
                           use_viewdirs=True, white_bkgd=True,
                           near=2.0, far=6.0, ray_chunk=32768)

    poses = [pose_spherical(t, -30.0, 4.0)[:3, :4]
             for t in np.linspace(-180, 180, K, endpoint=False)]
    ros, rds = [], []
    for p in poses:
        ro, rd = get_rays(H, W, FOCAL, jnp.asarray(np.asarray(p)))
        ros.append(np.asarray(ro).reshape(-1, 3))
        rds.append(np.asarray(rd).reshape(-1, 3))
    ro = jnp.asarray(np.stack(ros))
    rd = jnp.asarray(np.stack(rds))

    z = np.linspace(2.0, 6.0, 9, dtype=np.float32)
    sub = slice(None, None, 640)
    c_pts = np.concatenate([
        (o[sub, None, :] + d[sub, None, :] * z[None, :, None]).reshape(-1, 3)
        for o, d in zip(ros, rds)])
    c_vds = np.concatenate([
        np.broadcast_to(
            (d[sub] / np.linalg.norm(d[sub], axis=-1, keepdims=True)
             )[:, None, :], (d[sub].shape[0], 9, 3)).reshape(-1, 3)
        for d in rds])
    calib = (jnp.asarray(c_pts), jnp.asarray(c_vds))

    ref_rgb = None
    for name, fold in (("r3_int8_unfolded_ctrl", False),
                       ("r3_int8_folded", True),
                       ("r3_int8_unfolded_rerun", False)):
        def frame(args, fold=fold):
            o, d = args
            out = render_frame_nerf_fused(pc, pf, cfg, vcfg, o, d,
                                          int8_calib=calib,
                                          fold_requant=fold)
            return out["rgb"]

        @jax.jit
        def render_k(ro, rd):
            return jnp.sum(jax.lax.map(lambda a: jnp.sum(frame(a)),
                                       (ro, rd)))

        try:
            t0 = time.perf_counter()
            float(render_k(ro, rd))
            cs = time.perf_counter() - t0
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(render_k(ro, rd))
                times.append(time.perf_counter() - t0)
            ms = 1000.0 * min(times) / K
            rgb = np.asarray(jax.jit(frame)((ro[0], rd[0])))
            rec = {"name": name, "ms_per_frame": round(ms, 1),
                   "compile_s": round(cs, 1)}
            if ref_rgb is None:
                ref_rgb = rgb
            else:
                err = np.abs(rgb - ref_rgb)
                rec["rgb_err_vs_ctrl_max"] = float(err.max())
                rec["rgb_err_vs_ctrl_mean"] = float(err.mean())
            log(rec)
        except Exception as e:  # noqa: BLE001
            log({"name": name, "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
