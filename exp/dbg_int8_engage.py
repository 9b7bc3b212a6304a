import sys, os; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from r2l_tpu.checkpoint import load_checkpoint
from r2l_tpu.models.nerf import NeRFConfig
from r2l_tpu.render import VolRenderConfig, render_frame_nerf_fused
from r2l_tpu.rays import get_rays, pose_spherical

tree, meta = load_checkpoint('/tmp/verify_e2e/Experiments/t-20260816-200541/weights/teacher.msgpack', None)
pc, pf = tree['coarse'], tree['fine']
def norm(p):
    if isinstance(p, dict):
        p = dict(p)
        for k in ('pts_linears', 'views_linears'):
            if k in p and isinstance(p[k], dict):
                p[k] = [p[k][i] for i in sorted(p[k], key=int)]
    return p
pc, pf = norm(pc), norm(pf)
D = len(pc['pts_linears']); W = pc['pts_linears'][0]['w'].shape[1]
in_ch = pc['pts_linears'][0]['w'].shape[0]
use_vd = bool(pc.get('views_linears'))
L = (in_ch//3 - 1)//2
in_v = pc['views_linears'][0]['w'].shape[0] - W if use_vd else 0
Lv = (in_v//3 - 1)//2 if use_vd else 0
print('D,W,in_ch,in_v,L,Lv,use_vd,fine', D, W, in_ch, in_v, L, Lv, use_vd, bool(pf))
cfg = NeRFConfig(D=D, W=W, skips=(4,) if D > 4 else (D//2,), use_viewdirs=use_vd,
                 input_ch=in_ch, input_ch_views=in_v,
                 output_ch=5 if pf else 4, compute_dtype=jnp.bfloat16)
vcfg = VolRenderConfig(n_coarse=16, n_fine=16 if pf else 0, perturb=False,
                       use_viewdirs=use_vd, multires=L, multires_views=Lv,
                       near=2.0, far=6.0, white_bkgd=True, ray_chunk=4096)
H=Wd=64; FOCAL=64.0
ro, rd = get_rays(H, Wd, FOCAL, jnp.asarray(np.asarray(pose_spherical(30., -30., 4.0)[:3,:4])))
ro = ro.reshape(-1,3); rd = rd.reshape(-1,3)
out_bf = render_frame_nerf_fused(pc, pf if pf else None, cfg, vcfg, ro, rd)
rgb_bf = np.asarray(out_bf['rgb'])
z = np.linspace(2.,6.,9,dtype=np.float32)
ron, rdn = np.asarray(ro)[::16], np.asarray(rd)[::16]
pts = (ron[:,None,:] + rdn[:,None,:]*z[None,:,None]).reshape(-1,3)
vd = rdn/np.linalg.norm(rdn,axis=-1,keepdims=True)
vds = np.broadcast_to(vd[:,None,:],(vd.shape[0],9,3)).reshape(-1,3)
calib = (jnp.asarray(pts), jnp.asarray(vds) if use_vd else None)
out_i8 = render_frame_nerf_fused(pc, pf if pf else None, cfg, vcfg, ro, rd, int8_calib=calib)
rgb_i8 = np.asarray(out_i8['rgb'])
d = np.abs(rgb_bf - rgb_i8)
print('rgb range bf16', rgb_bf.min(), rgb_bf.max())
print('int8-vs-bf16: max', d.max(), 'mean', d.mean())
print('identical:', np.array_equal(rgb_bf, rgb_i8))

from r2l_tpu.render import render_frame_nerf
out_x = render_frame_nerf(pc, pf if pf else None, cfg, vcfg, ro, rd)
rx = np.asarray(out_x['rgb'])
print('XLA rgb range', rx.min(), rx.max(), 'acc max', float(np.asarray(out_x['acc']).max()))
