import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.encoding import r2l_embed
from r2l_tpu.models import NeRFConfig, R2LConfig, apply_r2l, init_nerf, init_r2l
from r2l_tpu.render import (VolRenderConfig, render_frame_nerf,
                            render_r2l_frame, render_rays_nerf)
from r2l_tpu.sampler import PointSampler


def test_render_r2l_frame_matches_manual(key):
    cfg = R2LConfig(input_dim=16 * 3 * 21, netwidth=32, netdepth=6)
    params = init_r2l(key, cfg)
    ps = PointSampler(H=4, W=5, focal=6.0, n_sample=16, near=2.0, far=6.0)
    c2w = jnp.eye(4)[:3]
    img = render_r2l_frame(params, cfg, ps, c2w)
    assert img.shape == (4, 5, 3)
    manual = apply_r2l(params, cfg, r2l_embed(ps.sample_test(c2w), 10))
    np.testing.assert_allclose(np.asarray(img).reshape(-1, 3),
                               np.asarray(manual), rtol=1e-6)


def _setup_nerf(key, use_viewdirs=True, n_fine=0):
    ncfg = NeRFConfig(D=2, W=32, use_viewdirs=use_viewdirs,
                      input_ch=63, input_ch_views=27, skips=())
    params = init_nerf(key, ncfg)
    vcfg = VolRenderConfig(n_coarse=16, n_fine=n_fine, perturb=False,
                           use_viewdirs=use_viewdirs, white_bkgd=True,
                           ray_chunk=8)
    return params, ncfg, vcfg


def test_render_rays_nerf_shapes(key):
    params, ncfg, vcfg = _setup_nerf(key)
    ro = jnp.zeros((12, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (12, 1))
    out = render_rays_nerf(params, None, ncfg, vcfg, ro, rd)
    assert out.rgb_map.shape == (12, 3)
    assert out.acc_map.shape == (12,)
    assert out.rgb0 is None


def test_render_rays_nerf_hierarchical(key):
    params, ncfg, vcfg = _setup_nerf(key, n_fine=8)
    ro = jnp.zeros((6, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (6, 1))
    out = render_rays_nerf(params, params, ncfg, vcfg, ro, rd,
                           key=jax.random.key(1))
    assert out.rgb_map.shape == (6, 3)
    assert out.rgb0.shape == (6, 3)
    assert np.isfinite(np.asarray(out.rgb_map)).all()
    # z_std extra (reference `main.py:743-750`): per-ray population std
    # of the fine importance samples; None without the fine pass.
    assert out.z_std.shape == (6,)
    assert np.isfinite(np.asarray(out.z_std)).all()
    assert (np.asarray(out.z_std) >= 0).all()


def test_render_rays_nerf_no_fine_has_no_z_std(key):
    params, ncfg, vcfg = _setup_nerf(key)
    ro = jnp.zeros((4, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
    out = render_rays_nerf(params, None, ncfg, vcfg, ro, rd)
    assert out.z_std is None


def test_render_frame_nerf_chunking_invariant(key):
    params, ncfg, vcfg = _setup_nerf(key)
    n = 20  # not a multiple of chunk=8 -> exercises padding
    ro = jnp.zeros((n, 3))
    rd = jax.random.normal(jax.random.key(2), (n, 3))
    out = render_frame_nerf(params, None, ncfg, vcfg, ro, rd)
    assert out["rgb"].shape == (n, 3)
    # Unchunked pass must agree.
    full = render_rays_nerf(params, None, ncfg, vcfg, ro, rd)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(full.rgb_map), rtol=1e-5, atol=1e-6)


def test_render_rays_grad_flows(key):
    params, ncfg, vcfg = _setup_nerf(key, n_fine=4)
    ro = jnp.zeros((4, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
    target = jnp.ones((4, 3)) * 0.5

    def loss(p):
        out = render_rays_nerf(p, None, ncfg, vcfg, ro, rd,
                               key=jax.random.key(3))
        return jnp.mean((out.rgb_map - target) ** 2)

    g = jax.grad(loss)(params)
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_teacher_bf16_compute_close_to_f32(key):
    """bf16 teacher activations (the fast datagen path) stay within
    pseudo-data noise budget of the f32 render."""
    import dataclasses
    ncfg = NeRFConfig(D=4, W=32, input_ch=63, input_ch_views=27,
                      skips=(2,), use_viewdirs=True, precision="default")
    params = init_nerf(key, ncfg)
    vcfg = VolRenderConfig(n_coarse=8, n_fine=8, perturb=False,
                           use_viewdirs=True, white_bkgd=True,
                           ray_chunk=64)
    ro = jnp.zeros((64, 3))
    rd = jax.random.normal(jax.random.key(1), (64, 3))
    rgb_f32 = render_frame_nerf(params, params, ncfg, vcfg, ro, rd)["rgb"]
    ncfg_bf = dataclasses.replace(ncfg, compute_dtype=jnp.bfloat16)
    rgb_bf = render_frame_nerf(params, params, ncfg_bf, vcfg, ro, rd)["rgb"]
    d = np.abs(np.asarray(rgb_bf) - np.asarray(rgb_f32))
    # Hierarchical resampling amplifies small sigma deltas at isolated
    # rays (fine samples land in different bins), so the max can spike on
    # a random-weight (noisy-density) teacher; the MEAN drives pseudo-data
    # target quality. bf16 datagen stays opt-in (--compute_dtype).
    assert d.mean() < 1e-2, d.mean()
    assert np.quantile(d, 0.95) < 5e-2


def test_distinct_fine_network_dims(key):
    """--netdepth_fine/--netwidth_fine differing from the coarse net."""
    import dataclasses
    ncfg = NeRFConfig(D=3, W=32, input_ch=63, input_ch_views=27, skips=(1,),
                      use_viewdirs=True)
    ncfg_fine = dataclasses.replace(ncfg, D=2, W=16, skips=())
    k1, k2 = jax.random.split(key)
    pc = init_nerf(k1, ncfg)
    pf = init_nerf(k2, ncfg_fine)
    vcfg = VolRenderConfig(n_coarse=4, n_fine=4, perturb=False,
                           use_viewdirs=True, white_bkgd=True, ray_chunk=32)
    ro = jnp.zeros((32, 3))
    rd = jax.random.normal(jax.random.key(5), (32, 3))
    out = render_frame_nerf(pc, pf, ncfg, vcfg, ro, rd, ncfg_fine=ncfg_fine)
    assert out["rgb"].shape == (32, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
