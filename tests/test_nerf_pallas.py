"""Fused NeRF-query kernel vs apply_nerf (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.kernels.nerf_pallas import fused_nerf_query, prepare_fused_nerf
from r2l_tpu.models import NeRFConfig, apply_nerf, init_nerf


def test_fused_nerf_viewdirs_f32(key):
    cfg = NeRFConfig(D=4, W=64, input_ch=63, input_ch_views=27, skips=(2,),
                     use_viewdirs=True)
    params = init_nerf(key, cfg)
    x = jax.random.normal(jax.random.key(1), (40, 90)) * 0.5
    ref = apply_nerf(params, cfg, x)
    fp = prepare_fused_nerf(params, cfg, weight_dtype=jnp.float32)
    out = fused_nerf_query(fp, cfg, x, tile=16)
    assert out.shape == (40, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_nerf_no_viewdirs(key):
    cfg = NeRFConfig(D=3, W=32, input_ch=63, input_ch_views=0, skips=(1,),
                     use_viewdirs=False, output_ch=4)
    params = init_nerf(key, cfg)
    x = jax.random.normal(jax.random.key(2), (24, 63)) * 0.5
    ref = apply_nerf(params, cfg, x)
    fp = prepare_fused_nerf(params, cfg, weight_dtype=jnp.float32)
    out = fused_nerf_query(fp, cfg, x, tile=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_nerf_canonical_shape_bf16(key):
    """Canonical teacher D=8 W=256 skips=(4,), bf16 weights."""
    cfg = NeRFConfig()  # 63/27, D=8, W=256, skips=(4,)
    params = init_nerf(key, cfg)
    x = jax.random.normal(jax.random.key(3), (16, 90)) * 0.3
    ref = apply_nerf(params, cfg, x)
    fp = prepare_fused_nerf(params, cfg)  # bf16
    out = fused_nerf_query(fp, cfg, x, tile=8)
    assert float(jnp.max(jnp.abs(out - ref))) < 0.15  # raw logits scale
    # correlation check: same ordering of sigma across points
    assert np.corrcoef(np.asarray(out[:, 3]),
                       np.asarray(ref[:, 3]))[0, 1] > 0.999


def test_render_frame_with_fused_query_matches(key):
    """Full volumetric render via the fused query == plain apply_nerf."""
    from r2l_tpu.render import (VolRenderConfig, make_fused_nerf_query,
                                render_frame_nerf)
    cfg = NeRFConfig(D=3, W=32, input_ch=63, input_ch_views=27, skips=(1,),
                     use_viewdirs=True)
    k1, k2 = jax.random.split(key)
    pc, pf = init_nerf(k1, cfg), init_nerf(k2, cfg)
    vcfg = VolRenderConfig(n_coarse=6, n_fine=4, perturb=False,
                           use_viewdirs=True, white_bkgd=True, ray_chunk=32)
    ro = jnp.zeros((64, 3))
    rd = jax.random.normal(jax.random.key(5), (64, 3))
    plain = render_frame_nerf(pc, pf, cfg, vcfg, ro, rd)
    # f32 fused weights for exactness in this test
    from r2l_tpu.kernels.nerf_pallas import (fused_nerf_query,
                                             prepare_fused_nerf)
    fpc = prepare_fused_nerf(pc, cfg, weight_dtype=jnp.float32)
    fpf = prepare_fused_nerf(pf, cfg, weight_dtype=jnp.float32)
    qc = lambda e: fused_nerf_query(fpc, cfg, e, tile=16)  # noqa: E731
    qf = lambda e: fused_nerf_query(fpf, cfg, e, tile=16)  # noqa: E731
    fused = render_frame_nerf(pc, pf, cfg, vcfg, ro, rd,
                              query_coarse=qc, query_fine=qf)
    np.testing.assert_allclose(np.asarray(fused["rgb"]),
                               np.asarray(plain["rgb"]),
                               rtol=1e-4, atol=1e-5)
