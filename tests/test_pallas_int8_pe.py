"""Static-scale int8 PE-fused kernel: numerics vs the f32 reference path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2l_tpu.encoding import r2l_embed
from r2l_tpu.kernels.r2l_pallas import (calibrate_r2l_int8_pe,
                                        fused_r2l_apply_int8_pe)
from r2l_tpu.models import R2LConfig, apply_r2l, init_r2l
from r2l_tpu.rays import pose_spherical
from r2l_tpu.sampler import PointSampler


@pytest.fixture(scope="module")
def setup():
    cfg = R2LConfig(input_dim=6 * (2 * 4 + 1), netdepth=8, netwidth=64,
                    use_residual=True, body_arch="resmlp")
    params = init_r2l(jax.random.key(0), cfg)
    sampler = PointSampler(H=12, W=16, focal=14.0, n_sample=2,
                           near=2.0, far=6.0)
    # production scheme: calibrate on a few poses spanning the sphere,
    # evaluate on held-out poses (single-pose scales do NOT generalize:
    # the identity-PE coordinate ranges rotate with the camera)
    calib_poses = [pose_spherical(t, p, 4.0)[:3, :4]
                   for t in (0.0, 120.0, 240.0) for p in (-10.0, -60.0)]
    calib = jnp.concatenate([
        sampler.sample_test(jnp.asarray(np.asarray(c)))
        for c in calib_poses])
    poses = [pose_spherical(t, -30.0, 4.0)[:3, :4] for t in (60.0, 200.0)]
    return cfg, params, sampler, poses, calib


def test_int8_pe_matches_f32(setup):
    cfg, params, sampler, poses, calib = setup
    fp = calibrate_r2l_int8_pe(params, cfg, dim_pts=6, L=4, calib_pts=calib)
    pts = sampler.sample_test(jnp.asarray(np.asarray(poses[1])))
    got = fused_r2l_apply_int8_pe(fp, cfg, pts, dim_pts=6, L=4, tile=64,
                                  interpret=True)
    want = apply_r2l(params, cfg, r2l_embed(pts, 4))
    d = np.asarray(got) - np.asarray(want)
    # int8 W8A8 on a random-init 3-block net: worst-case pixel a few
    # 8-bit LSBs, RMS well under one LSB (trained nets measure tighter —
    # the e2e PSNR-delta check lives in the verify recipe)
    assert np.max(np.abs(d)) < 2.5e-2, np.max(np.abs(d))
    assert np.sqrt(np.mean(d * d)) < 2.5e-3, np.sqrt(np.mean(d * d))
    assert got.shape == want.shape


def test_int8_pe_calibration_pose_generalizes(setup):
    """Scales calibrated on pose 0 must not clip catastrophically on a
    held-out pose (the clip guards outliers)."""
    cfg, params, sampler, poses, calib = setup
    fp = calibrate_r2l_int8_pe(params, cfg, dim_pts=6, L=4, calib_pts=calib)
    for pose in poses:
        pts = sampler.sample_test(jnp.asarray(np.asarray(pose)))
        got = fused_r2l_apply_int8_pe(fp, cfg, pts, dim_pts=6, L=4,
                                      tile=64, interpret=True)
        want = apply_r2l(params, cfg, r2l_embed(pts, 4))
        mse = float(np.mean((np.asarray(got) - np.asarray(want)) ** 2))
        psnr_gap = -10 * np.log10(max(mse, 1e-12))
        assert psnr_gap > 48, psnr_gap  # ~parity at 8-bit output depth


def test_int8_pe_canonical_shapes(setup):
    """Canonical D=88/W=256 path builds and runs (tiny ray count)."""
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    params = init_r2l(jax.random.key(1), cfg)
    sampler = PointSampler(H=4, W=4, focal=4.0, n_sample=16,
                           near=2.0, far=6.0)
    pts = sampler.sample_test(jnp.asarray(np.asarray(
        pose_spherical(30.0, -30.0, 4.0)[:3, :4])))
    fp = calibrate_r2l_int8_pe(params, cfg, dim_pts=48, L=10,
                               calib_pts=pts)
    got = fused_r2l_apply_int8_pe(fp, cfg, pts, dim_pts=48, L=10, tile=16,
                                  interpret=True)
    assert got.shape == (16, 3)
    assert np.isfinite(np.asarray(got)).all()


@pytest.mark.parametrize("bf16_resid,fold_requant,nobf16",
                         [(True, False, False), (False, True, False),
                          (True, True, False), (False, True, True)])
def test_int8_pe_variants_match_f32(setup, bf16_resid, fold_requant,
                                    nobf16):
    """Epilogue variants (bf16 residual stream, folded requantize, f32
    inner activations) stay within the same error envelope as the
    baseline int8 path."""
    cfg, params, sampler, poses, calib = setup
    fp = calibrate_r2l_int8_pe(params, cfg, dim_pts=6, L=4,
                               calib_pts=calib, fold_requant=fold_requant)
    pts = sampler.sample_test(jnp.asarray(np.asarray(poses[1])))
    got = fused_r2l_apply_int8_pe(fp, cfg, pts, dim_pts=6, L=4, tile=64,
                                  interpret=True, bf16_resid=bf16_resid,
                                  fold_requant=fold_requant,
                                  nobf16_inner=nobf16)
    want = apply_r2l(params, cfg, r2l_embed(pts, 4))
    d = np.asarray(got) - np.asarray(want)
    assert np.max(np.abs(d)) < 2.5e-2, np.max(np.abs(d))
    assert np.sqrt(np.mean(d * d)) < 2.5e-3, np.sqrt(np.mean(d * d))


def test_fold_requant_exact_vs_unfolded_scales(setup):
    """The folded calibration is the same algebra: folded-kernel outputs
    must match the unfolded kernel bit-for-bit in f32-interpret mode
    except for rounding at the requant boundary (tolerance ~1 LSB)."""
    cfg, params, sampler, poses, calib = setup
    pts = sampler.sample_test(jnp.asarray(np.asarray(poses[0])))
    fp0 = calibrate_r2l_int8_pe(params, cfg, dim_pts=6, L=4,
                                calib_pts=calib)
    fp1 = calibrate_r2l_int8_pe(params, cfg, dim_pts=6, L=4,
                                calib_pts=calib, fold_requant=True)
    a = fused_r2l_apply_int8_pe(fp0, cfg, pts, dim_pts=6, L=4, tile=64,
                                interpret=True)
    b = fused_r2l_apply_int8_pe(fp1, cfg, pts, dim_pts=6, L=4, tile=64,
                                interpret=True, fold_requant=True)
    # same int8 weights, scales only rearranged; difference comes from
    # the bf16 intermediate now holding the scaled value
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_int8_pe_chains_bitwise_matches_single(key):
    """chains=C (C independent sub-chains per ray tile, the r4 overlap
    lever) is bitwise-identical to the single chain — rows never mix."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from r2l_tpu.kernels.r2l_pallas import (calibrate_r2l_int8_pe,
                                            fused_r2l_apply_int8_pe)
    from r2l_tpu.models.r2l import R2LConfig, init_r2l
    dim_pts, L = 12, 4
    cfg = R2LConfig(input_dim=dim_pts * (2 * L + 1), netwidth=128,
                    netdepth=6)
    params = init_r2l(key, cfg)
    pts = jax.random.uniform(jax.random.key(1), (48, dim_pts),
                             minval=-2.0, maxval=2.0)
    fp = calibrate_r2l_int8_pe(params, cfg, dim_pts, L, calib_pts=pts,
                               fold_requant=True)
    kw = dict(tile=16, interpret=True, fold_requant=True,
              nobf16_inner=True)
    base = fused_r2l_apply_int8_pe(fp, cfg, pts, dim_pts, L, **kw)
    for C in (2, 4):
        out = fused_r2l_apply_int8_pe(fp, cfg, pts, dim_pts, L,
                                      chains=C, **kw)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(out))


def test_int8_epilogue_canary_frozen():
    """Headline guard (r4 verdict Next #7): the deployed fold_requant +
    nobf16_inner epilogue must reproduce the frozen fixture BIT-EXACTLY
    (interpret mode, CPU-deterministic in this image). The two measured-
    negative "simplifications" (relu-as-clip, f32-inner requant,
    PERF.md) change these bits — any epilogue rewrite must regenerate
    the fixture CONSCIOUSLY via tools/gen_int8_epilogue_canary.py and
    re-A/B on the TPU per the PERF.md interleaved protocol."""
    import os

    from tools.gen_int8_epilogue_canary import build_case
    cfg, params, calib, pts = build_case()
    fp = calibrate_r2l_int8_pe(params, cfg, dim_pts=6, L=4,
                               calib_pts=calib, fold_requant=True)
    got = fused_r2l_apply_int8_pe(fp, cfg, pts, dim_pts=6, L=4, tile=32,
                                  fold_requant=True, nobf16_inner=True,
                                  interpret=True)
    fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                              "int8_epilogue_canary.npz"))
    np.testing.assert_array_equal(np.asarray(got, np.float32), fx["rgb"])


def test_bench_tile_set_matches_vmem_fit_model():
    """bench.py's autotune tile candidates must stay in sync with the
    VMEM fit model (r4 verdict Next #7): at the canonical int8 config,
    640/800 fit unclamped and the 2000 candidate clamps to exactly 1792
    (the modeled ceiling with ~4 MB headroom, PERF.md r4)."""
    import bench
    from r2l_tpu.evaluate import _pe_kernel_tile_fit
    cfg = R2LConfig(compute_dtype=jnp.bfloat16, precision="default")
    fits = {t: _pe_kernel_tile_fit(cfg, 48, t, quantized=True)
            for t in bench.PALLAS_TILES}
    assert set(bench.PALLAS_TILES) == {640, 800, 2000}, bench.PALLAS_TILES
    assert fits[640] == 640 and fits[800] == 800, fits
    assert fits[2000] == 1792, fits
