import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.flops import (count_params, flops_per_pixel,
                           flops_per_pixel_from_params,
                           nerf_flops_per_pixel_from_params, param_bytes,
                           r2l_analytic_flops_per_pixel, xla_cost)
from r2l_tpu.models import R2LConfig, apply_r2l, init_r2l


def test_canonical_flops_per_pixel_matches_paper():
    """Paper Table 2 / BASELINE.md: 11.79M FLOPs/pixel for W256 D88."""
    cfg = R2LConfig()
    np.testing.assert_allclose(r2l_analytic_flops_per_pixel(cfg) / 1e6,
                               11.79, rtol=0.01)


def test_exact_counter_canonical_resmlp():
    """The from-params counter must handle the scan-stacked [nb,nl,W,W]
    body (round-2 verdict: it skipped it and reported 0.52M instead of
    11.79M for the flagship model)."""
    cfg = R2LConfig()
    params = init_r2l(jax.random.key(0), cfg)
    exact = flops_per_pixel_from_params(params)
    np.testing.assert_allclose(exact, r2l_analytic_flops_per_pixel(cfg),
                               rtol=1e-12)
    np.testing.assert_allclose(exact / 1e6, 11.79, rtol=0.01)


def test_exact_counter_mlp_and_layerwise():
    # Plain-MLP body with per-layer widths: count from true shapes.
    cfg = R2LConfig(input_dim=48, netdepth=6, body_arch="mlp",
                    layerwise_widths=(64, 32, 16, 16, 16))
    params = init_r2l(jax.random.key(1), cfg)
    ws = cfg.widths
    expect = 2.0 * (cfg.input_dim * ws[0]
                    + sum(ws[i - 1] * ws[i] for i in range(1, cfg.netdepth - 1))
                    + ws[cfg.netdepth - 2] * cfg.output_dim)
    np.testing.assert_allclose(flops_per_pixel_from_params(params), expect,
                               rtol=1e-12)
    # Uniform MLP agrees with the analytic form too.
    cfg_u = R2LConfig(input_dim=48, netwidth=64, netdepth=6, body_arch="mlp")
    np.testing.assert_allclose(
        flops_per_pixel_from_params(init_r2l(jax.random.key(2), cfg_u)),
        r2l_analytic_flops_per_pixel(cfg_u), rtol=1e-12)


def test_exact_counter_teacher():
    """Teacher list-of-dicts layout; reference semantics multiply the
    per-point count by (2*N_samples + N_importance) (`main.py:541-545`).
    Canonical teacher (63/27-d PE, D8 W256, viewdirs, 64+64+128 queries)
    must land near the paper's 303.82M FLOPs/pixel (BASELINE.md)."""
    from r2l_tpu.models.nerf import NeRFConfig, init_nerf
    ncfg = NeRFConfig(D=8, W=256, input_ch=63, input_ch_views=27,
                      output_ch=5, skips=(4,), use_viewdirs=True)
    params = init_nerf(jax.random.key(3), ncfg)
    per_point = flops_per_pixel_from_params(params)
    # D-1 hidden linears (one skip-widened to W+input_ch)
    # + alpha/feature/views/rgb heads
    expect_pp = 2.0 * (63 * 256 + 6 * 256 * 256 + (256 + 63) * 256
                       + 256 * 1 + 256 * 256 + (256 + 27) * 128 + 128 * 3)
    np.testing.assert_allclose(per_point, expect_pp, rtol=1e-12)
    per_pixel = nerf_flops_per_pixel_from_params(params, 64, 128)
    np.testing.assert_allclose(per_pixel, per_point * 256, rtol=1e-12)
    np.testing.assert_allclose(per_pixel / 1e6, 303.82, rtol=0.02)


def test_canonical_param_size_matches_paper():
    """Paper: 23.7 MB storage for the canonical model (float32)."""
    cfg = R2LConfig()
    params = init_r2l(jax.random.key(0), cfg)
    mb = param_bytes(params) / 1024 / 1024
    assert 22.0 < mb < 24.5, mb
    assert count_params(params) == sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_xla_cost_close_to_analytic(key):
    # body_arch='mlp' (unrolled) — XLA cost analysis counts a lax.scan
    # body once regardless of trip count, so the scan'd resmlp body
    # undercounts; the unrolled MLP matches the closed form.
    cfg = R2LConfig(input_dim=48, netwidth=64, netdepth=6, body_arch="mlp")
    params = init_r2l(key, cfg)
    n = 128
    x = jnp.zeros((n, cfg.input_dim))
    measured = flops_per_pixel(lambda v: apply_r2l(params, cfg, v), n, x)
    analytic = 2.0 * (cfg.input_dim * cfg.netwidth
                      + (cfg.netdepth - 2) * cfg.netwidth ** 2
                      + cfg.netwidth * cfg.output_dim)
    assert 0.8 * analytic < measured < 1.5 * analytic + 1e4


def test_xla_cost_returns_dict(key):
    cost = xla_cost(lambda a: a @ a.T, jnp.zeros((32, 16)))
    assert "flops" in cost
