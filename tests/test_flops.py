import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.flops import (count_params, flops_per_pixel, param_bytes,
                           r2l_analytic_flops_per_pixel, xla_cost)
from r2l_tpu.models import R2LConfig, apply_r2l, init_r2l


def test_canonical_flops_per_pixel_matches_paper():
    """Paper Table 2 / BASELINE.md: 11.79M FLOPs/pixel for W256 D88."""
    cfg = R2LConfig()
    np.testing.assert_allclose(r2l_analytic_flops_per_pixel(cfg) / 1e6,
                               11.79, rtol=0.01)


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
