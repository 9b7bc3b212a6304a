"""Fused R2L Pallas kernel vs the reference jnp path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.kernels import fused_r2l_apply, prepare_fused_params
from r2l_tpu.models import R2LConfig, apply_r2l, init_r2l


def _setup(key, **kw):
    cfg = R2LConfig(**kw)
    params = init_r2l(key, cfg)
    x = jax.random.normal(jax.random.key(7), (40, cfg.input_dim)) * 0.3
    return cfg, params, x


def test_fused_matches_reference_f32(key):
    cfg, params, x = _setup(key, input_dim=48, netwidth=128, netdepth=8)
    ref = apply_r2l(params, cfg, x)
    fp = prepare_fused_params(params, cfg, weight_dtype=jnp.float32)
    out = fused_r2l_apply(fp, cfg, x, tile=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_bf16_close(key):
    cfg, params, x = _setup(key, input_dim=48, netwidth=128, netdepth=8)
    ref = apply_r2l(params, cfg, x)
    fp = prepare_fused_params(params, cfg)  # bf16 weights
    out = fused_r2l_apply(fp, cfg, x, tile=16)
    # Sigmoid outputs in [0,1]; bf16 weight rounding stays ~1e-2 worst case.
    assert float(jnp.max(jnp.abs(out - ref))) < 3e-2


def test_fused_canonical_architecture(key):
    """The real W=256 D=88 shape (tiny batch, interpret mode)."""
    cfg = R2LConfig()  # input 1008, 43 blocks
    params = init_r2l(key, cfg)
    x = jax.random.normal(jax.random.key(3), (8, cfg.input_dim)) * 0.1
    ref = apply_r2l(params, cfg, x)
    fp = prepare_fused_params(params, cfg, weight_dtype=jnp.float32)
    out = fused_r2l_apply(fp, cfg, x, tile=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_linear_tail_and_no_residual(key):
    cfg, params, x = _setup(key, input_dim=24, netwidth=64, netdepth=6,
                            linear_tail=True, use_residual=False)
    ref = apply_r2l(params, cfg, x)
    fp = prepare_fused_params(params, cfg, weight_dtype=jnp.float32)
    out = fused_r2l_apply(fp, cfg, x, tile=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_pads_ragged_batch(key):
    cfg, params, _ = _setup(key, input_dim=24, netwidth=64, netdepth=6)
    x = jax.random.normal(jax.random.key(11), (13, 24))
    ref = apply_r2l(params, cfg, x)
    fp = prepare_fused_params(params, cfg, weight_dtype=jnp.float32)
    out = fused_r2l_apply(fp, cfg, x, tile=8)
    assert out.shape == (13, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
