"""int8 quantized inference kernel: accuracy vs the f32 reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.kernels.r2l_pallas import (fused_r2l_apply_int8,
                                        prepare_fused_params_int8)
from r2l_tpu.models import R2LConfig, apply_r2l, init_r2l


def test_int8_matches_reference_closely(key):
    cfg = R2LConfig(input_dim=48, netwidth=128, netdepth=8)
    params = init_r2l(key, cfg)
    x = jax.random.normal(jax.random.key(7), (32, 48)) * 0.3
    ref = np.asarray(apply_r2l(params, cfg, x))
    fp = prepare_fused_params_int8(params, cfg)
    out = np.asarray(fused_r2l_apply_int8(fp, cfg, x, tile=16))
    err = np.abs(out - ref)
    # Sigmoid outputs in [0,1]: int8 per-row/col scales keep worst-case
    # error small on this depth.
    assert err.max() < 5e-2, err.max()
    assert err.mean() < 1e-2, err.mean()


def test_int8_canonical_depth_error_budget(key):
    """Error accumulation across the full 43-block depth stays bounded
    (random weights are a pessimistic proxy for trained nets)."""
    cfg = R2LConfig()  # W=256, D=88
    params = init_r2l(key, cfg)
    x = jax.random.normal(jax.random.key(3), (8, cfg.input_dim)) * 0.1
    ref = np.asarray(apply_r2l(params, cfg, x))
    fp = prepare_fused_params_int8(params, cfg)
    out = np.asarray(fused_r2l_apply_int8(fp, cfg, x, tile=8))
    err = np.abs(out - ref)
    # Equivalent PSNR of the quantization noise alone must far exceed
    # the model's ~31 dB operating point (so <0.05 dB parity impact).
    mse = float(np.mean((out - ref) ** 2))
    psnr_noise = -10 * np.log10(max(mse, 1e-12))
    assert psnr_noise > 38.0, (psnr_noise, err.max())


def test_int8_quantizer_roundtrip():
    from r2l_tpu.kernels.r2l_pallas import _quant_cols, _quant_rows
    w = jax.random.normal(jax.random.key(0), (64, 32)) * 0.2
    q, s = _quant_cols(w)
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(s),
                               np.asarray(w), atol=float(s.max()))
    a = jax.random.normal(jax.random.key(1), (16, 64))
    qa, sa = _quant_rows(a)
    np.testing.assert_allclose(np.asarray(qa, np.float32) * np.asarray(sa),
                               np.asarray(a), atol=float(sa.max()))
