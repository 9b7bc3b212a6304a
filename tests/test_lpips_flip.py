"""LPIPS architecture + FLIP metric tests."""
import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.flip import (flip, flip_error_map, linear_to_srgb,
                          srgb_to_linear, srgb_to_ycxcz)
from r2l_tpu.lpips_jax import init_lpips, lpips


def test_srgb_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(linear_to_srgb(srgb_to_linear(x))),
                               np.asarray(x), atol=1e-5)


def test_ycxcz_white():
    w = srgb_to_ycxcz(jnp.ones((1, 1, 3)))
    np.testing.assert_allclose(np.asarray(w[0, 0, 0]), 100.0, atol=1e-3)


def test_flip_zero_for_identical(rng):
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    assert float(flip(img, img)) < 1e-6


def test_flip_detects_difference(rng):
    a = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    b = jnp.clip(a + 0.5, 0, 1)
    v = float(flip(a, b))
    assert 0.05 < v <= 1.0
    em = flip_error_map(a, b)
    assert em.shape == (32, 32)
    assert float(em.min()) >= 0.0 and float(em.max()) <= 1.0


def test_flip_monotone_in_error(rng):
    a = jnp.asarray(rng.uniform(0.3, 0.7, (32, 32, 3)).astype(np.float32))
    small = float(flip(a, jnp.clip(a + 0.05, 0, 1)))
    large = float(flip(a, jnp.clip(a + 0.4, 0, 1)))
    assert small < large


def test_lpips_zero_for_identical(key, rng):
    params = init_lpips(key)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    assert abs(float(lpips(params, img, img))) < 1e-6


def test_lpips_positive_and_batched(key, rng):
    params = init_lpips(key)
    a = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    assert float(lpips(params, a, b)) > 0.0


def test_lpips_torch_layout_conversion():
    """Synthesize a torch-style state_dict and check shape mapping."""
    from r2l_tpu.lpips_jax import _ALEX, load_torch_lpips
    sd = {}
    sizes = []
    for i, (oc, ic, k, s, p) in enumerate(_ALEX):
        sizes.append((i, oc, ic, k))
    # torch slices: slice1 has convs 0; slice2 conv 3; slice3 conv 6; ...
    conv_idx = [(1, 0), (2, 3), (3, 6), (4, 8), (5, 10)]
    for (sl, idx), (i, oc, ic, k) in zip(conv_idx, sizes):
        sd[f"net.slice{sl}.{idx}.weight"] = np.zeros((oc, ic, k, k),
                                                     np.float32)
        sd[f"net.slice{sl}.{idx}.bias"] = np.zeros((oc,), np.float32)
        sd[f"lin{i}.model.1.weight"] = np.ones((1, oc, 1, 1), np.float32)
    params = load_torch_lpips(sd)
    assert params["convs"][0]["w"].shape == (11, 11, 3, 64)
    assert params["lins"][4]["w"].shape == (1, 1, 256, 1)
