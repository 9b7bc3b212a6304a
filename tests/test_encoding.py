import jax.numpy as jnp
import numpy as np

from r2l_tpu import encoding


def test_r2l_embed_dim_and_layout():
    L = 3
    x = jnp.array([[0.5, -1.0]])
    y = np.asarray(encoding.r2l_embed(x, L))
    assert y.shape == (1, 2 * (2 * L + 1))
    # Per-scalar layout: [sin(s*1), sin(s*2), sin(s*4), cos(...), s]
    s = 0.5
    expect0 = np.array([np.sin(s), np.sin(2 * s), np.sin(4 * s),
                        np.cos(s), np.cos(2 * s), np.cos(4 * s), s])
    np.testing.assert_allclose(y[0, :7], expect0, rtol=1e-6)
    s = -1.0
    expect1 = np.array([np.sin(s), np.sin(2 * s), np.sin(4 * s),
                        np.cos(s), np.cos(2 * s), np.cos(4 * s), s])
    np.testing.assert_allclose(y[0, 7:], expect1, rtol=1e-6)


def test_r2l_embed_canonical_dim():
    # 16 samples x 3 coords, L=10 -> 1008 (reference main.py:459).
    x = jnp.zeros((4, 48))
    assert encoding.r2l_embed(x, 10).shape == (4, 1008)
    assert encoding.r2l_embed_dim(48, 10) == 1008


def test_nerf_embed_dims():
    x = jnp.zeros((2, 3))
    assert encoding.nerf_embed(x, 10).shape == (2, 63)
    assert encoding.nerf_embed(x, 4).shape == (2, 27)
    assert encoding.nerf_embed(x, 4, include_input=False).shape == (2, 24)


def test_nerf_embed_layout():
    L = 2
    x = jnp.array([[0.1, 0.2, 0.3]])
    y = np.asarray(encoding.nerf_embed(x, L))
    # Layout: [x(3), sin(1*x)(3), cos(1*x)(3), sin(2*x)(3), cos(2*x)(3)]
    xs = np.array([0.1, 0.2, 0.3])
    expect = np.concatenate(
        [xs, np.sin(xs), np.cos(xs), np.sin(2 * xs), np.cos(2 * xs)])
    np.testing.assert_allclose(y[0], expect, rtol=1e-6)


def test_nerf_embed_L0_identity():
    x = jnp.ones((2, 3))
    np.testing.assert_allclose(np.asarray(encoding.nerf_embed(x, 0)),
                               np.ones((2, 3)))
