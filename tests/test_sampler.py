import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.sampler import PointSampler, even_z_vals, stratify_z


def make_sampler():
    return PointSampler(H=4, W=6, focal=8.0, n_sample=16, near=2.0, far=6.0)


def test_even_z_vals_endpoints():
    z = np.asarray(even_z_vals(2.0, 6.0, 16))
    assert z[0] == 2.0 and z[-1] == 6.0
    np.testing.assert_allclose(np.diff(z), np.diff(z)[0], rtol=1e-5)


def test_sample_test_shape_and_first_point():
    ps = make_sampler()
    c2w = jnp.eye(4)[:3]
    pts = ps.sample_test(c2w)
    assert pts.shape == (4 * 6, 16 * 3)
    # First ray, first sample = o + d*near; with identity pose o=0.
    ro, rd = ps.frame_rays(c2w)
    np.testing.assert_allclose(np.asarray(pts[0, :3]),
                               np.asarray(rd[0] * 2.0), rtol=1e-6)


def test_sample_train_no_perturb_equals_even():
    ps = make_sampler()
    c2w = jnp.eye(4)[:3]
    ro, rd = ps.frame_rays(c2w)
    pts = ps.sample_train(ro, rd, key=None)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(ps.sample_test(c2w)),
                               rtol=1e-6)


def test_stratified_stays_in_bins(key):
    z = even_z_vals(2.0, 6.0, 16)
    zs = np.asarray(stratify_z(key, z, (128,)))
    assert zs.shape == (128, 16)
    assert zs.min() >= 2.0 and zs.max() <= 6.0
    # Each jittered z stays within its own bin (monotonic per ray).
    assert (np.diff(zs, axis=-1) > 0).all()


def test_sample_train_perturb_differs_per_key(key):
    ps = make_sampler()
    ro = jnp.zeros((8, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1))
    k1, k2 = jax.random.split(key)
    p1, p2 = ps.sample_train(ro, rd, k1), ps.sample_train(ro, rd, k2)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_plucker_shapes():
    ps = make_sampler()
    c2w = jnp.eye(4)[:3]
    assert ps.sample_test_plucker(c2w).shape == (24, 6)


def test_sampler_jit_compatible():
    ps = make_sampler()
    f = jax.jit(ps.sample_test)
    out = f(jnp.eye(4)[:3])
    assert out.shape == (24, 48)
