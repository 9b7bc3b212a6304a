import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu import volume


def _golden_raw2outputs(raw, z_vals, rays_d, white_bkgd=False):
    """Independent numpy alpha-compositing for cross-checking."""
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    alpha = 1.0 - np.exp(-np.maximum(raw[..., 3], 0.0) * dists)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]),
                        1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    w = alpha * trans
    rgb_map = (w[..., None] * rgb).sum(-2)
    depth = (w * z_vals).sum(-1)
    acc = w.sum(-1)
    disp = 1.0 / np.maximum(1e-10, depth / acc)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, disp, acc, w, depth


def test_raw2outputs_matches_golden(rng):
    n_ray, n_s = 16, 8
    raw = rng.normal(size=(n_ray, n_s, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, size=(n_ray, n_s)).astype(np.float32), -1)
    d = rng.normal(size=(n_ray, 3)).astype(np.float32)
    out = volume.raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    g_rgb, g_disp, g_acc, g_w, g_depth = _golden_raw2outputs(raw, z, d)
    np.testing.assert_allclose(np.asarray(out.rgb_map), g_rgb, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.weights), g_w, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth_map), g_depth, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc_map), g_acc, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.disp_map), g_disp, rtol=2e-4)


def test_raw2outputs_white_bkgd_empty_space():
    # Zero density -> pure white with white_bkgd.
    raw = jnp.zeros((4, 8, 4)).at[..., 3].set(-10.0)
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (4, 8))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
    out = volume.raw2outputs(raw, z, d, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out.rgb_map), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.acc_map), 0.0, atol=1e-6)


def test_raw2outputs_opaque_first_sample():
    # Huge density at the first sample -> its color dominates.
    raw = jnp.zeros((1, 8, 4))
    raw = raw.at[0, 0, 3].set(1e6).at[0, 0, :3].set(jnp.array([5.0, -5.0, 0.0]))
    z = jnp.linspace(2.0, 6.0, 8)[None]
    d = jnp.array([[0.0, 0.0, -1.0]])
    out = volume.raw2outputs(raw, z, d)
    expected = jax.nn.sigmoid(jnp.array([5.0, -5.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out.rgb_map[0]),
                               np.asarray(expected), atol=1e-5)
    np.testing.assert_allclose(float(out.depth_map[0]), 2.0, atol=1e-4)


def _golden_sample_pdf_det(bins, weights, n_samples):
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros_like(pdf[..., :1]), np.cumsum(pdf, -1)], -1)
    u = np.broadcast_to(np.linspace(0, 1, n_samples),
                        (*cdf.shape[:-1], n_samples))
    out = np.empty_like(u)
    for r in range(cdf.shape[0]):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        c0, c1 = cdf[r][below], cdf[r][above]
        b0, b1 = bins[r][np.minimum(below, bins.shape[-1] - 1)], \
            bins[r][np.minimum(above, bins.shape[-1] - 1)]
        denom = np.where(c1 - c0 < 1e-5, 1.0, c1 - c0)
        t = (u[r] - c0) / denom
        out[r] = b0 + t * (b1 - b0)
    return out


def test_sample_pdf_det_matches_golden(rng):
    n_ray, n_bin = 8, 15
    bins = np.sort(rng.uniform(2, 6, size=(n_ray, n_bin)), -1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(n_ray, n_bin - 1)).astype(np.float32)
    samples = volume.sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights),
                                32, det=True)
    golden = _golden_sample_pdf_det(bins, weights, 32)
    np.testing.assert_allclose(np.asarray(samples), golden, rtol=1e-4, atol=1e-5)


def test_sample_pdf_concentrates_on_heavy_bins(key):
    # All weight in one bin -> all samples land in that bin.
    bins = jnp.linspace(0.0, 10.0, 11)[None].repeat(4, 0)
    weights = jnp.zeros((4, 10)).at[:, 3].set(100.0)
    s = np.asarray(volume.sample_pdf(key, bins, weights, 64))
    frac_inside = ((s >= 3.0) & (s <= 4.0)).mean()
    assert frac_inside > 0.98


def test_sample_pdf_in_range(key):
    bins = jnp.linspace(2.0, 6.0, 9)[None].repeat(3, 0)
    weights = jax.random.uniform(key, (3, 8))
    s = np.asarray(volume.sample_pdf(key, bins, weights, 16))
    assert s.min() >= 2.0 - 1e-5 and s.max() <= 6.0 + 1e-5
