import jax.numpy as jnp
import numpy as np

from r2l_tpu import metrics


def test_psnr_known_values():
    x = jnp.zeros((4, 4, 3))
    y = jnp.full((4, 4, 3), 0.1)
    np.testing.assert_allclose(float(metrics.psnr(x, y)), 20.0, rtol=1e-4)
    assert float(metrics.psnr(x, x)) > 100


def test_mse2psnr():
    np.testing.assert_allclose(float(metrics.mse2psnr(jnp.asarray(0.01))),
                               20.0, rtol=1e-6)


def test_ssim_identical_is_one(rng):
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    assert float(metrics.ssim(img, img)) > 0.999


def test_ssim_noise_lowers(rng):
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    noisy = jnp.clip(img + 0.3 * jnp.asarray(
        rng.normal(size=(32, 32, 3)).astype(np.float32)), 0, 1)
    s = float(metrics.ssim(img, noisy))
    assert 0.0 < s < 0.9


def test_ssim_batched(rng):
    a = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    s = float(metrics.ssim(a, a))
    assert s > 0.999


def test_ssim_against_scipy_golden(rng):
    """Cross-check vs an independent scipy implementation."""
    from scipy.ndimage import convolve
    img1 = rng.uniform(0, 1, (24, 24, 1)).astype(np.float32)
    img2 = rng.uniform(0, 1, (24, 24, 1)).astype(np.float32)

    w = metrics._gaussian_window(11, 1.5)

    def filt(x):
        return convolve(x[..., 0], w, mode="constant")[..., None]

    mu1, mu2 = filt(img1), filt(img2)
    s1 = filt(img1 * img1) - mu1 ** 2
    s2 = filt(img2 * img2) - mu2 ** 2
    s12 = filt(img1 * img2) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    golden = np.mean(((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
                     ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2)))
    ours = float(metrics.ssim(jnp.asarray(img1), jnp.asarray(img2)))
    np.testing.assert_allclose(ours, golden, rtol=1e-4)
