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


def test_frame_metrics_matches_eager_components(rng):
    """The one-dispatch eval bundle (render_path hot path) returns the
    same values as the separate eager calls (r3 verdict Next #3)."""
    import jax
    from r2l_tpu.metrics import frame_metrics, img2mse, mse2psnr, ssim
    img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    m = jax.device_get(frame_metrics(img, gt))
    np.testing.assert_allclose(m["mse"], float(img2mse(img, gt)), rtol=1e-6)
    np.testing.assert_allclose(m["psnr"],
                               float(mse2psnr(img2mse(img, gt))), rtol=1e-6)
    np.testing.assert_allclose(m["ssim"], float(ssim(img, gt)), rtol=1e-6)


def test_ssim_is_jitted_single_dispatch(rng):
    """ssim routes through one jitted callable (was ~10 eager dispatches
    per frame through the ~30 ms device tunnel)."""
    from r2l_tpu import metrics as M
    img = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
    # the jitted wrapper exists and is used by the public fn
    assert hasattr(M, "_ssim_jit")
    np.testing.assert_allclose(
        float(M._ssim_jit(img, img, 11, 1.5)), float(M.ssim(img, img)),
        rtol=1e-7)
    # ...and ssim() actually ROUTES through it (an eager _ssim_impl
    # call would match numerically while paying ~10 dispatches/frame)
    calls = []
    orig = M._ssim_jit
    M._ssim_jit = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        M.ssim(img, img)
    finally:
        M._ssim_jit = orig
    assert calls, "ssim() no longer routes through _ssim_jit"
