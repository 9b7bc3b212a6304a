"""rand_patch pixel selection + patch sampler + loader reload paths."""
import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.models import NeRFConfig, init_nerf
from r2l_tpu.render import VolRenderConfig
from r2l_tpu.sampler import PointSampler
from r2l_tpu.train import (TeacherTrainConfig, init_teacher_state,
                           make_teacher_step)


def test_teacher_rand_patch_mode(key, rng):
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    pc = init_nerf(key, ncfg)
    vcfg = VolRenderConfig(n_coarse=4, n_fine=0, perturb=True,
                           use_viewdirs=False, white_bkgd=True)
    tcfg = TeacherTrainConfig(n_rand=16, select_pixel_mode="rand_patch")
    state, tx = init_teacher_state(pc, {}, tcfg)
    step = make_teacher_step(ncfg, vcfg, tcfg, tx, H=8, W=8, focal=10.0)
    images = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    poses = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2))
    for i in range(3):
        state, m = step(state, images, poses, jax.random.key(i))
    assert np.isfinite(float(m["loss"]))


def test_sample_train_patches(key):
    s = PointSampler(H=8, W=8, focal=10.0, n_sample=4, near=2.0, far=6.0)
    ro = jnp.zeros((2, 4, 4, 3))
    rd = jax.random.normal(key, (2, 4, 4, 3))
    pts = s.sample_train_patches(ro, rd, key=key)
    assert pts.shape == (2, 4, 4, 4, 3)
    # per-image shared jitter: all pixels of one image share z offsets
    z0 = pts[0, 0, 0, :, :] / rd[0, 0, 0]
    z1 = pts[0, 3, 3, :, :] / rd[0, 3, 3]
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), rtol=1e-4)
    # deterministic without key
    pts_d = s.sample_train_patches(ro, rd)
    zd = np.asarray(pts_d[0, 0, 0, :, 0] / rd[0, 0, 0, 0])
    np.testing.assert_allclose(zd, np.linspace(2.0, 6.0, 4), rtol=1e-5)
