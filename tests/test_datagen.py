"""Pseudo-data generation modes (tiny teacher, CPU)."""
import os

import jax
import numpy as np

from r2l_tpu.datagen import (DataGenConfig, _rand_neighbor_offsets,
                             generate_3x3rays, generate_patches,
                             generate_pseudo_data, generate_rand_images,
                             generate_tworays, images_to_ray_records)
from r2l_tpu.models import NeRFConfig, init_nerf
from r2l_tpu.render import VolRenderConfig


def _tiny_teacher(key):
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    vcfg = VolRenderConfig(n_coarse=4, n_fine=0, perturb=False,
                           use_viewdirs=False, white_bkgd=True,
                           ray_chunk=256)
    return ncfg, init_nerf(key, ncfg), vcfg


def _gcfg(n_pose=2, H=8, W=8):
    return DataGenConfig(n_pose=n_pose, H=H, W=W, focal=10.0,
                         save_every=2, shard_size=1 << 10, seed=0)


def test_rand_mode_writes_shards(key, tmp_path):
    ncfg, pc, vcfg = _tiny_teacher(key)
    total = generate_pseudo_data(pc, None, ncfg, vcfg, _gcfg(),
                                 str(tmp_path))
    assert total == 2 * 64
    shards = [f for f in os.listdir(tmp_path) if f.endswith(".npy")]
    a = np.load(tmp_path / shards[0])
    assert a.shape[1] == 9 and a.dtype == np.float32


def test_tworays_schema(key, tmp_path):
    ncfg, pc, vcfg = _tiny_teacher(key)
    total = generate_tworays(pc, None, ncfg, vcfg, _gcfg(), str(tmp_path))
    assert total == 2 * 64
    shards = [f for f in os.listdir(tmp_path) if f.startswith("pseudo2ray")]
    a = np.load(tmp_path / shards[0])
    assert a.shape[1] == 15


def test_3x3rays_schema(key, tmp_path):
    ncfg, pc, vcfg = _tiny_teacher(key)
    total = generate_3x3rays(pc, None, ncfg, vcfg, _gcfg(), str(tmp_path))
    assert total == 2 * 36  # interior (8-2)^2 pixels per pose
    shards = [f for f in os.listdir(tmp_path) if f.startswith("pseudo3x3")]
    a = np.load(tmp_path / shards[0])
    assert a.shape[1] == 57


def test_rand_images_and_patches(key, tmp_path):
    ncfg, pc, vcfg = _tiny_teacher(key)
    n = generate_rand_images(pc, None, ncfg, vcfg, _gcfg(),
                             str(tmp_path / "imgs"))
    assert n == 2
    f = sorted(os.listdir(tmp_path / "imgs"))[0]
    d = np.load(tmp_path / "imgs" / f)["data"]
    assert d.shape == (2, 8, 8, 9)

    n = generate_patches(pc, None, ncfg, vcfg, _gcfg(),
                         str(tmp_path / "patches"), patch_size=4)
    f = sorted(os.listdir(tmp_path / "patches"))[0]
    z = np.load(tmp_path / "patches" / f)
    assert z["patches"].shape == (2, 4, 4, 4, 6)  # 2 poses, 2x2 tiles
    assert z["rays_o"].shape == (2, 3)


def test_rand_neighbor_offsets_valid():
    rng = np.random.default_rng(0)
    H = W = 5
    off = _rand_neighbor_offsets(rng, H, W)
    hh = np.arange(H)[:, None] + off[..., 0]
    ww = np.arange(W)[None, :] + off[..., 1]
    assert hh.min() >= 0 and hh.max() < H
    assert ww.min() >= 0 and ww.max() < W
    assert not np.all(off == 0)


def test_images_to_ray_records(key):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)[:3]] * 2)
    rec = images_to_ray_records(imgs, poses, 4, 4, 5.0)
    assert rec.shape == (32, 9)
    np.testing.assert_allclose(rec[:, 6:9],
                               imgs.reshape(-1, 3), rtol=1e-6)

def test_generate_pseudo_data_surface_records(key):
    """--learn_depth surface stores the surface POINT o + d*depth
    (3 extra cols, record_dim 12 — reference create_data.py:832-836)."""
    import numpy as np
    from r2l_tpu.datagen import DataGenConfig, generate_pseudo_data
    from r2l_tpu.models.nerf import NeRFConfig, init_nerf
    from r2l_tpu.render import VolRenderConfig
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    pc = init_nerf(key, ncfg)
    vcfg = VolRenderConfig(n_coarse=4, n_fine=0, use_viewdirs=False,
                           perturb=False, ray_chunk=64)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        gcfg = DataGenConfig(n_pose=1, H=4, W=4, focal=4.0,
                             use_rand_focal=False, learn_depth="surface",
                             save_every=1, use_pallas=False)
        n = generate_pseudo_data(pc, None, ncfg, vcfg, gcfg, d)
        import glob as g
        rec = np.load(g.glob(f"{d}/*.npy")[0])
        assert rec.shape == (16, 12)
        o, dd, surf = rec[:, 0:3], rec[:, 3:6], rec[:, 9:12]
        # surf = o + d * t for a scalar t per ray
        t = (surf - o) / np.where(np.abs(dd) < 1e-9, 1.0, dd)
        spread = t.max(axis=1) - t.min(axis=1)
        assert (spread < 1e-3).all()
    assert n == 16


def test_nonrand_modes_use_fine_config(key, tmp_path):
    """A hierarchical teacher whose FINE net has different dims must
    render through ncfg_fine in every datagen mode (previously only
    'rand' forwarded it — the other modes applied the fine params with
    the coarse config and shape-crashed)."""
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    ncfg_fine = NeRFConfig(D=2, W=24, skips=(), use_viewdirs=False,
                           input_ch=63, input_ch_views=0)
    k1, k2 = jax.random.split(key)
    pc, pf = init_nerf(k1, ncfg), init_nerf(k2, ncfg_fine)
    vcfg = VolRenderConfig(n_coarse=4, n_fine=2, perturb=False,
                           use_viewdirs=False, white_bkgd=True,
                           ray_chunk=256)
    n = generate_rand_images(pc, pf, ncfg, vcfg, _gcfg(), str(tmp_path),
                             ncfg_fine=ncfg_fine)
    assert n == 2
