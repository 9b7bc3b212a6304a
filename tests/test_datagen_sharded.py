"""Multi-pose-batched + mesh-sharded pseudo-data generation."""
import os

import jax
import numpy as np

from r2l_tpu.datagen import DataGenConfig, generate_pseudo_data
from r2l_tpu.models import NeRFConfig, init_nerf
from r2l_tpu.parallel import make_mesh
from r2l_tpu.render import VolRenderConfig


def _teacher(key):
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    vcfg = VolRenderConfig(n_coarse=4, n_fine=0, perturb=False,
                           use_viewdirs=False, white_bkgd=True,
                           ray_chunk=512)
    return ncfg, init_nerf(key, ncfg), vcfg


def test_batched_generation_matches_single(key, tmp_path):
    """poses_per_batch must not change the generated records.

    Holds for deterministic sampling (perturb=False here); with perturb
    the per-batch stratified key makes batching change the jitter draw —
    covered separately by test_perturbed_generation_varies."""
    ncfg, pc, vcfg = _teacher(key)
    g1 = DataGenConfig(n_pose=4, H=8, W=8, focal=10.0, save_every=4,
                       shard_size=1 << 12, seed=3, use_rand_focal=True)
    g2 = DataGenConfig(n_pose=4, H=8, W=8, focal=10.0, save_every=4,
                       shard_size=1 << 12, seed=3, use_rand_focal=True,
                       poses_per_batch=4)
    n1 = generate_pseudo_data(pc, None, ncfg, vcfg, g1, str(tmp_path / "a"))
    n2 = generate_pseudo_data(pc, None, ncfg, vcfg, g2, str(tmp_path / "b"))
    assert n1 == n2 == 4 * 64
    a = np.load(tmp_path / "a" / os.listdir(tmp_path / "a")[0])
    b = np.load(tmp_path / "b" / os.listdir(tmp_path / "b")[0])
    # Same rng stream for poses; shuffle order may differ -> compare sets
    # via sorted rows.
    np.testing.assert_allclose(
        a[np.lexsort(a.T)], b[np.lexsort(b.T)], rtol=1e-5, atol=1e-6)


def test_mesh_sharded_generation(key, tmp_path):
    ncfg, pc, vcfg = _teacher(key)
    mesh = make_mesh()  # 8 virtual CPU devices on 'data'
    gcfg = DataGenConfig(n_pose=2, H=8, W=8, focal=10.0, save_every=2,
                         shard_size=1 << 12, poses_per_batch=2)
    n = generate_pseudo_data(pc, None, ncfg, vcfg, gcfg,
                             str(tmp_path / "m"), mesh=mesh)
    assert n == 2 * 64
    f = os.listdir(tmp_path / "m")[0]
    rec = np.load(tmp_path / "m" / f)
    assert rec.shape[1] == 9 and np.isfinite(rec).all()


def test_perturbed_generation_varies(key, tmp_path):
    """With vcfg.perturb the per-pose key drives stratified z: records
    differ across seeds but stay finite/valid (the reference renders
    pseudo data through the perturb=1 train kwargs)."""
    ncfg, pc, _ = _teacher(key)
    vcfg = VolRenderConfig(n_coarse=4, n_fine=2, perturb=True,
                           use_viewdirs=False, white_bkgd=True,
                           ray_chunk=512)
    g1 = DataGenConfig(n_pose=1, H=8, W=8, focal=10.0, save_every=1,
                       shard_size=1 << 12, seed=3, use_rand_focal=False)
    g2 = DataGenConfig(n_pose=1, H=8, W=8, focal=10.0, save_every=1,
                       shard_size=1 << 12, seed=4, use_rand_focal=False)
    generate_pseudo_data(pc, None, ncfg, vcfg, g1, str(tmp_path / "a"))
    generate_pseudo_data(pc, None, ncfg, vcfg, g2, str(tmp_path / "b"))
    a = np.load(tmp_path / "a" / os.listdir(tmp_path / "a")[0])
    b = np.load(tmp_path / "b" / os.listdir(tmp_path / "b")[0])
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # same pose stream (different seeds give different poses anyway) —
    # the essential check is that the perturbed path runs and produces
    # rgb in [0, 1].
    assert a[:, 6:9].min() >= 0.0 and a[:, 6:9].max() <= 1.0


def test_tworays_mode_with_perturb(key, tmp_path):
    """Key threading reaches the sibling modes too."""
    from r2l_tpu.datagen import generate_tworays
    ncfg, pc, _ = _teacher(key)
    vcfg = VolRenderConfig(n_coarse=4, n_fine=0, perturb=True,
                           use_viewdirs=False, white_bkgd=True,
                           ray_chunk=512)
    gcfg = DataGenConfig(n_pose=1, H=8, W=8, focal=10.0, save_every=1,
                         shard_size=1 << 12)
    n = generate_tworays(pc, None, ncfg, vcfg, gcfg, str(tmp_path / "t"))
    assert n == 64
    a = np.load(tmp_path / "t" / os.listdir(tmp_path / "t")[0])
    assert a.shape[1] == 15 and np.isfinite(a).all()
