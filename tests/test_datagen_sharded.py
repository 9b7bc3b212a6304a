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


def _sorted_rows(a: np.ndarray, key_cols: int | None = None) -> np.ndarray:
    """Rows sorted by the first ``key_cols`` columns (default: all).
    Comparisons across runs must key on the bit-identical RAY columns —
    sorting by rgb too would order nearly-equal rows differently."""
    k = a if key_cols is None else a[:, :key_cols]
    return a[np.lexsort(k.T)]


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
    np.testing.assert_allclose(_sorted_rows(a, 6), _sorted_rows(b, 6),
                               rtol=1e-5, atol=1e-6)


def test_mesh_sharded_generation(key, tmp_path):
    """Mesh-sharded datagen must produce the SAME records as the
    unsharded run (GSPMD shards the ray axis; pad/slice bugs that
    duplicate a device tile or drop the tail would corrupt every
    mesh-generated shard while staying finite)."""
    ncfg, pc, vcfg = _teacher(key)
    mesh = make_mesh()  # 8 virtual CPU devices on 'data'
    gcfg = DataGenConfig(n_pose=2, H=8, W=8, focal=10.0, save_every=2,
                         shard_size=1 << 12, poses_per_batch=2)
    n = generate_pseudo_data(pc, None, ncfg, vcfg, gcfg,
                             str(tmp_path / "m"), mesh=mesh)
    assert n == 2 * 64
    rec = np.load(tmp_path / "m" / os.listdir(tmp_path / "m")[0])
    assert rec.shape[1] == 9
    n0 = generate_pseudo_data(pc, None, ncfg, vcfg, gcfg,
                              str(tmp_path / "s"), mesh=None)
    ref = np.load(tmp_path / "s" / os.listdir(tmp_path / "s")[0])
    assert n0 == n
    np.testing.assert_allclose(_sorted_rows(rec, 6), _sorted_rows(ref, 6),
                               rtol=1e-5, atol=1e-6)


def test_perturbed_generation_varies(key, tmp_path):
    """With vcfg.perturb the per-pose key drives stratified z (the
    reference renders pseudo data through the perturb=1 train kwargs):
    the SAME pose stream with perturb on vs off must give different rgb
    — a regression to key=None would silently drop the jitter while
    staying finite and in-range."""
    ncfg, pc, _ = _teacher(key)
    base = dict(n_coarse=4, n_fine=2, use_viewdirs=False,
                white_bkgd=True, ray_chunk=512)
    g = DataGenConfig(n_pose=1, H=8, W=8, focal=10.0, save_every=1,
                      shard_size=1 << 12, seed=3, use_rand_focal=False)
    generate_pseudo_data(pc, None, ncfg,
                         VolRenderConfig(perturb=True, **base),
                         g, str(tmp_path / "a"))
    generate_pseudo_data(pc, None, ncfg,
                         VolRenderConfig(perturb=False, **base),
                         g, str(tmp_path / "b"))
    a = np.load(tmp_path / "a" / os.listdir(tmp_path / "a")[0])
    b = np.load(tmp_path / "b" / os.listdir(tmp_path / "b")[0])
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert a[:, 6:9].min() >= 0.0 and a[:, 6:9].max() <= 1.0
    # same seed -> identical pose/rays; rgb must differ when perturbed
    a_s, b_s = _sorted_rows(a, 6), _sorted_rows(b, 6)
    np.testing.assert_allclose(a_s[:, :6], b_s[:, :6], rtol=1e-6)
    assert np.abs(a_s[:, 6:9] - b_s[:, 6:9]).max() > 1e-6, \
        "perturb=True produced the unperturbed rgb — key not threaded"


def test_tworays_mode_with_perturb(key, tmp_path):
    """Key threading reaches the sibling modes too: perturb on vs off
    must change the rendered rgb for the same seed/pose stream."""
    from r2l_tpu.datagen import generate_tworays
    ncfg, pc, _ = _teacher(key)
    base = dict(n_coarse=4, n_fine=0, use_viewdirs=False,
                white_bkgd=True, ray_chunk=512)
    gcfg = DataGenConfig(n_pose=1, H=8, W=8, focal=10.0, save_every=1,
                         shard_size=1 << 12)
    n = generate_tworays(pc, None, ncfg,
                         VolRenderConfig(perturb=True, **base),
                         gcfg, str(tmp_path / "t"))
    assert n == 64
    a = np.load(tmp_path / "t" / os.listdir(tmp_path / "t")[0])
    assert a.shape[1] == 15 and np.isfinite(a).all()
    generate_tworays(pc, None, ncfg,
                     VolRenderConfig(perturb=False, **base),
                     gcfg, str(tmp_path / "u"))
    b = np.load(tmp_path / "u" / os.listdir(tmp_path / "u")[0])
    # identical rays (cols 0:9 are o, d, d2); rgb cols 9:15 must differ
    a_s, b_s = _sorted_rows(a, 9), _sorted_rows(b, 9)
    np.testing.assert_allclose(a_s[:, :9], b_s[:, :9], rtol=1e-6)
    assert np.abs(a_s[:, 9:] - b_s[:, 9:]).max() > 1e-6, \
        "perturb=True produced the unperturbed rgb — key not threaded"
