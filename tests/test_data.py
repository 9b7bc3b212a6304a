import json
import os

import numpy as np
import pytest

from r2l_tpu.data.blender import load_blender_data
from r2l_tpu.data.rayshards import (RayBatchLoader, RayShardDataset,
                                    get_pseudo_ratio, shuffle_rays,
                                    write_ray_shards)


def make_fake_blender(tmp_path, H=8, W=8, n_train=3, n_test=2):
    """Procedural tiny blender-format dataset."""
    import imageio.v2 as imageio
    rng = np.random.default_rng(0)
    base = str(tmp_path / "lego")
    os.makedirs(base, exist_ok=True)
    for split, n in [("train", n_train), ("val", 1), ("test", n_test)]:
        frames = []
        os.makedirs(os.path.join(base, split), exist_ok=True)
        for i in range(n):
            rel = f"./{split}/r_{i}"
            img = (rng.uniform(0, 255, (H, W, 4))).astype(np.uint8)
            imageio.imwrite(os.path.join(base, split, f"r_{i}.png"), img)
            pose = np.eye(4)
            pose[2, 3] = 4.0
            frames.append({"file_path": rel,
                           "transform_matrix": pose.tolist()})
        with open(os.path.join(base, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)
    return base


def test_load_blender(tmp_path):
    base = make_fake_blender(tmp_path)
    d = load_blender_data(base)
    assert d.images.shape == (6, 8, 8, 4)
    assert d.poses.shape == (6, 4, 4)
    assert len(d.i_split[0]) == 3 and len(d.i_split[2]) == 2
    expect_focal = 0.5 * 8 / np.tan(0.5 * 0.6911)
    np.testing.assert_allclose(d.focal, expect_focal, rtol=1e-6)
    white = d.white_bkgd_rgb()
    assert white.shape == (6, 8, 8, 3)
    assert white.max() <= 1.0


def test_load_blender_half_res(tmp_path):
    base = make_fake_blender(tmp_path, H=8, W=8)
    d = load_blender_data(base, half_res=True)
    assert d.images.shape[1:3] == (4, 4)


def test_load_blender_testskip(tmp_path):
    base = make_fake_blender(tmp_path, n_test=4)
    d = load_blender_data(base, testskip=2)
    assert len(d.i_split[2]) == 2


def test_write_and_read_shards(tmp_path, rng):
    rays = rng.normal(size=(1000, 9)).astype(np.float32)
    paths = write_ray_shards(str(tmp_path), rays, prefix="pseudo",
                             shard_size=300)
    assert len(paths) == 4
    ds = RayShardDataset(str(tmp_path))
    assert len(ds) == 1000 and ds.record_dim == 9
    batch = ds.sample_batch(rng, 128, chunk=64)
    assert batch.shape == (128, 9)


def test_shards_append_numbering(tmp_path, rng):
    rays = rng.normal(size=(100, 9)).astype(np.float32)
    write_ray_shards(str(tmp_path), rays, shard_size=100)
    p2 = write_ray_shards(str(tmp_path), rays, shard_size=100)
    assert p2[0].endswith("pseudo_000001.npy")


def test_real_pseudo_mixing(tmp_path, rng):
    real = np.zeros((500, 9), np.float32)
    pseudo = np.ones((500, 9), np.float32)
    write_ray_shards(str(tmp_path), real, prefix="train", shuffle=False)
    write_ray_shards(str(tmp_path), pseudo, prefix="pseudo", shuffle=False)
    ds = RayShardDataset(str(tmp_path), pseudo_ratio=0.9)
    frac = np.mean([ds.sample_batch(rng, 256, chunk=32)[:, 0].mean()
                    for _ in range(20)])
    assert 0.75 < frac < 1.0  # ~90% pseudo
    ds2 = RayShardDataset(str(tmp_path), pseudo_ratio=0.1)
    frac2 = np.mean([ds2.sample_batch(rng, 256, chunk=32)[:, 0].mean()
                     for _ in range(20)])
    assert frac2 < frac


def test_pseudo_ratio_schedule():
    s = "1:0.2,500000:0.9"
    np.testing.assert_allclose(get_pseudo_ratio(s, 1), 0.2, atol=1e-6)
    np.testing.assert_allclose(get_pseudo_ratio(s, 500000), 0.9, atol=1e-6)
    mid = get_pseudo_ratio(s, 250000)
    assert 0.5 < mid < 0.6


def test_ray_batch_loader(tmp_path, rng):
    rays = rng.normal(size=(2000, 9)).astype(np.float32)
    write_ray_shards(str(tmp_path), rays, shard_size=1000)
    loader = RayBatchLoader(RayShardDataset(str(tmp_path)), batch_size=256,
                            chunk=128)
    b1 = next(loader)
    b2 = next(loader)
    assert b1.shape == (256, 9)
    assert not np.array_equal(b1, b2)
    loader.close()


def test_shuffle_rays_permutes(rng):
    rays = np.arange(100, dtype=np.float32)[:, None].repeat(9, 1)
    out = shuffle_rays(rng, rays.copy())
    assert not np.array_equal(out[:, 0], rays[:, 0])
    assert sorted(out[:, 0].tolist()) == rays[:, 0].tolist()


def test_blender_half_res(tmp_path):
    """half_res path: cv2 area-resize + focal halving
    (reference `load_blender.py:106-115`)."""
    import json

    import imageio.v2 as imageio

    from r2l_tpu.data.blender import load_blender_data

    base = str(tmp_path / "scene")
    os.makedirs(base + "/train", exist_ok=True)
    rng = np.random.default_rng(0)
    for split, n in (("train", 2), ("val", 1), ("test", 1)):
        os.makedirs(f"{base}/{split}", exist_ok=True)
        frames = []
        for k in range(n):
            img = rng.uniform(0, 255, (16, 16, 4)).astype(np.uint8)
            imageio.imwrite(f"{base}/{split}/r_{k}.png", img)
            frames.append({"file_path": f"./{split}/r_{k}",
                           "transform_matrix": np.eye(4).tolist()})
        with open(f"{base}/transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)

    full = load_blender_data(base)
    half = load_blender_data(base, half_res=True)
    assert full.H == 16 and half.H == 8
    np.testing.assert_allclose(half.focal, full.focal / 2.0, rtol=1e-6)
    assert half.images.shape == (4, 8, 8, 4)


def test_spiral_pseudo_images(tmp_path, key):
    """spiral_evenly_spaced mode writes an images+poses npz."""
    import jax

    from r2l_tpu.datagen import DataGenConfig, generate_pseudo_images
    from r2l_tpu.models import NeRFConfig, init_nerf
    from r2l_tpu.render import VolRenderConfig

    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    vcfg = VolRenderConfig(n_coarse=4, n_fine=0, perturb=False,
                           use_viewdirs=False, white_bkgd=True,
                           ray_chunk=64)
    params = init_nerf(key, ncfg)
    gcfg = DataGenConfig(n_pose=4, H=8, W=8, focal=10.0)
    n = generate_pseudo_images(params, None, ncfg, vcfg, gcfg,
                               str(tmp_path), n_pose=4)
    assert n == 4
    f = [x for x in os.listdir(tmp_path) if x.startswith("pseudo_images")][0]
    imgs = np.load(tmp_path / f, mmap_mode="r")  # mmap-able .npy pack
    assert imgs.shape == (4, 8, 8, 3)
    poses = np.load(tmp_path / f.replace("pseudo_images_", "pseudo_poses_"))
    assert poses.shape[0] == 4


def test_ray_batch_loader_multiworker(tmp_path):
    """workers>1: all batches well-formed, stop() joins cleanly."""
    import numpy as np
    from r2l_tpu.data.rayshards import (RayBatchLoader, RayShardDataset,
                                        write_ray_shards)
    rng = np.random.default_rng(0)
    rays = rng.uniform(0, 1, (4096 * 3, 9)).astype(np.float32)
    write_ray_shards(str(tmp_path), rays, prefix="pseudo")
    ds = RayShardDataset(str(tmp_path))
    loader = RayBatchLoader(ds, batch_size=512, workers=4)
    for _ in range(12):
        b = next(loader)
        assert b.shape == (512, 9) and np.isfinite(b).all()
    loader.close()


def test_ray_batch_loader_deterministic_order(tmp_path):
    """Batch sequence is a pure function of (seed, workers) — identical
    across runs regardless of thread timing (round-robin queues)."""
    import numpy as np
    from r2l_tpu.data.rayshards import (RayBatchLoader, RayShardDataset,
                                        write_ray_shards)
    rng = np.random.default_rng(0)
    rays = rng.uniform(0, 1, (4096 * 3, 9)).astype(np.float32)
    write_ray_shards(str(tmp_path), rays, prefix="pseudo")
    ds = RayShardDataset(str(tmp_path))

    def seq(workers):
        loader = RayBatchLoader(ds, batch_size=256, seed=5,
                                workers=workers)
        out = [next(loader).copy() for _ in range(8)]
        loader.close()
        return out

    a, b = seq(4), seq(4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_ray_batch_loader_worker_error_surfaces(tmp_path):
    """A worker exception raises in the consumer instead of hanging."""
    import numpy as np
    import pytest as _pytest
    from r2l_tpu.data.rayshards import (RayBatchLoader, RayShardDataset,
                                        write_ray_shards)
    rng = np.random.default_rng(0)
    rays = rng.uniform(0, 1, (4096, 9)).astype(np.float32)
    write_ray_shards(str(tmp_path), rays, prefix="pseudo")
    ds = RayShardDataset(str(tmp_path))
    loader = RayBatchLoader(ds, batch_size=64, workers=2,
                            pseudo_ratio_schedule="not-a-schedule")
    with _pytest.raises(RuntimeError, match="worker failed"):
        for _ in range(4):
            next(loader)
    loader.close()


def test_image_shard_consumer(tmp_path, rng):
    """rand_images_*.npz image-shaped shards are a live training input
    (the reference's BlenderDataset_v2 image branch,
    `dataset/load_blender.py:306-322`, is dead code there)."""
    from r2l_tpu.data.rayshards import RayShardDataset
    F, H, W = 3, 8, 8
    # frame f filled with value f in every record slot -> provenance check
    data = np.stack([np.full((H, W, 9), f, np.float32) for f in range(F)])
    np.savez(str(tmp_path / "rand_images_00000.npz"), data=data)

    ds = RayShardDataset(str(tmp_path))
    assert len(ds) == F * H * W and ds.record_dim == 9
    assert ds.n_pseudo == F * H * W and ds.n_real == 0
    batch = ds.sample_batch(rng, 128, chunk=32)
    assert batch.shape == (128, 9)
    assert set(np.unique(batch)).issubset({0.0, 1.0, 2.0})
    # each 32-row chunk comes from ONE frame (whole-frame draw)
    for c in batch.reshape(-1, 32, 9)[:2]:
        assert len(np.unique(c)) == 1
    # consolidation cache written once, then mmapped
    assert (tmp_path / "rand_images_00000.frames.npy").exists()


def test_image_shard_rand_crop(tmp_path, rng):
    """--rand_crop_size draws a random SxS crop per chunk (the reference
    _square_rand_bbox, `load_blender.py:306-310`)."""
    from r2l_tpu.data.rayshards import RayShardDataset
    H = W = 8
    # record value encodes the pixel (y*W + x) so crops are recognizable
    frame = np.arange(H * W, dtype=np.float32).reshape(H, W, 1)
    data = np.repeat(frame[None], 9, axis=-1)
    np.savez(str(tmp_path / "rand_images_00000.npz"), data=data)

    s = 4
    ds = RayShardDataset(str(tmp_path), rand_crop_size=s)
    chunk = ds._draw_chunk(rng, ds.pseudo, s * s)
    assert chunk.shape == (s * s, 9)
    ids = chunk[:, 0].astype(int)
    ys, xs = ids // W, ids % W
    # a contiguous s x s box
    assert ys.max() - ys.min() == s - 1 and xs.max() - xs.min() == s - 1
    assert len(np.unique(ids)) == s * s

    import pytest as _pytest
    with _pytest.raises(ValueError, match="exceeds frame"):
        RayShardDataset(str(tmp_path), rand_crop_size=H + 1)


def test_image_and_flat_shards_mix(tmp_path, rng):
    """Flat train_ shards and image-shaped pseudo shards mix under
    pseudo_ratio, weighted by ray count."""
    from r2l_tpu.data.rayshards import RayShardDataset, write_ray_shards
    write_ray_shards(str(tmp_path), np.zeros((256, 9), np.float32),
                     prefix="train", shuffle=False)
    np.savez(str(tmp_path / "rand_images_00000.npz"),
             data=np.ones((2, 8, 8, 9), np.float32))
    ds = RayShardDataset(str(tmp_path), pseudo_ratio=0.5)
    assert ds.n_real == 256 and ds.n_pseudo == 128
    frac = np.mean([ds.sample_batch(rng, 128, chunk=32)[:, 0].mean()
                    for _ in range(20)])
    assert 0.3 < frac < 0.7  # ~50/50 real/pseudo


def test_image_shard_crop_fills_batch_without_tiling(tmp_path, rng):
    """Regression: crop draws yield s*s rows (not `chunk`), so
    sample_batch must keep drawing until the batch is full instead of
    tiling a single under-sized draw."""
    from r2l_tpu.data.rayshards import RayShardDataset
    H = W = 8
    frames = []
    for f in range(2):
        ids = (np.arange(H * W, dtype=np.float32) + 1000 * f
               ).reshape(H, W, 1)
        frames.append(np.repeat(ids, 9, axis=-1))
    np.savez(str(tmp_path / "rand_images_00000.npz"),
             data=np.stack(frames))
    ds = RayShardDataset(str(tmp_path), rand_crop_size=4)
    batch = ds.sample_batch(rng, 64, chunk=4096)
    assert batch.shape == (64, 9)
    # old behavior: ONE 16-row crop tiled 4x -> <= 16 unique pixel ids
    assert len(np.unique(batch[:, 0])) > 16
