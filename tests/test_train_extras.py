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


def test_teacher_rand_patch_nonsquare_n_rand(key, rng):
    """The reference's rand_patch sizes an aspect-matched patch for ANY
    N_rand (`helpers:394-405`) — a non-perfect-square n_rand must work."""
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    pc = init_nerf(key, ncfg)
    vcfg = VolRenderConfig(n_coarse=4, n_fine=0, perturb=True,
                           use_viewdirs=False, white_bkgd=True)
    tcfg = TeacherTrainConfig(n_rand=20, select_pixel_mode="rand_patch")
    state, tx = init_teacher_state(pc, {}, tcfg)
    step = make_teacher_step(ncfg, vcfg, tcfg, tx, H=8, W=6, focal=10.0)
    images = jnp.asarray(rng.uniform(0, 1, (2, 8, 6, 3)).astype(np.float32))
    poses = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2))
    state, m = step(state, images, poses, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_patch_dims_cover_and_aspect():
    from r2l_tpu.train import _patch_dims
    for (H, W, n) in [(8, 8, 16), (8, 6, 20), (400, 400, 820),
                      (100, 75, 1024), (16, 16, 256), (4, 4, 16),
                      (33, 97, 7)]:
        ph, pw = _patch_dims(H, W, n)
        assert 1 <= ph <= H and 1 <= pw <= W
        assert ph * pw >= n
    # perfect square on a square image keeps the reference's side x side
    assert _patch_dims(16, 16, 16) == (4, 4)


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


def test_perturb_test_changes_eval_render(key):
    """--perturb_test enables stratified z jitter at eval with sigma-noise
    off (reference render_kwargs_test, main.py:528-536): perturbed vs
    deterministic eval frames must differ, and perturbed frames must be
    deterministic per pose (key derived from the pose)."""
    import numpy as np
    from r2l_tpu.encoding import nerf_embed_dim
    from r2l_tpu.evaluate import make_nerf_frame_fn
    from r2l_tpu.models.nerf import NeRFConfig, init_nerf
    from r2l_tpu.render import VolRenderConfig
    from r2l_tpu.sampler import PointSampler
    from r2l_tpu.rays import pose_spherical

    cfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                     input_ch=nerf_embed_dim(3, 4), input_ch_views=0)
    pc = init_nerf(key, cfg)
    vcfg = VolRenderConfig(n_coarse=6, n_fine=0, use_viewdirs=False,
                           multires=4, multires_views=0, raw_noise_std=1.0)
    sampler = PointSampler(H=6, W=6, focal=6.0, n_sample=6,
                           near=2.0, far=6.0)
    pose = jnp.asarray(np.asarray(pose_spherical(10.0, -30.0, 4.0)[:3, :4]))
    f_det = make_nerf_frame_fn(pc, None, cfg, vcfg, sampler,
                               perturb_test=False)
    f_pert = make_nerf_frame_fn(pc, None, cfg, vcfg, sampler,
                                perturb_test=True)
    a, b = np.asarray(f_det(pose)), np.asarray(f_pert(pose))
    assert not np.allclose(a, b)          # jitter changes the samples
    assert np.allclose(b, np.asarray(f_pert(pose)))  # but is per-pose det


def test_use_batching_epoch_reshuffle(tmp_path, capsys):
    """The teacher use_batching pool reshuffles when an epoch is
    exhausted (reference main.py:1204-1209)."""
    import json as _json
    import os
    import numpy as np
    from r2l_tpu.app import train
    from r2l_tpu.configs import parse_args

    # tiny scene inline (2 train imgs of 8x8 => pool 128 rays; N_rand 32
    # wraps every 4 iters)
    import imageio.v2 as imageio
    base = tmp_path / "scene"
    rng = np.random.default_rng(0)
    for split, n in (("train", 2), ("val", 1), ("test", 1)):
        os.makedirs(base / split, exist_ok=True)
        frames = []
        for k in range(n):
            img = (rng.uniform(0, 255, (8, 8, 4))).astype(np.uint8)
            imageio.imwrite(str(base / split / f"r_{k}.png"), img)
            pose = np.eye(4); pose[2, 3] = 4.0
            frames.append({"file_path": f"./{split}/r_{k}",
                           "transform_matrix": pose.tolist()})
        _json.dump({"camera_angle_x": 0.69, "frames": frames},
                   open(base / f"transforms_{split}.json", "w"))
    train(parse_args([
        "--model_name", "nerf", "--dataset_type", "blender",
        "--datadir", str(base), "--white_bkgd", "--testskip", "1",
        "--N_samples", "4", "--N_importance", "0", "--N_rand", "32",
        "--N_iters", "9", "--i_print", "100", "--i_testset", "9",
        "--i_weights", "9", "--i_img", "0", "--chunk", "256",
        "--experiment_name", "er",
        "--experiments_dir", str(tmp_path / "Exp")]))
    out = capsys.readouterr().out
    assert "Shuffle data after an epoch!" in out


def test_teacher_i_video_and_intermediate_ckpts(tmp_path):
    """Teacher training renders the periodic novel-view video and keeps
    per-step checkpoints under --save_intermediate_models
    (reference `main.py:1472-1510`)."""
    import json as _json
    import os
    import numpy as np
    import imageio.v2 as imageio
    from r2l_tpu.app import train
    from r2l_tpu.configs import parse_args

    base = tmp_path / "scene"
    rng = np.random.default_rng(0)
    for split, n in (("train", 2), ("val", 1), ("test", 1)):
        os.makedirs(base / split, exist_ok=True)
        frames = []
        for k in range(n):
            img = (rng.uniform(0, 255, (8, 8, 4))).astype(np.uint8)
            imageio.imwrite(str(base / split / f"r_{k}.png"), img)
            pose = np.eye(4); pose[2, 3] = 4.0
            frames.append({"file_path": f"./{split}/r_{k}",
                           "transform_matrix": pose.tolist()})
        _json.dump({"camera_angle_x": 0.69, "frames": frames},
                   open(base / f"transforms_{split}.json", "w"))
    exps = str(tmp_path / "Exp")
    train(parse_args([
        "--model_name", "nerf", "--dataset_type", "blender",
        "--datadir", str(base), "--white_bkgd", "--testskip", "1",
        "--N_samples", "4", "--N_importance", "0", "--N_rand", "32",
        "--N_iters", "4", "--i_print", "100", "--i_testset", "4",
        "--i_weights", "2", "--i_img", "0", "--i_video", "2",
        "--n_pose_video", "2", "--chunk", "256", "--no_batching",
        "--save_intermediate_models",
        "--experiment_name", "tv", "--experiments_dir", exps]))
    files = []
    for root, _, fs in os.walk(exps):
        files += fs
    assert "teacher_0000002.msgpack" in files
    assert "teacher.msgpack" in files
    assert any(f.startswith("video_") for f in files)
