"""LLFF loader math tests on synthetic poses (no real dataset needed)."""
import numpy as np

from r2l_tpu.data.llff import (get_rand_pose_llff, poses_avg, recenter_poses,
                               render_path_spiral, spherify_poses, viewmatrix)


def _synthetic_poses(n=12, r=4.0, hwf=(60, 80, 50.0)):
    """Cameras on a ring looking at the origin, [n, 3, 5]."""
    poses = []
    for th in np.linspace(0, 2 * np.pi, n, endpoint=False):
        pos = np.array([r * np.cos(th), r * np.sin(th), 1.0])
        z = pos / np.linalg.norm(pos)     # camera looks along -z toward 0
        up = np.array([0.0, 0.0, 1.0])
        m = viewmatrix(z, up, pos)
        poses.append(np.concatenate(
            [m, np.asarray(hwf, np.float32).reshape(3, 1)], 1))
    return np.stack(poses).astype(np.float32)


def test_viewmatrix_orthonormal():
    m = viewmatrix(np.array([0, 0, 1.0]), np.array([0, 1.0, 0]),
                   np.zeros(3))
    rot = m[:3, :3]
    np.testing.assert_allclose(rot.T @ rot, np.eye(3), atol=1e-6)


def test_recenter_moves_average_to_identity():
    poses = _synthetic_poses()
    rec = recenter_poses(poses)
    avg = poses_avg(rec)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
    # hwf column preserved
    np.testing.assert_allclose(rec[:, :3, 4], poses[:, :3, 4])


def test_spiral_path_shape_and_rotations():
    poses = _synthetic_poses()
    c2w = poses_avg(poses)
    up = np.array([0.0, 0.0, 1.0])
    path = render_path_spiral(c2w, up, rads=[1, 1, 0.5], focal=2.0, n=30)
    assert path.shape == (30, 3, 5)
    rot = path[0, :3, :3]
    np.testing.assert_allclose(rot.T @ rot, np.eye(3), atol=1e-5)


def test_spherify_normalizes_radius():
    poses = _synthetic_poses()
    bds = np.tile(np.array([[2.0, 8.0]], np.float32), (poses.shape[0], 1))
    reset, new_poses, bds2 = spherify_poses(poses, bds)
    rad = np.sqrt(np.mean(np.sum(reset[:, :3, 3] ** 2, -1)))
    np.testing.assert_allclose(rad, 1.0, atol=1e-5)
    assert new_poses.shape[1:] == (3, 5)


def test_rand_pose_valid_and_bounded():
    """Rotations orthonormal; origins bounded by the (rotated) 1.1x bbox
    sample mapped through the average pose — check against a generous
    world-space ball rather than the axis-aligned bbox."""
    poses = _synthetic_poses()
    rng = np.random.default_rng(0)
    origins = poses[:, :3, 3]
    center = origins.mean(0)
    r_max = np.linalg.norm(origins - center, axis=1).max()
    for _ in range(10):
        p = get_rand_pose_llff(rng, poses)
        assert p.shape == (3, 5)
        rot = p[:3, :3]
        np.testing.assert_allclose(rot.T @ rot, np.eye(3), atol=1e-5)
        assert np.linalg.norm(p[:3, 3] - center) <= 2.5 * r_max + 1e-6


def test_load_llff_data_from_disk(tmp_path):
    """Full loader path against a synthetic on-disk LLFF capture."""
    import imageio.v2 as imageio

    from r2l_tpu.data.llff import load_llff_data

    base = tmp_path / "scene"
    (base / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    n, H, W = 6, 32, 40
    poses_bounds = []
    for k in range(n):
        img = (rng.uniform(0, 255, (H * 4, W * 4, 3))).astype(np.uint8)
        imageio.imwrite(str(base / "images" / f"img_{k:03d}.png"), img)
        # LLFF layout: [down, right, back] columns + hwf, close/far bounds
        m = _synthetic_poses(n=1, r=3.0, hwf=(H * 4, W * 4, 200.0))[0]
        # convert back from [right, up, back] to llff's [down,right,back]
        llff = np.concatenate([-m[:, 1:2], m[:, 0:1], m[:, 2:]], 1)
        poses_bounds.append(np.concatenate(
            [llff.reshape(-1), [2.0, 8.0]]))
    np.save(base / "poses_bounds.npy", np.stack(poses_bounds))

    data = load_llff_data(str(base), factor=4)
    assert data.images.shape == (n, H, W, 3)
    assert data.poses.shape == (n, 3, 5)
    assert 0 <= data.i_test < n
    assert data.render_poses.shape[1:] == (3, 5)
    i_train, i_test = data.splits(llffhold=3)
    assert set(i_train) | set(i_test) == set(range(n))
    near, far = data.near_far(no_ndc=False)
    assert (near, far) == (0.0, 1.0)
    # downscale cache materialized
    import os
    assert len(os.listdir(base / "images_4")) == n
