import jax.numpy as jnp
import numpy as np

from r2l_tpu import rays


def _golden_rays(H, W, focal, c2w):
    """Independent numpy ray generation for cross-checking."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - W * 0.5) / focal, -(j - H * 0.5) / focal,
                     -np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def test_get_rays_matches_golden(rng):
    H, W, focal = 5, 7, 10.0
    c2w = rays.pose_spherical(33.0, -40.0, 4.0).astype(np.float32)
    ro, rd = rays.get_rays(H, W, focal, jnp.asarray(c2w))
    go, gd = _golden_rays(H, W, focal, c2w)
    np.testing.assert_allclose(np.asarray(ro), go, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), gd, rtol=1e-5, atol=1e-6)


def test_get_rays_center_pixel_points_forward():
    H = W = 4
    c2w = jnp.eye(4)[:3]
    _, rd = rays.get_rays(H, W, 100.0, c2w)
    # With identity pose, central dirs are ~[0, 0, -1].
    assert float(rd[2, 2, 2]) == -1.0


def test_focal_scale_shrinks_fov():
    H = W = 8
    c2w = jnp.eye(4)[:3]
    _, rd1 = rays.get_rays(H, W, 10.0, c2w)
    _, rd2 = rays.get_rays(H, W, 10.0, c2w, focal_scale=2.0)
    np.testing.assert_allclose(np.asarray(rd2[..., :2]),
                               np.asarray(rd1[..., :2]) / 2.0, rtol=1e-6)


def test_ndc_rays_on_near_plane():
    H, W, focal = 10, 10, 12.0
    ro = jnp.array([[0.2, -0.1, -0.5]])
    rd = jnp.array([[0.01, 0.02, -1.0]])
    no, nd = rays.ndc_rays(H, W, focal, 1.0, ro, rd)
    # After the warp, origin z = 1 + 2*near/oz with oz = -near -> -1.
    np.testing.assert_allclose(float(no[0, 2]), -1.0, rtol=1e-6)
    # Golden scalar check of the projection formula.
    oz = -1.0  # shifted origin z equals -near
    t = -(1.0 + float(ro[0, 2])) / float(rd[0, 2])
    ox = float(ro[0, 0]) + t * float(rd[0, 0])
    np.testing.assert_allclose(
        float(no[0, 0]), -1.0 / (W / (2 * focal)) * ox / oz, rtol=1e-5)


def test_plucker_moment_orthogonal():
    o = jnp.array([[1.0, 2.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    p = rays.plucker(o, d)
    assert p.shape == (1, 6)
    m = np.asarray(p[0, 3:])
    # moment = o x d EXACTLY (reference `nerf_raybased.py:174`:
    # torch.cross(rays_o, rays_d)) — orthogonality alone would also
    # accept the sign-flipped d x o, which breaks checkpoint parity
    np.testing.assert_allclose(m, np.cross(np.asarray(o[0]),
                                           np.asarray(d[0])), atol=1e-7)
    np.testing.assert_allclose(np.asarray(p[0, :3]), np.asarray(d[0]))


def test_pose_spherical_is_rigid():
    c2w = rays.pose_spherical(45.0, -30.0, 4.0)
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 4.0, rtol=1e-6)


def test_get_rand_pose_ranges(rng):
    for _ in range(20):
        c2w = rays.get_rand_pose(rng)
        np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 4.0, rtol=1e-5)
        # phi in [-90, 0] keeps the camera at or above the equator: after
        # the blender flip (new_y = old_z, new_z = old_y) the height is
        # world z = -sin(phi) * r >= 0.
        assert c2w[2, 3] >= -1e-5


def test_get_novel_poses_counts():
    assert rays.get_novel_poses(8).shape == (8, 4, 4)
    assert rays.get_novel_poses([4, 2, 2]).shape == (16, 4, 4)


def test_get_novel_poses_grid_matches_reference_formula():
    """Grid values: phi/radius take INTERIOR linspace points
    (reference `load_blender.py:337-339`)."""
    poses = rays.get_novel_poses([4, 2, 2])
    assert poses.shape == (16, 4, 4)
    # Heights (world z = -sin(phi) * r) must correspond to interior phis
    # [-60, -30], never the phi=-90 pole.
    import numpy as np
    radii = np.linalg.norm(poses[:, :3, 3], axis=1)
    np.testing.assert_allclose(sorted(set(np.round(radii, 4))),
                               [10/3, 14/3], rtol=1e-4)


def test_get_rays_np_matches_jax():
    """Host numpy ray-gen (datagen hot path) == the jnp get_rays."""
    from r2l_tpu.rays import get_rays, get_rays_np, pose_spherical
    c2w = np.asarray(pose_spherical(33.0, -42.0, 4.0))[:3, :4]
    ro_j, rd_j = get_rays(11, 13, 7.5, jnp.asarray(c2w), focal_scale=1.5)
    ro_n, rd_n = get_rays_np(11, 13, 7.5, c2w, focal_scale=1.5)
    np.testing.assert_allclose(ro_n, np.asarray(ro_j), atol=1e-6)
    np.testing.assert_allclose(rd_n, np.asarray(rd_j), atol=1e-6)
    # trans_origin hack too
    ro_j, rd_j = get_rays(8, 8, 5.0, jnp.asarray(c2w), trans_origin="fixed")
    ro_n, rd_n = get_rays_np(8, 8, 5.0, c2w, trans_origin="fixed")
    np.testing.assert_allclose(ro_n, np.asarray(ro_j), atol=1e-4)


def test_get_novel_poses_mode_value_items():
    """'mode:value' axis items (reference `load_blender.py:335-352`):
    sample:N -> even-spaced N values, other modes -> the fixed value.
    Previously these CLI-sanctioned forms crashed in the int() consumers."""
    import numpy as np
    # all-fixed phi/radius with a sampled theta ring == the int form
    ring = rays.get_novel_poses(["sample:4", "fix:-30", "fix:4"])
    np.testing.assert_allclose(ring, rays.get_novel_poses(4), atol=1e-12)
    # fixed theta: one pose per phi/radius grid point
    assert rays.get_novel_poses(["fix:90", "sample:2", "sample:3"]
                                ).shape == (6, 4, 4)
    # mixing plain ints with mode:value items also works
    assert rays.get_novel_poses([4, "fix:-30", 1]).shape == (4, 4, 4)


def test_donerf_ray_dirs_golden():
    """donerf_ray_dirs vs an independent transcription of the DONeRF
    formula exactly as the reference converter computes it
    (generate_ray_directions, `utils/convert_original_data_to_rays_
    blender.py:35-57`: fov/focal parametrization, normalize, negate
    y/z)."""
    from r2l_tpu.rays import camera_ray_dirs, donerf_ray_dirs

    H, W = 12, 20
    cax = 0.6911112070083618
    focal = 0.5 * W / np.tan(0.5 * cax)

    # reference formula, fov/focal parametrization
    x_dist = np.tan(cax / 2) * focal
    y_dist = x_dist * (H / W)
    x_pp, y_pp = x_dist / (W / 2), y_dist / (H / 2)
    start = np.array([-(x_dist - x_pp / 2), -(y_dist - y_pp / 2), focal])
    ray_d = np.repeat(start[None], W * H, axis=0).reshape((H, W, -1))
    w_range = np.repeat(np.arange(W)[None], H, axis=0)
    h_range = np.repeat(np.arange(H)[None], W, axis=0).T
    ray_d[:, :, 0] += x_pp * w_range
    ray_d[:, :, 1] += y_pp * h_range
    ref = ray_d / np.linalg.norm(ray_d, axis=2, keepdims=True)
    ref[:, :, 1] *= -1.0
    ref[:, :, 2] *= -1.0

    got = donerf_ray_dirs(H, W, focal)
    np.testing.assert_allclose(got, ref.astype(np.float32), atol=1e-6)
    # unit-norm (the convention delta vs the NeRF grid)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                               atol=1e-6)
    # and NOT the NeRF grid: the half-pixel offset shows up
    nerf = np.asarray(camera_ray_dirs(H, W, focal))
    nerf = nerf / np.linalg.norm(nerf, axis=-1, keepdims=True)
    assert np.abs(got - nerf).max() > 1e-3
