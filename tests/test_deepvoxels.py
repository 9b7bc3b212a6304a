"""DeepVoxels loader against a synthetic on-disk scene."""
import os

import numpy as np

from r2l_tpu.data.deepvoxels import load_dv_data, parse_intrinsics


def _make_scene(base, scene="greek", n_train=3, n_test=4, n_val=4):
    import imageio.v2 as imageio
    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("test", n_test),
                     ("validation", n_val)):
        d = os.path.join(base, split, scene)
        os.makedirs(os.path.join(d, "pose"), exist_ok=True)
        os.makedirs(os.path.join(d, "rgb"), exist_ok=True)
        if split == "train":
            with open(os.path.join(d, "intrinsics.txt"), "w") as f:
                f.write("512.0 256.0 256.0\n0 0 0\n0.8\n1.0\n512 512\n")
        for k in range(n):
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = rng.normal(size=3) + [0, 0, 3]
            with open(os.path.join(d, "pose", f"{k:04d}.txt"), "w") as f:
                f.write(" ".join(str(x) for x in pose.reshape(-1)))
            img = (rng.uniform(0, 255, (512, 512, 3))).astype(np.uint8)
            imageio.imwrite(os.path.join(d, "rgb", f"{k:04d}.png"), img)


def test_parse_intrinsics(tmp_path):
    p = tmp_path / "intrinsics.txt"
    p.write_text("512.0 256.0 256.0\n0 0 0\n0.8\n1.0\n512 512\n")
    focal = parse_intrinsics(str(p), 512)
    assert abs(focal - 512.0) < 1e-6


def test_load_dv_data(tmp_path):
    _make_scene(str(tmp_path))
    data = load_dv_data(str(tmp_path), scene="greek", testskip=2)
    # 3 train + ceil(4/2)=2 val + 2 test
    assert data.images.shape == (7, 512, 512, 3)
    assert data.poses.shape == (7, 3, 4)
    i_train, i_val, i_test = data.i_split
    assert len(i_train) == 3 and len(i_val) == 2 and len(i_test) == 2
    assert data.H == data.W == 512
    near, far = data.near_far()
    assert 0 < near < far
    # y/z flip convention applied: R @ diag(1,-1,-1)
    rot = data.poses[0, :3, :3]
    np.testing.assert_allclose(rot, np.diag([1.0, -1.0, -1.0]), atol=1e-6)
