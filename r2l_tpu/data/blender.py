"""Blender synthetic dataset loader (NeRF transforms_*.json format).

Host-side numpy; images land on device later via the prefetching loaders.
Mirrors reference `dataset/load_blender.py:31-120` minus its debug warts
(unconditional matplotlib scatter dumps), with the DONeRF
``dataset_info.json`` focal fallback kept.
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np


@dataclasses.dataclass
class BlenderData:
    images: np.ndarray        # [N, H, W, 4] or [N, H, W, 3] float32 in [0,1]
    poses: np.ndarray         # [N, 4, 4]
    H: int
    W: int
    focal: float
    i_split: tuple[np.ndarray, np.ndarray, np.ndarray]  # train/val/test ids
    near: float = 2.0
    far: float = 6.0

    def white_bkgd_rgb(self) -> np.ndarray:
        """Composite RGBA onto white -> [N, H, W, 3]."""
        if self.images.shape[-1] == 3:
            return self.images
        rgb, a = self.images[..., :3], self.images[..., 3:]
        return rgb * a + (1.0 - a)

    def black_bkgd_rgb(self) -> np.ndarray:
        if self.images.shape[-1] == 3:
            return self.images
        return self.images[..., :3] * self.images[..., 3:]


def _read_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    img = imageio.imread(path)
    return (np.asarray(img) / 255.0).astype(np.float32)


def load_blender_data(basedir: str, half_res: bool = False,
                      testskip: int = 1) -> BlenderData:
    """Load the three splits. ``testskip`` subsamples val/test
    (reference `load_blender.py:50-53`)."""
    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json")) as f:
            metas[s] = json.load(f)

    all_imgs, all_poses, counts = [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if s == "train" or testskip == 0 else testskip
        frames = meta["frames"][::skip]
        imgs, poses = [], []
        for frame in frames:
            fname = os.path.join(basedir, frame["file_path"])
            if not os.path.splitext(fname)[1]:
                fname += ".png"
            imgs.append(_read_image(fname))
            poses.append(np.asarray(frame["transform_matrix"],
                                    dtype=np.float32))
        all_imgs.append(np.stack(imgs) if imgs else
                        np.zeros((0, 1, 1, 4), np.float32))
        all_poses.append(np.stack(poses) if poses else
                         np.zeros((0, 4, 4), np.float32))
        counts.append(counts[-1] + len(frames))

    i_split = tuple(np.arange(counts[i], counts[i + 1]) for i in range(3))
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)
    H, W = imgs.shape[1:3]

    meta0 = metas["train"]
    if "camera_angle_x" in meta0:
        focal = 0.5 * W / np.tan(0.5 * float(meta0["camera_angle_x"]))
    else:
        # DONeRF layout: intrinsics live in dataset_info.json
        # (reference `load_blender.py:76-81`).
        with open(os.path.join(basedir, "dataset_info.json")) as f:
            info = json.load(f)
        focal = 0.5 * W / np.tan(0.5 * float(info["camera_angle_x"]))

    if half_res:
        import cv2
        H, W = H // 2, W // 2
        focal = focal / 2.0
        imgs = np.stack([
            cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA)
            for im in imgs])

    return BlenderData(images=imgs.astype(np.float32),
                       poses=poses, H=int(H), W=int(W), focal=float(focal),
                       i_split=i_split)
