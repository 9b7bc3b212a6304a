"""Generate golden FLIP/SSIM fixtures from the reference torch code.

Runs `/root/reference/utils/flip_loss.py` and `ssim_torch.py` on CPU (their
hardcoded device='cuda' strings patched to 'cpu') over fixed image pairs and
freezes the results into tests/fixtures/metrics_golden.npz, so the JAX
implementations (r2l_tpu/flip.py, r2l_tpu/metrics.py) are numerically
parity-tested, not just property-tested.

Run once in an environment that has the reference checkout:
    python tools/gen_metric_fixtures.py
"""
from __future__ import annotations

import os
import types

import numpy as np

REF = "/root/reference/utils"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "tests", "fixtures", "metrics_golden.npz")


def load_patched(path: str, name: str):
    src = open(path).read().replace("'cuda'", "'cpu'").replace(
        '"cuda"', '"cpu"').replace(".cuda()", ".cpu()")
    mod = types.ModuleType(name)
    mod.__file__ = path
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def make_pairs(h=48, w=64, n=3):
    rng = np.random.default_rng(42)
    pairs = []
    # structured gradient + smooth bump (image-like; exercises the CSF
    # filters away from pure noise)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([xx / w, yy / h, 0.5 + 0.3 * np.sin(xx / 7)], -1)
    bump = np.exp(-(((xx - w / 2) / 10) ** 2 + ((yy - h / 2) / 8) ** 2))
    a = np.clip(base + 0.2 * bump[..., None], 0, 1).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    pairs.append((a, b))
    # pure noise pair
    pairs.append((rng.uniform(0, 1, (h, w, 3)).astype(np.float32),
                  rng.uniform(0, 1, (h, w, 3)).astype(np.float32)))
    # near-identical pair (small bias)
    c = rng.uniform(0.2, 0.8, (h, w, 3)).astype(np.float32)
    pairs.append((c, np.clip(c + 0.01, 0, 1).astype(np.float32)))
    return pairs


def main():
    import torch

    flip_mod = load_patched(os.path.join(REF, "flip_loss.py"), "ref_flip")
    ssim_mod = load_patched(os.path.join(REF, "ssim_torch.py"), "ref_ssim")

    pairs = make_pairs()
    flip_vals, ssim_vals = [], []
    model = flip_mod.FLIP()
    for gt, img in pairs:
        gt_t = torch.from_numpy(gt.transpose(2, 0, 1))[None]     # NCHW
        img_t = torch.from_numpy(img.transpose(2, 0, 1))[None]
        # reference eval call: FLIP().forward(outputs=img, targets=gt)
        # (`main.py:372-379`)
        flip_vals.append(float(model.forward(img_t, gt_t)))
        ssim_vals.append(float(ssim_mod.ssim(img_t, gt_t)))

    # minmax-convention FLIP (reference `main.py:361-377`): min-max
    # rescale the WHOLE [N,3,H,W] stacks (renders and gts, each with its
    # own global lo/hi) to [-1,1], then compute_flip on the rescaled
    # stacks; per-image means frozen for --flip_rescale minmax parity.
    rec = torch.from_numpy(
        np.stack([p[1] for p in pairs]).transpose(0, 3, 1, 2)).float()
    ref = torch.from_numpy(
        np.stack([p[0] for p in pairs]).transpose(0, 3, 1, 2)).float()
    rescale = lambda x, ymin, ymax: (ymax - ymin) / (x.max() - x.min()) * (  # noqa: E731
        x - x.min()) + ymin
    rec_s, ref_s = rescale(rec, -1, 1), rescale(ref, -1, 1)
    ppd = 0.7 * (3840 / 0.7) * (np.pi / 180)
    flips = model.compute_flip(rec_s, ref_s, ppd)          # [N, 1, H, W]
    flip_minmax = flips.mean(dim=(1, 2, 3)).numpy().astype(np.float64)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT,
             gts=np.stack([p[0] for p in pairs]),
             imgs=np.stack([p[1] for p in pairs]),
             flip=np.asarray(flip_vals, np.float64),
             flip_minmax=flip_minmax,
             ssim=np.asarray(ssim_vals, np.float64))
    print("flip:", flip_vals)
    print("flip_minmax:", list(flip_minmax))
    print("ssim:", ssim_vals)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
