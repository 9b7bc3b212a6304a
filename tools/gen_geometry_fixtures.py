"""Generate golden geometry/volume fixtures from the reference torch code.

Runs the reference's `utils/run_nerf_raybased_helpers.py` (get_rays,
ndc_rays, sample_pdf det=True, raw2outputs with no noise) on CPU over
fixed inputs and freezes results into tests/fixtures/geometry_golden.npz,
so r2l_tpu/{rays,volume}.py are parity-tested against the actual reference
implementation rather than re-derived formulas.

Run once where the reference checkout exists:
    python tools/gen_geometry_fixtures.py
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference/utils/run_nerf_raybased_helpers.py"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "tests", "fixtures", "geometry_golden.npz")


def load_ref():
    import torch
    src = open(REF).read()
    # the module hardcodes .cuda()/'cuda' in a few spots and imports the
    # args singleton lazily — none of the functions we call need it.
    src = src.replace(".cuda()", ".cpu()").replace("'cuda'", "'cpu'")
    src = src.replace("torch.autograd.set_detect_anomaly(True)", "pass")
    mod = types.ModuleType("ref_helpers")
    mod.__file__ = REF
    sys.modules.setdefault("ref_helpers", mod)
    exec(compile(src, REF, "exec"), mod.__dict__)
    return mod


def main():
    import torch
    ref = load_ref()
    rng = np.random.default_rng(7)

    H, W, focal = 12, 16, 20.0
    c2w = np.array([[0.6, -0.4, 0.69, 1.2],
                    [0.64, 0.6, -0.2, -0.5],
                    [-0.3, 0.69, 0.65, 3.1]], np.float32)
    ro, rd = ref.get_rays(H, W, focal, torch.from_numpy(c2w))
    ro2, rd2 = ref.get_rays(H, W, focal, torch.from_numpy(c2w),
                            focal_scale=1.7)
    ndc_o, ndc_d = ref.ndc_rays(H, W, focal, 1.0, ro.reshape(-1, 3),
                                rd.reshape(-1, 3))

    # sample_pdf: deterministic (det=True) inverse-CDF resampling
    bins = np.sort(rng.uniform(2.0, 6.0, (5, 9)).astype(np.float32), axis=1)
    weights = rng.uniform(0.0, 1.0, (5, 8)).astype(np.float32)
    z_samp = ref.sample_pdf(torch.from_numpy(bins),
                            torch.from_numpy(weights), 7, det=True)

    # raw2outputs: no noise, white bkgd on/off
    n_ray, n_s = 6, 10
    raw = rng.normal(0, 1.5, (n_ray, n_s, 4)).astype(np.float32)
    z_vals = np.sort(rng.uniform(2.0, 6.0, (n_ray, n_s)).astype(np.float32),
                     axis=1)
    rays_d = rng.normal(0, 1, (n_ray, 3)).astype(np.float32)
    outs = {}
    for wb in (False, True):
        rgb, disp, acc, w8, depth = ref.raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z_vals),
            torch.from_numpy(rays_d), raw_noise_std=0.0, white_bkgd=wb)
        tag = "wb" if wb else "bb"
        outs[f"rgb_{tag}"] = rgb.numpy()
        outs[f"disp_{tag}"] = disp.numpy()
        outs[f"acc_{tag}"] = acc.numpy()
        outs[f"weights_{tag}"] = w8.numpy()
        outs[f"depth_{tag}"] = depth.numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT,
             c2w=c2w, H=H, W=W, focal=focal,
             rays_o=ro.numpy(), rays_d=rd.numpy(),
             rays_o_fs=ro2.numpy(), rays_d_fs=rd2.numpy(),
             ndc_o=ndc_o.numpy(), ndc_d=ndc_d.numpy(),
             pdf_bins=bins, pdf_weights=weights, pdf_samples=z_samp.numpy(),
             raw=raw, z_vals=z_vals, r2o_rays_d=rays_d, **outs)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
