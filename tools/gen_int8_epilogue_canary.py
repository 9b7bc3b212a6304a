"""Freeze the int8 fold_requant+nobf16_inner epilogue output (headline
canary, r4 verdict Next #7).

The deployed fast path (`evaluate._r2l_net_fn` kind='int8') runs
``fused_r2l_apply_int8_pe(..., fold_requant=True, nobf16_inner=True)``
— the measured epilogue winner (exp/probe_epi2.jsonl: 9.73 ms/frame vs
10.3 baseline at 400² on v5e). Two measured-NEGATIVE "simplifications"
(relu-as-clip, f32-inner requant) produce numerically DIFFERENT outputs,
so a frozen bit-level fixture catches any well-meaning epilogue rewrite
before it silently costs the headline.

Run on CPU (interpret mode — deterministic in this image):
    python tools/gen_int8_epilogue_canary.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "tests", "fixtures", "int8_epilogue_canary.npz")


def build_case():
    """Deterministic tiny-but-representative case: 3 resmlp blocks so the
    within-block (j>0 fold path) AND cross-block epilogues both run."""
    from r2l_tpu.models import R2LConfig, init_r2l
    from r2l_tpu.rays import pose_spherical
    from r2l_tpu.sampler import PointSampler
    cfg = R2LConfig(input_dim=6 * (2 * 4 + 1), netdepth=8, netwidth=64,
                    use_residual=True, body_arch="resmlp")
    params = init_r2l(jax.random.key(0), cfg)
    sampler = PointSampler(H=8, W=8, focal=10.0, n_sample=2,
                           near=2.0, far=6.0)
    calib = jnp.concatenate([
        sampler.sample_test(jnp.asarray(np.asarray(
            pose_spherical(t, p, 4.0)[:3, :4])))
        for t in (0.0, 120.0, 240.0) for p in (-10.0, -60.0)])
    pts = sampler.sample_test(jnp.asarray(np.asarray(
        pose_spherical(75.0, -30.0, 4.0)[:3, :4])))
    return cfg, params, calib, pts


def main():
    from r2l_tpu.kernels.r2l_pallas import (calibrate_r2l_int8_pe,
                                            fused_r2l_apply_int8_pe)
    cfg, params, calib, pts = build_case()
    fp = calibrate_r2l_int8_pe(params, cfg, dim_pts=6, L=4,
                               calib_pts=calib, fold_requant=True)
    out = fused_r2l_apply_int8_pe(fp, cfg, pts, dim_pts=6, L=4, tile=32,
                                  fold_requant=True, nobf16_inner=True,
                                  interpret=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, rgb=np.asarray(out, np.float32))
    print("canary rgb[:2]:", np.asarray(out)[:2])
    print("wrote", OUT)


if __name__ == "__main__":
    main()
