"""Golden-parity tests vs the ACTUAL reference torch implementation.

Fixtures frozen from `/root/reference/utils/run_nerf_raybased_helpers.py`
run on CPU (tools/gen_geometry_fixtures.py): get_rays (incl. focal_scale),
ndc_rays, deterministic sample_pdf, and raw2outputs (both backgrounds) —
bitwise-level agreement, not just formula re-derivation.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from r2l_tpu.rays import get_rays, ndc_rays
from r2l_tpu.volume import raw2outputs, sample_pdf

FX = os.path.join(os.path.dirname(__file__), "fixtures",
                  "geometry_golden.npz")


@pytest.fixture(scope="module")
def fx():
    return np.load(FX)


def test_get_rays_golden(fx):
    ro, rd = get_rays(int(fx["H"]), int(fx["W"]), float(fx["focal"]),
                      jnp.asarray(fx["c2w"]))
    np.testing.assert_allclose(np.asarray(ro), fx["rays_o"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), fx["rays_d"],
                               rtol=1e-5, atol=1e-6)


def test_get_rays_focal_scale_golden(fx):
    ro, rd = get_rays(int(fx["H"]), int(fx["W"]), float(fx["focal"]),
                      jnp.asarray(fx["c2w"]), focal_scale=1.7)
    np.testing.assert_allclose(np.asarray(rd), fx["rays_d_fs"],
                               rtol=1e-5, atol=1e-6)


def test_ndc_rays_golden(fx):
    ro, rd = ndc_rays(int(fx["H"]), int(fx["W"]), float(fx["focal"]), 1.0,
                      jnp.asarray(fx["rays_o"]).reshape(-1, 3),
                      jnp.asarray(fx["rays_d"]).reshape(-1, 3))
    np.testing.assert_allclose(np.asarray(ro), fx["ndc_o"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), fx["ndc_d"],
                               rtol=1e-5, atol=1e-5)


def test_sample_pdf_det_golden(fx):
    z = sample_pdf(None, jnp.asarray(fx["pdf_bins"]),
                   jnp.asarray(fx["pdf_weights"]), 7, det=True)
    np.testing.assert_allclose(np.asarray(z), fx["pdf_samples"],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tag,wb", [("bb", False), ("wb", True)])
def test_raw2outputs_golden(fx, tag, wb):
    out = raw2outputs(jnp.asarray(fx["raw"]), jnp.asarray(fx["z_vals"]),
                      jnp.asarray(fx["r2o_rays_d"]), raw_noise_std=0.0,
                      white_bkgd=wb)
    np.testing.assert_allclose(np.asarray(out.rgb_map), fx[f"rgb_{tag}"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.weights),
                               fx[f"weights_{tag}"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.disp_map), fx[f"disp_{tag}"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc_map), fx[f"acc_{tag}"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth_map),
                               fx[f"depth_{tag}"], rtol=1e-4, atol=1e-5)
