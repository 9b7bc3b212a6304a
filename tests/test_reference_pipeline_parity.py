"""END-TO-END parity vs the reference's OWN torch code at canonical size.

Runs `/root/reference/model/nerf_raybased.py` (imported as-is; it
auto-selects CPU without CUDA): pose -> PointSampler.sample_test ->
PositionalEmbedder -> NeRF_v3_2(W=256, D=88) with weights converted FROM
this framework's pytree, and asserts our full pipeline (sampler, embed,
apply_r2l, and both fused Pallas kernels in interpret mode) reproduces it.
This is the strongest offline proxy for released-checkpoint PSNR parity
(the real lego.tar is not downloadable in this image).

Skipped when the reference checkout is absent.
"""
import os
import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/model"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_mod():
    torch = pytest.importorskip("torch")  # noqa: F841
    sys.path.insert(0, REF)
    import nerf_raybased
    yield nerf_raybased
    sys.path.remove(REF)


@pytest.fixture(scope="module")
def canonical():
    from r2l_tpu import checkpoint as ckpt
    from r2l_tpu.models import R2LConfig, init_r2l
    cfg = R2LConfig()  # canonical: input 1008, W=256, D=88, resmlp
    params = init_r2l(jax.random.key(7), cfg)
    sd = ckpt.params_to_torch_r2l(params, cfg)
    return cfg, params, sd


def _ref_args():
    trial = SimpleNamespace(ON=True, body_arch="resmlp", res_scale=1.0,
                            n_learnable=2, inact="relu", outact="none",
                            n_block=-1)
    return SimpleNamespace(netdepth=88, netwidth=256,
                           layerwise_netwidths="", act="relu",
                           use_residual=True, linear_tail=False,
                           trial=trial)


def test_canonical_pipeline_matches_reference(ref_mod, canonical):
    import torch
    cfg, params, sd = canonical
    H, W, focal = 10, 12, 13.5

    net = ref_mod.NeRF_v3_2(_ref_args(), input_dim=1008, output_dim=3)
    net.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()})
    net.eval()
    ps = ref_mod.PointSampler(H, W, focal, n_sample=16, near=2.0, far=6.0)
    emb = ref_mod.PositionalEmbedder(L=10)

    c2w_np = np.array([[0.6, -0.4, 0.69, 1.2],
                       [0.64, 0.6, -0.2, -0.5],
                       [-0.3, 0.69, 0.65, 3.1]], np.float32)
    with torch.no_grad():
        pts_t = ps.sample_test(torch.from_numpy(c2w_np))
        rgb_t = net(emb(pts_t)).numpy()

    # ours: sampler -> embed -> apply_r2l
    from r2l_tpu.encoding import r2l_embed
    from r2l_tpu.models import apply_r2l
    from r2l_tpu.sampler import PointSampler
    sampler = PointSampler(H=H, W=W, focal=focal, n_sample=16,
                           near=2.0, far=6.0)
    pts = sampler.sample_test(jnp.asarray(c2w_np))
    np.testing.assert_allclose(np.asarray(pts), pts_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    x = r2l_embed(pts, 10)
    # sin/cos at the top frequency (2^9) amplify the ~1e-6 f32 point
    # differences by ~512 -> a few e-4 phase error is inherent
    np.testing.assert_allclose(np.asarray(x), emb(pts_t).numpy(),
                               rtol=1e-3, atol=2e-3)
    rgb = apply_r2l(params, cfg, x)
    np.testing.assert_allclose(np.asarray(rgb), rgb_t,
                               rtol=1e-3, atol=1e-3)

    # fused bf16 PE kernel (f32 weights, interpret)
    from r2l_tpu.kernels.r2l_pallas import (fused_r2l_apply_pe,
                                            prepare_fused_params_pe)
    fp = prepare_fused_params_pe(params, cfg, dim_pts=48, L=10,
                                 weight_dtype=jnp.float32)
    rgb_k = fused_r2l_apply_pe(fp, cfg, pts, 48, 10, tile=40,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_k), rgb_t,
                               rtol=2e-3, atol=2e-3)

    # int8 static-scale kernel: within quantization error of the torch ref
    from r2l_tpu.kernels.r2l_pallas import (calibrate_r2l_int8_pe,
                                            fused_r2l_apply_int8_pe)
    fq = calibrate_r2l_int8_pe(params, cfg, dim_pts=48, L=10,
                               calib_pts=pts)
    rgb_q = fused_r2l_apply_int8_pe(fq, cfg, pts, 48, 10, tile=40,
                                    interpret=True)
    d = np.abs(np.asarray(rgb_q) - rgb_t)
    # random-init canonical nets are the worst case for the static scales
    # (activations random-walk across 43 blocks); the e2e TRAINED-model
    # delta measured +0.006 dB PSNR (verify recipe step 9). RMS 6e-3
    # corresponds to >44 dB agreement with the torch f32 pipeline.
    assert d.max() < 2.5e-2 and np.sqrt((d ** 2).mean()) < 6e-3


def test_canonical_teacher_matches_reference(ref_mod, canonical):
    """Reference NeRF teacher forward vs apply_nerf with converted
    weights (canonical D=8/W=256, skip at 4, viewdirs)."""
    import torch
    from r2l_tpu import checkpoint as ckpt
    from r2l_tpu.encoding import nerf_embed_dim
    from r2l_tpu.models.nerf import NeRFConfig, apply_nerf, init_nerf

    ncfg = NeRFConfig(D=8, W=256, input_ch=nerf_embed_dim(3, 10),
                      input_ch_views=nerf_embed_dim(3, 4), output_ch=5,
                      skips=(4,), use_viewdirs=True)
    pc = init_nerf(jax.random.key(3), ncfg)
    host = jax.tree.map(np.asarray, pc)
    sd = {}
    for i, lay in enumerate(host["pts_linears"]):
        sd[f"pts_linears.{i}.weight"] = lay["w"].T
        sd[f"pts_linears.{i}.bias"] = lay["b"]
    sd["views_linears.0.weight"] = host["views_linears"][0]["w"].T
    sd["views_linears.0.bias"] = host["views_linears"][0]["b"]
    for name in ("feature_linear", "alpha_linear", "rgb_linear"):
        sd[f"{name}.weight"] = host[name]["w"].T
        sd[f"{name}.bias"] = host[name]["b"]
    net = ref_mod.NeRF(D=8, W=256, input_ch=63, input_ch_views=27,
                       output_ch=5, skips=[4], use_viewdirs=True)
    net.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()})
    net.eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 63 + 27)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = apply_nerf(pc, ncfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
