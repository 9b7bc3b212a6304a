import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r2l_tpu import checkpoint as ckpt
from r2l_tpu.models import (NeRFConfig, R2LConfig, apply_nerf, apply_r2l,
                            init_nerf, init_r2l)


def test_save_load_roundtrip(tmp_path, key):
    cfg = R2LConfig(input_dim=12, netwidth=16, netdepth=6)
    params = init_r2l(key, cfg)
    path = str(tmp_path / "ck.msgpack")
    ckpt.save_checkpoint(path, params, meta={"global_step": 7})
    loaded, meta = ckpt.load_checkpoint(path, target=params)
    assert meta["global_step"] == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_r2l_torch_roundtrip(key):
    cfg = R2LConfig(input_dim=12, netwidth=16, netdepth=6)
    params = init_r2l(key, cfg)
    sd = ckpt.params_to_torch_r2l(params, cfg)
    assert "head.0.weight" in sd and "tail.0.weight" in sd
    assert sd["head.0.weight"].shape == (16, 12)  # torch [out, in]
    back = ckpt.torch_r2l_to_params(sd, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)


def test_r2l_module_prefix_stripped(key):
    cfg = R2LConfig(input_dim=12, netwidth=16, netdepth=6)
    params = init_r2l(key, cfg)
    sd = {"module." + k: v for k, v in
          ckpt.params_to_torch_r2l(params, cfg).items()}
    back = ckpt.torch_r2l_to_params(sd, cfg)
    np.testing.assert_allclose(np.asarray(back["head"]["w"]),
                               np.asarray(params["head"]["w"]))


def test_infer_r2l_config(key):
    cfg = R2LConfig(input_dim=24, netwidth=32, netdepth=10)
    sd = ckpt.params_to_torch_r2l(init_r2l(key, cfg), cfg)
    inferred = ckpt.infer_r2l_config_from_state_dict(sd)
    assert inferred.input_dim == 24
    assert inferred.netwidth == 32
    assert inferred.num_blocks == cfg.num_blocks
    assert not inferred.linear_tail


def test_torch_forward_parity(key):
    """Real torch forward of the reference architecture vs apply_r2l."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    cfg = R2LConfig(input_dim=24, netwidth=32, netdepth=10)
    params = init_r2l(key, cfg)
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in ckpt.params_to_torch_r2l(params, cfg).items()}

    # Independent torch construction of the same architecture (from the
    # published R2L spec: head Linear+ReLU, ResMLP blocks, tail
    # Linear+Sigmoid, global residual).
    class Block(nn.Module):
        def __init__(self, w):
            super().__init__()
            self.body = nn.Sequential(nn.Linear(w, w), nn.ReLU(),
                                      nn.Linear(w, w))

        def forward(self, x):
            return self.body(x) + x

    class Net(nn.Module):
        def __init__(self, din, w, nb):
            super().__init__()
            self.head = nn.Sequential(nn.Linear(din, w), nn.ReLU())
            self.body = nn.Sequential(*[Block(w) for _ in range(nb)])
            self.tail = nn.Sequential(nn.Linear(w, 3), nn.Sigmoid())

        def forward(self, x):
            x = self.head(x)
            return self.tail(self.body(x) + x)

    net = Net(24, 32, cfg.num_blocks)
    net.load_state_dict(sd)
    x = np.random.default_rng(1).normal(size=(16, 24)).astype(np.float32)
    with torch.no_grad():
        yt = net(torch.from_numpy(x)).numpy()
    yj = np.asarray(apply_r2l(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(yj, yt, rtol=1e-4, atol=1e-5)


def test_nerf_torch_forward_parity(key):
    """Real torch forward of the classic NeRF MLP (skip concat + view
    branch) vs apply_nerf — the teacher-checkpoint conversion contract."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F

    cfg = NeRFConfig(D=4, W=32, input_ch=9, input_ch_views=6, skips=(2,),
                     use_viewdirs=True)
    params = init_nerf(key, cfg)

    class NeRFTorch(nn.Module):
        # Independent construction of the published NeRF architecture.
        def __init__(self, D, W, in_ch=9, in_views=6, skips=(2,)):
            super().__init__()
            self.skips = skips
            self.pts_linears = nn.ModuleList(
                [nn.Linear(in_ch, W)]
                + [nn.Linear(W + in_ch if i in skips else W, W)
                   for i in range(D - 1)])
            self.views_linears = nn.ModuleList(
                [nn.Linear(in_views + W, W // 2)])
            self.feature_linear = nn.Linear(W, W)
            self.alpha_linear = nn.Linear(W, 1)
            self.rgb_linear = nn.Linear(W // 2, 3)

        def forward(self, x):
            pts, views = x[..., :9], x[..., 9:15]
            h = pts
            for i, l in enumerate(self.pts_linears):
                h = F.relu(l(h))
                if i in self.skips:
                    h = torch.cat([pts, h], -1)
            alpha = self.alpha_linear(h)
            feat = self.feature_linear(h)
            h = torch.cat([feat, views], -1)
            for l in self.views_linears:
                h = F.relu(l(h))
            return torch.cat([self.rgb_linear(h), alpha], -1)

    net = NeRFTorch(cfg.D, cfg.W)
    sd = {}
    for i, layer in enumerate(params["pts_linears"]):
        sd[f"pts_linears.{i}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(layer["w"]).T))
        sd[f"pts_linears.{i}.bias"] = torch.from_numpy(
            np.asarray(layer["b"]))
    for name in ["feature_linear", "alpha_linear", "rgb_linear"]:
        sd[f"{name}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(params[name]["w"]).T))
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(params[name]["b"]))
    sd["views_linears.0.weight"] = torch.from_numpy(
        np.ascontiguousarray(np.asarray(params["views_linears"][0]["w"]).T))
    sd["views_linears.0.bias"] = torch.from_numpy(
        np.asarray(params["views_linears"][0]["b"]))
    net.load_state_dict(sd)

    x = np.random.default_rng(2).normal(size=(8, 15)).astype(np.float32)
    with torch.no_grad():
        yt = net(torch.from_numpy(x)).numpy()
    yj = np.asarray(apply_nerf(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(yj, yt, rtol=1e-4, atol=1e-5)


def test_r2l_canonical_size_roundtrip(key):
    """Full canonical W=256 D=88 conversion roundtrip (released-ckpt
    shape) + forward equality after roundtrip."""
    cfg = R2LConfig()  # 1008 -> 256 x 43 blocks -> 3
    params = init_r2l(key, cfg)
    sd = ckpt.params_to_torch_r2l(params, cfg)
    assert len([k for k in sd if k.startswith("body.")]) == 43 * 2 * 2
    inferred = ckpt.infer_r2l_config_from_state_dict(sd)
    assert (inferred.input_dim, inferred.netwidth, inferred.num_blocks) == \
        (1008, 256, 43)
    back = ckpt.torch_r2l_to_params(sd, inferred)
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(4, 1008)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(apply_r2l(back, inferred, x)),
                               np.asarray(apply_r2l(params, cfg, x)),
                               rtol=1e-6, atol=1e-7)


def test_nerf_torch_conversion(key):
    cfg = NeRFConfig(D=2, W=16, input_ch=9, input_ch_views=6, skips=())
    params = init_nerf(key, cfg)
    # Fabricate a torch-style state_dict from our params (torch layout).
    sd = {}
    for i, layer in enumerate(params["pts_linears"]):
        sd[f"pts_linears.{i}.weight"] = np.asarray(layer["w"]).T
        sd[f"pts_linears.{i}.bias"] = np.asarray(layer["b"])
    for name in ["feature_linear", "alpha_linear", "rgb_linear"]:
        sd[f"{name}.weight"] = np.asarray(params[name]["w"]).T
        sd[f"{name}.bias"] = np.asarray(params[name]["b"])
    sd["views_linears.0.weight"] = np.asarray(params["views_linears"][0]["w"]).T
    sd["views_linears.0.bias"] = np.asarray(params["views_linears"][0]["b"])

    back = ckpt.torch_nerf_to_params(sd, cfg)
    x = jnp.ones((3, 15))
    np.testing.assert_allclose(np.asarray(apply_nerf(back, cfg, x)),
                               np.asarray(apply_nerf(params, cfg, x)),
                               rtol=1e-6)


def test_r2l_mlp_body_torch_roundtrip_and_parity(key):
    """Plain-MLP-body (trial.body_arch=mlp) torch checkpoints convert
    both ways (Sequential ``body.<even>`` naming, reference
    `model/nerf_raybased.py:525-528`) and match a real torch forward —
    previously infer crashed in np.stack([]) on this naming."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    cfg = R2LConfig(input_dim=24, netwidth=32, netdepth=6,
                    body_arch="mlp", precision="highest")
    params = init_r2l(key, cfg)
    sd_np = ckpt.params_to_torch_r2l(params, cfg)
    assert "body.0.weight" in sd_np and "body.6.weight" in sd_np

    # config inference picks up the mlp arch from the flat naming
    inferred = ckpt.infer_r2l_config_from_state_dict(sd_np)
    assert inferred.body_arch == "mlp"
    assert inferred.netdepth == 6 and inferred.netwidth == 32

    back = ckpt.torch_r2l_to_params(sd_np, inferred)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # torch forward of the reference mlp-body architecture
    class Net(nn.Module):
        def __init__(self, din, w, d):
            super().__init__()
            self.head = nn.Sequential(nn.Linear(din, w), nn.ReLU())
            body = []
            for _ in range(1, d - 1):
                body += [nn.Linear(w, w), nn.ReLU()]
            self.body = nn.Sequential(*body)
            self.tail = nn.Sequential(nn.Linear(w, 3), nn.Sigmoid())

        def forward(self, x):
            x = self.head(x)
            return self.tail(self.body(x) + x)

    net = Net(24, 32, 6)
    net.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd_np.items()})
    x = np.random.default_rng(1).normal(size=(16, 24)).astype(np.float32)
    with torch.no_grad():
        yt = net(torch.from_numpy(x)).numpy()
    yj = np.asarray(apply_r2l(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(yj, yt, rtol=1e-4, atol=1e-5)


def test_infer_r2l_config_from_params_mlp_body(key):
    cfg = R2LConfig(input_dim=24, netwidth=32, netdepth=6,
                    body_arch="mlp")
    params = init_r2l(key, cfg)
    inferred = ckpt.infer_r2l_config_from_params(params)
    assert inferred.body_arch == "mlp"
    assert inferred.netdepth == 6 and inferred.netwidth == 32


def test_keras_nerf_to_params_matches_torch_layout():
    """keras_nerf_to_params (reference NeRF.load_weights_from_keras,
    nerf_raybased.py:403-440): the flat Keras list [w,b]*(D pts_linears),
    feature, views, rgb, alpha — Keras weights are [in, out], no
    transpose. Cross-checked against torch_nerf_to_params fed the same
    tensors under the reference's state_dict naming ([out, in])."""
    from r2l_tpu.checkpoint import keras_nerf_to_params, torch_nerf_to_params
    from r2l_tpu.models.nerf import NeRFConfig, init_nerf

    cfg = NeRFConfig(D=4, W=16, skips=(2,), use_viewdirs=True,
                     input_ch=9, input_ch_views=6, output_ch=5)
    ref = init_nerf(jax.random.key(0), cfg)
    host = jax.tree.map(np.asarray, ref)

    flat = []
    for lin in host["pts_linears"]:
        flat += [lin["w"], lin["b"]]
    flat += [host["feature_linear"]["w"], host["feature_linear"]["b"]]
    flat += [host["views_linears"][0]["w"], host["views_linears"][0]["b"]]
    flat += [host["rgb_linear"]["w"], host["rgb_linear"]["b"]]
    flat += [host["alpha_linear"]["w"], host["alpha_linear"]["b"]]

    got = keras_nerf_to_params(flat, cfg)

    sd = {}
    for i, lin in enumerate(host["pts_linears"]):
        sd[f"pts_linears.{i}.weight"] = lin["w"].T
        sd[f"pts_linears.{i}.bias"] = lin["b"]
    sd["views_linears.0.weight"] = host["views_linears"][0]["w"].T
    sd["views_linears.0.bias"] = host["views_linears"][0]["b"]
    for name in ("feature_linear", "alpha_linear", "rgb_linear"):
        sd[name + ".weight"] = host[name]["w"].T
        sd[name + ".bias"] = host[name]["b"]
    via_torch = torch_nerf_to_params(sd, cfg)

    jax.tree.map(np.testing.assert_array_equal, got, via_torch)
    # no-viewdirs is a hard error, as in the reference (:404)
    with pytest.raises(ValueError, match="use_viewdirs"):
        keras_nerf_to_params(flat, NeRFConfig(
            D=4, W=16, skips=(2,), use_viewdirs=False,
            input_ch=9, input_ch_views=0, output_ch=4))
