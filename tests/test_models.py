import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.models import (NeRFConfig, R2LConfig, apply_nerf, apply_r2l,
                            init_nerf, init_r2l, r2l_num_blocks)


def _np_relu(x):
    return np.maximum(x, 0.0)


def _golden_r2l(params, cfg, x):
    """Independent numpy forward of the canonical resmlp architecture."""
    p = jax.tree.map(np.asarray, params)
    h = _np_relu(x @ p["head"]["w"] + p["head"]["b"])
    body = h
    for i in range(cfg.num_blocks):
        hin = body
        t = hin @ p["body"]["w"][i, 0] + p["body"]["b"][i, 0]
        t = _np_relu(t)
        t = t @ p["body"]["w"][i, 1] + p["body"]["b"][i, 1]
        body = t * cfg.res_scale + hin
    h = body + h if cfg.use_residual else body
    out = h @ p["tail"]["w"] + p["tail"]["b"]
    return 1.0 / (1.0 + np.exp(-out))


def test_r2l_num_blocks_canonical():
    assert r2l_num_blocks(88) == 43
    assert r2l_num_blocks(88, 10) == 10


def test_r2l_forward_matches_golden(key, rng):
    cfg = R2LConfig(input_dim=24, netwidth=32, netdepth=10, use_residual=True)
    params = init_r2l(key, cfg)
    x = rng.normal(size=(8, 24)).astype(np.float32)
    y = apply_r2l(params, cfg, jnp.asarray(x))
    g = _golden_r2l(params, cfg, x)
    np.testing.assert_allclose(np.asarray(y), g, rtol=1e-4, atol=1e-6)


def test_r2l_output_range_sigmoid(key):
    cfg = R2LConfig(input_dim=12, netwidth=16, netdepth=6)
    params = init_r2l(key, cfg)
    y = np.asarray(apply_r2l(params, cfg, jnp.ones((4, 12)) * 10))
    assert (y > 0).all() and (y < 1).all()


def test_r2l_linear_tail(key):
    cfg = R2LConfig(input_dim=12, netwidth=16, netdepth=6, linear_tail=True)
    params = init_r2l(key, cfg)
    y = apply_r2l(params, cfg, jnp.ones((4, 12)))
    assert y.shape == (4, 3)


def test_r2l_mlp_body(key):
    cfg = R2LConfig(input_dim=12, netwidth=16, netdepth=6, body_arch="mlp",
                    use_residual=False)
    params = init_r2l(key, cfg)
    assert len(params["body"]) == 4
    y = apply_r2l(params, cfg, jnp.ones((4, 12)))
    assert y.shape == (4, 3)


def test_r2l_canonical_param_count(key):
    # W256 D88: head 1008->256, 43 blocks x 2 x 256x256, tail 256->3.
    cfg = R2LConfig()
    params = init_r2l(key, cfg)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    expect = (1008 * 256 + 256) + 43 * 2 * (256 * 256 + 256) + (256 * 3 + 3)
    assert n == expect
    # ~23.7 MB at float32 (BASELINE.md storage row).
    assert abs(n * 4 / 1e6 - 23.7) < 0.4


def test_r2l_grad_flows(key):
    cfg = R2LConfig(input_dim=12, netwidth=16, netdepth=6)
    params = init_r2l(key, cfg)

    def loss(p):
        return jnp.mean(apply_r2l(p, cfg, jnp.ones((4, 12))) ** 2)

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_nerf_forward_shapes(key):
    cfg = NeRFConfig()
    params = init_nerf(key, cfg)
    x = jnp.ones((10, 63 + 27))
    y = apply_nerf(params, cfg, x)
    assert y.shape == (10, 4)


def test_nerf_skip_connection_shapes(key):
    cfg = NeRFConfig(D=8, W=256, skips=(4,))
    params = init_nerf(key, cfg)
    # layer 5 input is W + input_ch due to the skip concat after layer 4.
    assert params["pts_linears"][5]["w"].shape == (256 + 63, 256)


def test_nerf_no_viewdirs(key):
    cfg = NeRFConfig(use_viewdirs=False, input_ch=63, input_ch_views=0)
    params = init_nerf(key, cfg)
    y = apply_nerf(params, cfg, jnp.ones((5, 63)))
    assert y.shape == (5, 4)


def test_nerf_golden_tiny(key):
    """1-layer NeRF vs hand-computed numpy."""
    cfg = NeRFConfig(D=1, W=4, input_ch=3, input_ch_views=0, skips=(),
                     use_viewdirs=False)
    params = init_nerf(key, cfg)
    x = np.array([[0.1, 0.2, 0.3]], dtype=np.float32)
    y = apply_nerf(params, cfg, jnp.asarray(x))
    p = jax.tree.map(np.asarray, params)
    h = _np_relu(x @ p["pts_linears"][0]["w"] + p["pts_linears"][0]["b"])
    g = h @ p["output_linear"]["w"] + p["output_linear"]["b"]
    np.testing.assert_allclose(np.asarray(y), g, rtol=1e-5, atol=1e-7)


def test_r2l_layerwise_netwidths(key):
    """--layerwise_netwidths: per-layer plain-MLP body widths (reference
    `model/nerf_raybased.py:489-505`: head -> Ws[0], body Linear(Ws[i-1],
    Ws[i]) for i in 1..D-2, tail from Ws[D-2])."""
    widths = (32, 16, 48, 24)  # D-1 = 4 entries for D = 5
    cfg = R2LConfig(input_dim=12, netdepth=5, netwidth=64,
                    body_arch="mlp", use_residual=False,
                    layerwise_widths=widths)
    params = init_r2l(key, cfg)
    assert params["head"]["w"].shape == (12, 32)
    assert [tuple(l["w"].shape) for l in params["body"]] == [
        (32, 16), (16, 48), (48, 24)]
    assert params["tail"]["w"].shape == (24, 3)
    y = apply_r2l(params, cfg, jnp.ones((7, 12)))
    assert y.shape == (7, 3)

    # numerics vs numpy
    x = np.linspace(-1, 1, 12, dtype=np.float32)[None]
    p = jax.tree.map(np.asarray, params)
    h = _np_relu(x @ p["head"]["w"] + p["head"]["b"])
    for l in p["body"]:
        h = _np_relu(h @ l["w"] + l["b"])
    g = 1 / (1 + np.exp(-(h @ p["tail"]["w"] + p["tail"]["b"])))
    got = apply_r2l(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), g, rtol=1e-5, atol=1e-6)


def test_r2l_layerwise_too_short_raises(key):
    cfg = R2LConfig(input_dim=12, netdepth=5, body_arch="mlp",
                    layerwise_widths=(32, 16))
    try:
        init_r2l(key, cfg)
    except ValueError as e:
        assert "layerwise" in str(e)
    else:
        raise AssertionError("expected ValueError")
