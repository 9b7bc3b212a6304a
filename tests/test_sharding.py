"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from r2l_tpu.models import R2LConfig, apply_r2l, init_r2l
from r2l_tpu.parallel import (batch_sharding, make_mesh, r2l_param_shardings,
                              replicated_sharding, shard_pytree)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.axis_names == ("data",) and m.devices.size == 8
    m2 = make_mesh({"data": 4, "model": 2})
    assert m2.shape == {"data": 4, "model": 2}
    m3 = make_mesh({"data": -1, "model": 2})
    assert m3.shape["data"] == 4


def test_data_parallel_forward_matches_single(key):
    cfg = R2LConfig(input_dim=24, netwidth=32, netdepth=6)
    params = init_r2l(key, cfg)
    x = jax.random.normal(jax.random.key(1), (64, 24))
    ref = apply_r2l(params, cfg, x)

    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    ps = shard_pytree(params, r2l_param_shardings(mesh, params))
    out = jax.jit(lambda p, v: apply_r2l(p, cfg, v))(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_tensor_parallel_forward_matches_single(key):
    cfg = R2LConfig(input_dim=24, netwidth=32, netdepth=6)
    params = init_r2l(key, cfg)
    x = jax.random.normal(jax.random.key(1), (16, 24))
    ref = apply_r2l(params, cfg, x)

    mesh = make_mesh({"data": 4, "model": 2})
    shardings = r2l_param_shardings(mesh, params)
    # body w must actually be sharded on the width axis.
    body_spec = shardings["body"]["w"].spec
    assert body_spec == P(None, None, None, "model")
    ps = shard_pytree(params, shardings)
    xs = jax.device_put(x, batch_sharding(mesh))
    out = jax.jit(lambda p, v: apply_r2l(p, cfg, v))(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_data_parallel_grads_match_single(key):
    cfg = R2LConfig(input_dim=12, netwidth=16, netdepth=4)
    params = init_r2l(key, cfg)
    x = jax.random.normal(jax.random.key(2), (32, 12))
    y = jax.random.uniform(jax.random.key(3), (32, 3))

    def loss(p, xx, yy):
        return jnp.mean((apply_r2l(p, cfg, xx) - yy) ** 2)

    g_ref = jax.grad(loss)(params, x, y)

    mesh = make_mesh()
    ps = shard_pytree(params, r2l_param_shardings(mesh, params))
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    g = jax.jit(jax.grad(loss))(ps, xs, ys)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # Gradients must come back replicated (XLA psum over 'data').
    assert g["head"]["w"].sharding.is_fully_replicated


def test_batch_sharding_places_shards():
    mesh = make_mesh()
    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (2, 1)
    r = jax.device_put(x, replicated_sharding(mesh))
    assert r.sharding.is_fully_replicated
