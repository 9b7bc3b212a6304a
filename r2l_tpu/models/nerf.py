"""NeRF teacher MLP (classic 8x256 with skip concat + view branch).

Functional JAX re-implementation of the reference ``NeRF``
(`/root/reference/model/nerf_raybased.py:337-401`): D linears with ReLU,
input re-concatenated after layers in ``skips``; with viewdirs a sigma head
(``alpha_linear``), feature linear, one W/2 view layer, RGB head.

The teacher is small (D=8) so layers stay an explicit pytree list —
simple, and weight shapes differ at skip layers anyway.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    D: int = 8
    W: int = 256
    input_ch: int = 63          # nerf_embed(3, L=10)
    input_ch_views: int = 27    # nerf_embed(3, L=4)
    output_ch: int = 4
    skips: tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    precision: str = "high"  # matmul precision (f32 operands): 3-pass
    #                          near-f32; "highest" is ~2x slower again
    #                          on TPU MXUs. Matches the CLI default.
    compute_dtype: Any = jnp.float32  # bf16 halves HBM traffic (2x frame
    #                                   rate on v5e); raw outputs stay f32


def _linear_init(key: jax.Array, fan_in: int, fan_out: int):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_nerf(key: jax.Array, cfg: NeRFConfig) -> dict:
    keys = iter(jax.random.split(key, cfg.D + 8))
    pts = [_linear_init(next(keys), cfg.input_ch, cfg.W)]
    for i in range(cfg.D - 1):
        fan_in = cfg.W + cfg.input_ch if i in cfg.skips else cfg.W
        pts.append(_linear_init(next(keys), fan_in, cfg.W))
    params: dict = {"pts_linears": pts}
    if cfg.use_viewdirs:
        params["views_linears"] = [
            _linear_init(next(keys), cfg.input_ch_views + cfg.W, cfg.W // 2)]
        params["feature_linear"] = _linear_init(next(keys), cfg.W, cfg.W)
        params["alpha_linear"] = _linear_init(next(keys), cfg.W, 1)
        params["rgb_linear"] = _linear_init(next(keys), cfg.W // 2, 3)
    else:
        params["output_linear"] = _linear_init(next(keys), cfg.W, cfg.output_ch)
    return params


def _linear(h: Array, p: dict, cfg: NeRFConfig) -> Array:
    cd = cfg.compute_dtype
    out = jnp.dot(h.astype(cd), p["w"].astype(cd),
                  preferred_element_type=jnp.float32,
                  precision=cfg.precision)
    return (out + p["b"]).astype(cd)


def apply_nerf(params: dict, cfg: NeRFConfig, x: Array) -> Array:
    """x: [..., input_ch (+ input_ch_views)] -> [..., 4] (rgb logits, sigma).

    Activations run in ``cfg.compute_dtype``; the raw output is upcast to
    f32 for the compositing math.
    """
    input_pts = x[..., :cfg.input_ch].astype(cfg.compute_dtype)
    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(_linear(h, layer, cfg))
        if i in cfg.skips:
            h = jnp.concatenate([input_pts, h], axis=-1)

    if cfg.use_viewdirs:
        input_views = (x[..., cfg.input_ch:cfg.input_ch + cfg.input_ch_views]
                       .astype(cfg.compute_dtype))
        alpha = _linear(h, params["alpha_linear"], cfg)
        feature = _linear(h, params["feature_linear"], cfg)
        h = jnp.concatenate([feature, input_views], axis=-1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(_linear(h, layer, cfg))
        rgb = _linear(h, params["rgb_linear"], cfg)
        return jnp.concatenate([rgb, alpha], axis=-1).astype(jnp.float32)
    return _linear(h, params["output_linear"], cfg).astype(jnp.float32)
