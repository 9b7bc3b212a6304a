"""LPIPS perceptual metric (AlexNet backbone + linear heads) in pure jnp.

The reference uses the pip ``lpips`` package with pretrained AlexNet
features (`/root/reference/main.py:6,47,364-369`, net per ``--lpips_net``).
This module reimplements the same computation graph natively:

  sRGB in [0,1] -> scale to [-1,1] -> ImageNet-style normalization ->
  5 AlexNet conv stages -> unit-normalize channel features ->
  1x1 linear heads -> spatial mean -> sum over stages.

Pretrained weights are NOT bundled (this environment has no network access
and no torchvision): ``load_torch_lpips`` converts a torch ``lpips``
state_dict (e.g. saved from the pip package elsewhere) into the param
pytree; ``init_lpips`` gives random weights for tests. Callers gate on
weight availability — PSNR/SSIM/FLIP are always available natively.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# (out_ch, in_ch, kernel, stride, pad) per AlexNet-features conv layer,
# with maxpool(3,2) after layers 0, 1 and ReLU after every conv.
_ALEX = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}

# LPIPS input normalization (the package's ScalingLayer constants).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips(key: jax.Array) -> dict:
    """Random-weight LPIPS params (for tests / shape checks)."""
    convs, lins = [], []
    for i, (oc, ic, k, _, _) in enumerate(_ALEX):
        key, k1, k2 = jax.random.split(key, 3)
        std = 1.0 / math.sqrt(ic * k * k)
        convs.append({
            "w": jax.random.normal(k1, (k, k, ic, oc)) * std,
            "b": jnp.zeros((oc,)),
        })
        lins.append({"w": jax.random.uniform(k2, (1, 1, oc, 1))})
    return {"convs": convs, "lins": lins}


def load_torch_lpips(state_dict: dict) -> dict:
    """Convert a torch ``lpips.LPIPS(net='alex')`` state_dict.

    torch layout: ``net.slice{1..5}.<idx>.weight`` convs [O,I,kh,kw] and
    ``lin{0..4}.model.1.weight`` 1x1 heads [1,C,1,1].
    """
    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    conv_keys = sorted(
        (k for k in state_dict if k.startswith("net.") and k.endswith(".weight")),
        key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])))
    convs = []
    for k in conv_keys:
        w = np_(state_dict[k])          # [O, I, kh, kw]
        b = np_(state_dict[k[:-6] + "bias"])
        convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                      "b": jnp.asarray(b)})
    lins = []
    for i in range(len(_ALEX)):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in state_dict:
                w = np_(state_dict[cand])   # [1, C, 1, 1]
                lins.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0))})
                break
    assert len(convs) == len(_ALEX) and len(lins) == len(_ALEX), \
        "unrecognized lpips state_dict layout"
    return {"convs": convs, "lins": lins}


def _conv(x: Array, w: Array, b: Array, stride: int, pad: int) -> Array:
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def _maxpool(x: Array, k: int = 3, s: int = 2) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _alex_features(params: dict, x: Array) -> list[Array]:
    feats = []
    h = x
    for i, (oc, ic, k, s, p) in enumerate(_ALEX):
        h = _conv(h, params["convs"][i]["w"], params["convs"][i]["b"], s, p)
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _maxpool(h)
    return feats


def _unit_normalize(f: Array, eps: float = 1e-10) -> Array:
    n = jnp.sqrt(jnp.sum(f ** 2, axis=-1, keepdims=True))
    return f / (n + eps)


def lpips(params: dict, img0: Array, img1: Array) -> Array:
    """LPIPS distance between [N, H, W, 3] (or [H, W, 3]) sRGB in [0,1]."""
    if img0.ndim == 3:
        img0, img1 = img0[None], img1[None]
    # [0,1] -> [-1,1], the standard LPIPS input convention. (The
    # reference min-max rescales each tensor to [-1,1] instead,
    # `main.py:364-369` — a nonstandard choice; numbers computed here
    # follow the original LPIPS definition.)
    x0, x1 = 2.0 * img0 - 1.0, 2.0 * img1 - 1.0
    x0 = (x0 - _SHIFT) / _SCALE
    x1 = (x1 - _SHIFT) / _SCALE
    f0s = _alex_features(params, x0)
    f1s = _alex_features(params, x1)
    total = 0.0
    for i, (f0, f1) in enumerate(zip(f0s, f1s)):
        d = (_unit_normalize(f0) - _unit_normalize(f1)) ** 2
        w = params["lins"][i]["w"]  # [1, 1, C, 1]
        val = jax.lax.conv_general_dilated(
            d, jnp.maximum(w, 0.0), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return jnp.mean(total)
