"""LPIPS perceptual metric (AlexNet / VGG16 / SqueezeNet backbones), pure jnp.

The reference uses the pip ``lpips`` package (`/root/reference/main.py:6,47,
364-369`), net selected by ``--lpips_net`` (alex default; vgg / squeeze
choices, `option.py:313`). This module reimplements the same computation
graph natively for all three backbones:

  sRGB in [0,1] -> scale to [-1,1] -> LPIPS scaling layer ->
  backbone conv stages -> unit-normalize channel features ->
  1x1 linear heads -> spatial mean -> sum over stages.

Pretrained weights are NOT bundled (this environment has no network access
and no torchvision): ``load_torch_lpips`` converts a torch ``lpips``
state_dict (e.g. ``torch.save(lpips.LPIPS(net='alex').state_dict(), ...)``
run elsewhere) into the param pytree; ``init_lpips`` gives random weights
for tests. Callers gate on weight availability — PSNR/SSIM/FLIP are always
available natively — and the eval path warns loudly when LPIPS is skipped.
"""
from __future__ import annotations

import functools
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
_ALEX_POOL_AFTER = {0, 1}

# VGG16 stages: (out_ch, n_convs); all 3x3 s1 p1, maxpool(2,2) between
# stages, features taken at each stage's last ReLU (relu1_2 ... relu5_3).
_VGG = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# SqueezeNet 1.1: conv(3->64, k3, s2) + 8 Fire modules
# (squeeze_ch, expand_ch) — expand1x1 and expand3x3 concat to 2*expand_ch.
_SQUEEZE_FIRES = [(16, 64), (16, 64), (32, 128), (32, 128),
                  (48, 192), (48, 192), (64, 256), (64, 256)]
# features taken after: relu1, fire3, fire5, fire6, fire7, fire8, fire9
# (lpips pretrained_networks.squeezenet slices); maxpool(3,2) before
# fires 0, 2 and 4.
_SQUEEZE_POOL_BEFORE = {0, 2, 4}
_SQUEEZE_FEAT_AFTER = {1, 3, 4, 5, 6, 7}

_N_STAGES = {"alex": 5, "vgg": 5, "squeeze": 7}

# LPIPS input normalization (the package's ScalingLayer constants).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _feat_channels(net: str) -> list[int]:
    if net == "alex":
        return [oc for oc, *_ in _ALEX]
    if net == "vgg":
        return [oc for oc, _ in _VGG]
    if net == "squeeze":
        return [64, 128, 256, 384, 384, 512, 512]
    raise ValueError(net)


def init_lpips(key: jax.Array, net: str = "alex") -> dict:
    """Random-weight LPIPS params (for tests / shape checks)."""
    def conv_init(k, ic, oc, ksz):
        k1, k2 = jax.random.split(k)
        std = 1.0 / math.sqrt(ic * ksz * ksz)
        return {"w": jax.random.normal(k1, (ksz, ksz, ic, oc)) * std,
                "b": jnp.zeros((oc,))}

    convs = []
    if net == "alex":
        for oc, ic, k, _, _ in _ALEX:
            key, sub = jax.random.split(key)
            convs.append(conv_init(sub, ic, oc, k))
    elif net == "vgg":
        ic = 3
        for oc, n in _VGG:
            for _ in range(n):
                key, sub = jax.random.split(key)
                convs.append(conv_init(sub, ic, oc, 3))
                ic = oc
    elif net == "squeeze":
        key, sub = jax.random.split(key)
        convs.append(conv_init(sub, 3, 64, 3))
        ic = 64
        for s, e in _SQUEEZE_FIRES:
            key, k1, k2, k3 = jax.random.split(key, 4)
            convs += [conv_init(k1, ic, s, 1), conv_init(k2, s, e, 1),
                      conv_init(k3, s, e, 3)]
            ic = 2 * e
    else:
        raise ValueError(net)

    lins = []
    for c in _feat_channels(net):
        key, sub = jax.random.split(key)
        lins.append({"w": jax.random.uniform(sub, (1, 1, c, 1))})
    return {"net": net, "convs": convs, "lins": lins}


def load_torch_lpips(state_dict: dict, net: str = "alex") -> dict:
    """Convert a torch ``lpips.LPIPS(net=...)`` state_dict.

    torch layout: ``net.slice{k}.<idx>[.subname].weight`` backbone convs
    [O, I, kh, kw] and ``lin{0..}.model.1.weight`` 1x1 heads [1, C, 1, 1].
    Fire-module convs (squeeze net) order: squeeze, expand1x1, expand3x3.
    """
    def np_(t):
        return (t.detach().cpu().numpy() if hasattr(t, "detach")
                else np.asarray(t))

    sub_order = {"": 0, "squeeze": 0, "expand1x1": 1, "expand3x3": 2}

    def sort_key(k):
        parts = k.split(".")
        slice_no = int(parts[1][5:])
        idx = int(parts[2])
        sub = parts[3] if len(parts) > 4 else ""
        return (slice_no, idx, sub_order.get(sub, 9))

    conv_keys = sorted((k for k in state_dict
                        if k.startswith("net.") and k.endswith(".weight")),
                       key=sort_key)
    convs = []
    for k in conv_keys:
        w = np_(state_dict[k])          # [O, I, kh, kw]
        b = np_(state_dict[k[:-6] + "bias"])
        convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                      "b": jnp.asarray(b)})
    lins = []
    for i in range(_N_STAGES[net]):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in state_dict:
                w = np_(state_dict[cand])   # [1, C, 1, 1]
                lins.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0))})
                break
    want_convs = {"alex": 5, "vgg": 13, "squeeze": 25}[net]
    assert len(convs) == want_convs and len(lins) == _N_STAGES[net], \
        f"unrecognized lpips state_dict layout for net={net!r}: " \
        f"{len(convs)} convs / {len(lins)} lins"
    return {"net": net, "convs": convs, "lins": lins}


def _conv(x: Array, p: dict, stride: int = 1, pad: int = 0) -> Array:
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)  # metric: no bf16 MXU passes
    return out + p["b"]


def _maxpool(x: Array, k: int, s: int) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _alex_features(convs: list, x: Array) -> list[Array]:
    feats, h = [], x
    for i, (oc, ic, k, s, p) in enumerate(_ALEX):
        h = jax.nn.relu(_conv(h, convs[i], s, p))
        feats.append(h)
        if i in _ALEX_POOL_AFTER:
            h = _maxpool(h, 3, 2)
    return feats


def _vgg_features(convs: list, x: Array) -> list[Array]:
    feats, h, ci = [], x, 0
    for si, (oc, n) in enumerate(_VGG):
        for _ in range(n):
            h = jax.nn.relu(_conv(h, convs[ci], 1, 1))
            ci += 1
        feats.append(h)
        if si < len(_VGG) - 1:
            h = _maxpool(h, 2, 2)
    return feats


def _squeeze_features(convs: list, x: Array) -> list[Array]:
    feats = []
    h = jax.nn.relu(_conv(h := x, convs[0], 2, 0))
    feats.append(h)
    ci = 1
    for fi, (s, e) in enumerate(_SQUEEZE_FIRES):
        if fi in _SQUEEZE_POOL_BEFORE:
            h = _maxpool(h, 3, 2)
        sq = jax.nn.relu(_conv(h, convs[ci], 1, 0))
        e1 = jax.nn.relu(_conv(sq, convs[ci + 1], 1, 0))
        e3 = jax.nn.relu(_conv(sq, convs[ci + 2], 1, 1))
        h = jnp.concatenate([e1, e3], axis=-1)
        ci += 3
        if fi in _SQUEEZE_FEAT_AFTER:
            feats.append(h)
    return feats


_FEATURES = {"alex": _alex_features, "vgg": _vgg_features,
             "squeeze": _squeeze_features}


def _unit_normalize(f: Array, eps: float = 1e-10) -> Array:
    n = jnp.sqrt(jnp.sum(f ** 2, axis=-1, keepdims=True))
    return f / (n + eps)


def minmax_rescale(x: Array, ymin: float = -1.0, ymax: float = 1.0) -> Array:
    """The reference's per-tensor min-max rescale (`main.py:361-364`):
    global min -> ymin, global max -> ymax over the WHOLE tensor (the
    reference applies it to the full [N, 3, H, W] frame stack at once)."""
    lo, hi = jnp.min(x), jnp.max(x)
    return (ymax - ymin) / jnp.maximum(hi - lo, 1e-12) * (x - lo) + ymin


def lpips(params: dict, img0: Array, img1: Array,
          rescale: str = "standard") -> Array:
    """LPIPS distance between [N, H, W, 3] (or [H, W, 3]) sRGB in [0,1].

    JITTED (one dispatch per call): the backbone is dozens of eager
    conv/normalize ops which would each pay this image's ~30 ms tunnel
    RTT per frame at eval time — the same pathology the jitted SSIM/FLIP
    paths avoid (metrics._ssim_jit, flip._flip_impl). ``net``/``rescale``
    are static; jax.jit caches per (net, rescale, shape).

    ``rescale``:
      * ``'standard'`` (default): [0,1] -> [-1,1] via 2x-1, the original
        LPIPS input convention (richzhang/PerceptualSimilarity).
      * ``'minmax'``: the reference's per-tensor min-max rescale to
        [-1,1] (`main.py:361-364`) — nonstandard, but makes numbers
        comparable to reference logs (--lpips_rescale minmax). NOTE the
        reference rescales the WHOLE frame stack at once; callers
        comparing to reference logs should pre-scale the stack and pass
        ``rescale='none'`` per image (see evaluate.render_path).
      * ``'none'``: inputs are already in [-1,1].
    """
    if img0.ndim == 3:
        img0 = img0[None]
    if img1.ndim == 3:
        img1 = img1[None]
    assert img0.shape == img1.shape, (img0.shape, img1.shape)
    arrs = {"convs": params["convs"], "lins": params["lins"]}
    return _lpips_jit(arrs, img0, img1,
                      net=params.get("net", "alex"), rescale=rescale)


@functools.partial(jax.jit, static_argnames=("net", "rescale"))
def _lpips_jit(arrs: dict, img0: Array, img1: Array, *,
               net: str, rescale: str) -> Array:
    if rescale == "standard":
        x0, x1 = 2.0 * img0 - 1.0, 2.0 * img1 - 1.0
    elif rescale == "minmax":
        x0, x1 = minmax_rescale(img0), minmax_rescale(img1)
    elif rescale == "none":
        x0, x1 = img0, img1
    else:
        raise ValueError(f"unknown rescale {rescale!r}")
    x0 = (x0 - _SHIFT) / _SCALE
    x1 = (x1 - _SHIFT) / _SCALE
    features = _FEATURES[net]
    f0s = features(arrs["convs"], x0)
    f1s = features(arrs["convs"], x1)
    total = 0.0
    for i, (f0, f1) in enumerate(zip(f0s, f1s)):
        d = (_unit_normalize(f0) - _unit_normalize(f1)) ** 2
        w = arrs["lins"][i]["w"]  # [1, 1, C, 1]
        val = jax.lax.conv_general_dilated(
            d, jnp.maximum(w, 0.0), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return jnp.mean(total)
