"""Checkpointing: native msgpack pytree checkpoints + torch ``.tar`` importer.

The reference saves torch pickles with keys ``global_step``, ``best_psnr``,
``network_fn_state_dict``, ``optimizer_state_dict`` (`main.py:1516-1542`).
Here the native format is a flax-serialization msgpack of numpy pytrees plus
a JSON sidecar of scalar metadata — portable, mmap-friendly, no pickle.

``load_torch_r2l`` / ``load_torch_nerf`` convert released reference
checkpoints (state_dict naming per `model/nerf_raybased.py:443-544` for R2L,
`:337-375` for NeRF, with optional ``module.`` DataParallel prefixes per
`helpers:408-425`) into this framework's [in, out]-layout pytrees.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization

from .models.nerf import NeRFConfig
from .models.r2l import R2LConfig


# ---------------------------------------------------------------------------
# Native checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, pytree: Any, meta: dict | None = None) -> None:
    """Save a pytree (params/opt state) to ``path`` (+ ``path.meta.json``)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host = jax.tree.map(np.asarray, pytree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host))
    os.replace(tmp, path)
    if meta is not None:
        # Atomic too: a crash mid-dump must not leave a truncated
        # meta.json next to a valid checkpoint (--resume reads it). The
        # params file replaces first, so the worst crash window leaves
        # meta one save behind — never corrupt.
        mtmp = path + ".meta.json.tmp"
        with open(mtmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(mtmp, path + ".meta.json")


_last_raw: tuple | None = None   # (abspath, mtime, tree, meta)


def load_checkpoint(path: str, target: Any = None) -> tuple[Any, dict]:
    """Load a pytree checkpoint; returns (pytree, meta).

    Raw (target-less) loads memoize ONE blob keyed by (path, mtime):
    --resume reads the same file twice moments apart (params via
    load_params, then the opt_state/pool blob via _native_resume_blob)
    and with the optimizer saved the blob is ~3x param size. Call
    ``drop_cached_checkpoint()`` when done to release the memory.
    """
    global _last_raw
    ap = os.path.abspath(path)
    if target is None:
        mt = os.path.getmtime(ap)
        if _last_raw is not None and _last_raw[:2] == (ap, mt):
            return _last_raw[2], _last_raw[3]
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        tree = serialization.from_bytes(target, data)
    else:
        tree = serialization.msgpack_restore(data)
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    if target is None:
        _last_raw = (ap, mt, tree, meta)
    return tree, meta


def drop_cached_checkpoint() -> None:
    """Release the raw-load memo (see load_checkpoint)."""
    global _last_raw
    _last_raw = None


def load_params(path: str, target: Any) -> tuple[Any, dict]:
    """Load just the params from a checkpoint that may wrap them as
    ``{"params": ..., "opt_state": ...}`` (the trainer's save layout) or
    store them bare. Restores list/tuple structure against ``target``."""
    raw, meta = load_checkpoint(path)
    if isinstance(raw, dict) and "params" in raw:
        raw = raw["params"]
    return serialization.from_state_dict(target, raw), meta


# ---------------------------------------------------------------------------
# Torch state-dict conversion
# ---------------------------------------------------------------------------

def _to_np(t) -> np.ndarray:
    """torch tensor -> numpy (no torch import at module scope)."""
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def strip_module_prefix(state_dict: dict) -> dict:
    """Remove DataParallel ``module.`` prefixes (reference `helpers:408-425`)."""
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state_dict.items()}


def _torch_body_is_mlp(sd: dict) -> bool:
    """True when the body uses the plain-MLP Sequential naming
    ``body.<even>.weight`` (reference `model/nerf_raybased.py:525-528`,
    trial.body_arch='mlp') rather than the ResMLP nesting
    ``body.<i>.body.<2j>.weight``."""
    body_keys = [k for k in sd
                 if k.startswith("body.") and k.endswith(".weight")]
    return bool(body_keys) and all(len(k.split(".")) == 3
                                   for k in body_keys)


def torch_r2l_to_params(state_dict: dict, cfg: R2LConfig) -> dict:
    """Reference ``NeRF_v3_2`` state_dict -> r2l_tpu param pytree.

    Reference module naming: ``head.0.{weight,bias}``,
    ``body.<i>.body.<2j>.{weight,bias}`` (ResMLP: Linear at even indices,
    activations between) or ``body.<2k>.{weight,bias}`` (plain-MLP body,
    `model/nerf_raybased.py:525-528`), ``tail.0.{weight,bias}`` (or
    ``tail.{weight,bias}`` with --linear_tail). torch Linear weights are
    [out, in] -> transposed.
    """
    sd = strip_module_prefix(state_dict)

    def w(name):
        return _to_np(sd[name + ".weight"]).T.astype(np.float32)

    def b(name):
        return _to_np(sd[name + ".bias"]).astype(np.float32)

    params: dict = {"head": {"w": w("head.0"), "b": b("head.0")}}
    if cfg.body_arch == "mlp" or _torch_body_is_mlp(sd):
        ids = sorted(int(k.split(".")[1]) for k in sd
                     if k.startswith("body.") and k.endswith(".weight"))
        params["body"] = [{"w": w(f"body.{i}"), "b": b(f"body.{i}")}
                          for i in ids]
    else:
        nb, nl = cfg.num_blocks, cfg.n_learnable
        ws = np.stack([
            np.stack([w(f"body.{i}.body.{2 * j}") for j in range(nl)])
            for i in range(nb)])
        bs = np.stack([
            np.stack([b(f"body.{i}.body.{2 * j}") for j in range(nl)])
            for i in range(nb)])
        params["body"] = {"w": ws, "b": bs}
    tail_name = "tail" if "tail.weight" in sd else "tail.0"
    params["tail"] = {"w": w(tail_name), "b": b(tail_name)}
    return params


def params_to_torch_r2l(params: dict, cfg: R2LConfig) -> dict:
    """Inverse of ``torch_r2l_to_params`` (numpy arrays, reference naming)."""
    host = jax.tree.map(np.asarray, params)
    sd = {
        "head.0.weight": host["head"]["w"].T,
        "head.0.bias": host["head"]["b"],
    }
    if isinstance(host["body"], (list, tuple)):
        # plain-MLP body: Sequential(Linear, act, ...) -> even indices
        for k, lin in enumerate(host["body"]):
            sd[f"body.{2 * k}.weight"] = lin["w"].T
            sd[f"body.{2 * k}.bias"] = lin["b"]
    else:
        nb, nl = cfg.num_blocks, cfg.n_learnable
        for i in range(nb):
            for j in range(nl):
                sd[f"body.{i}.body.{2 * j}.weight"] = host["body"]["w"][i, j].T
                sd[f"body.{i}.body.{2 * j}.bias"] = host["body"]["b"][i, j]
    tail_name = "tail" if cfg.linear_tail else "tail.0"
    sd[tail_name + ".weight"] = host["tail"]["w"].T
    sd[tail_name + ".bias"] = host["tail"]["b"]
    return sd


def torch_nerf_to_params(state_dict: dict, cfg: NeRFConfig) -> dict:
    """Reference ``NeRF`` state_dict -> r2l_tpu teacher param pytree."""
    sd = strip_module_prefix(state_dict)

    def lin(name):
        return {"w": _to_np(sd[name + ".weight"]).T.astype(np.float32),
                "b": _to_np(sd[name + ".bias"]).astype(np.float32)}

    params: dict = {
        "pts_linears": [lin(f"pts_linears.{i}") for i in range(cfg.D)]}
    if cfg.use_viewdirs:
        params["views_linears"] = [lin("views_linears.0")]
        params["feature_linear"] = lin("feature_linear")
        params["alpha_linear"] = lin("alpha_linear")
        params["rgb_linear"] = lin("rgb_linear")
    else:
        params["output_linear"] = lin("output_linear")
    return params


def keras_nerf_to_params(weights, cfg: NeRFConfig) -> dict:
    """Original TF-NeRF (Keras) weight list -> teacher param pytree
    (reference ``NeRF.load_weights_from_keras``,
    `model/nerf_raybased.py:403-440`: flat [w0, b0, w1, b1, ...] in the
    order pts_linears*D, feature, views, rgb, alpha). Keras stores
    Linear weights [in, out] — the same layout this framework uses, so
    unlike the torch converters there is NO transpose."""
    if not cfg.use_viewdirs:
        raise ValueError("Keras NeRF weights require use_viewdirs "
                         "(reference nerf_raybased.py:404)")
    w = [np.asarray(x, np.float32) for x in weights]

    def lin(i):
        return {"w": w[i], "b": w[i + 1].reshape(-1)}

    params: dict = {
        "pts_linears": [lin(2 * i) for i in range(cfg.D)],
        "feature_linear": lin(2 * cfg.D),
        "views_linears": [lin(2 * cfg.D + 2)],
        "rgb_linear": lin(2 * cfg.D + 4),
        "alpha_linear": lin(2 * cfg.D + 6),
    }
    return params


def params_to_torch_nerf(params: dict, cfg: NeRFConfig) -> dict:
    """Inverse of ``torch_nerf_to_params`` (numpy arrays, reference
    ``NeRF`` naming `model/nerf_raybased.py:337-375`; torch Linears are
    [out, in] -> transposed)."""
    host = jax.tree.map(np.asarray, params)
    sd = {}
    for i, lin in enumerate(host["pts_linears"]):
        sd[f"pts_linears.{i}.weight"] = lin["w"].T
        sd[f"pts_linears.{i}.bias"] = lin["b"]
    if cfg.use_viewdirs:
        sd["views_linears.0.weight"] = host["views_linears"][0]["w"].T
        sd["views_linears.0.bias"] = host["views_linears"][0]["b"]
        for name in ("feature_linear", "alpha_linear", "rgb_linear"):
            sd[name + ".weight"] = host[name]["w"].T
            sd[name + ".bias"] = host[name]["b"]
    else:
        sd["output_linear.weight"] = host["output_linear"]["w"].T
        sd["output_linear.bias"] = host["output_linear"]["b"]
    return sd


def infer_r2l_config_from_state_dict(state_dict: dict, **overrides) -> R2LConfig:
    """Derive architecture hyper-params from a torch state_dict's shapes
    (both body archs: ResMLP nesting and the plain-MLP Sequential)."""
    sd = strip_module_prefix(state_dict)
    input_dim = int(sd["head.0.weight"].shape[1])
    W = int(sd["head.0.weight"].shape[0])
    linear_tail = "tail.weight" in sd
    tail_w = sd["tail.weight" if linear_tail else "tail.0.weight"]
    if _torch_body_is_mlp(sd):
        ids = sorted(int(k.split(".")[1]) for k in sd
                     if k.startswith("body.") and k.endswith(".weight"))
        outs = [int(sd[f"body.{i}.weight"].shape[0]) for i in ids]
        D = len(ids) + 2             # head + body linears + tail
        kw = dict(input_dim=input_dim, netwidth=W, body_arch="mlp",
                  netdepth=D, output_dim=int(tail_w.shape[0]),
                  linear_tail=linear_tail)
        if any(o != W for o in outs):
            # non-uniform body: per-layer widths Ws[0..D-2]
            # (--layerwise_netwidths semantics, `:489-493`)
            kw["layerwise_widths"] = tuple([W] + outs)
    else:
        block_ids = sorted({int(k.split(".")[1]) for k in sd
                            if k.startswith("body.")})
        nb = len(block_ids)
        layer_ids = sorted({int(k.split(".")[3]) for k in sd
                            if k.startswith("body.0.body.")
                            and k.endswith("weight")})
        nl = len(layer_ids)
        kw = dict(input_dim=input_dim, netwidth=W, n_block=nb,
                  n_learnable=nl,
                  # head + tail + nl learnables per block (nl != 2
                  # exists: --trial.n_learnable; 2+2*nb would misreport)
                  netdepth=2 + nl * nb, output_dim=int(tail_w.shape[0]),
                  linear_tail=linear_tail)
    kw.update(overrides)
    return R2LConfig(**kw)


def infer_r2l_config_from_params(params: dict, **overrides) -> R2LConfig:
    """Derive R2LConfig from a NATIVE param pytree's shapes (the
    msgpack-restored or live layout: head/body/tail with stacked body
    [n_block, n_learnable, W, W]).

    Architecture semantics that shapes cannot express (use_residual,
    linear_tail, act/inact) must come via ``overrides`` — exactly like
    the torch-side ``infer_r2l_config_from_state_dict`` + CLI flags in
    ``app.build_r2l``.
    """
    head_w = np.asarray(params["head"]["w"])
    tail_w = np.asarray(params["tail"]["w"])
    W = int(head_w.shape[1])
    body = params["body"]
    if isinstance(body, (list, tuple)) or (
            isinstance(body, dict) and "w" not in body):
        # plain-MLP body (a list of {w, b}; msgpack restores dicts with
        # stringified indices, hence the second form)
        lins = (list(body) if isinstance(body, (list, tuple))
                else [body[k] for k in sorted(body, key=int)])
        outs = [int(np.asarray(lin["w"]).shape[1]) for lin in lins]
        kw = dict(input_dim=int(head_w.shape[0]), netwidth=W,
                  body_arch="mlp", netdepth=len(lins) + 2,
                  output_dim=int(tail_w.shape[1]))
        if any(o != W for o in outs):
            kw["layerwise_widths"] = tuple([W] + outs)
    else:
        body_w = np.asarray(body["w"])
        nb, nl = int(body_w.shape[0]), int(body_w.shape[1])
        kw = dict(input_dim=int(head_w.shape[0]), netwidth=W,
                  n_block=nb, n_learnable=nl, netdepth=2 + nb * nl,
                  output_dim=int(tail_w.shape[1]))
    kw.update(overrides)
    return R2LConfig(**kw)


def load_torch_tar(path: str) -> dict:
    """Load a reference ``.tar`` torch checkpoint (CPU, weights only off)."""
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)
