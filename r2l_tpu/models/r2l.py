"""R2L student: a deep residual-MLP neural light field (ray -> RGB).

TPU-native redesign of the reference ``NeRF_v3_2`` + ``ResMLP``
(`/root/reference/model/nerf_raybased.py:443-544`):

  * params are a plain pytree; the uniform ResMLP body is *stacked* into
    [n_block, n_learnable, W, W] arrays and iterated with ``lax.scan`` —
    one traced block instead of 43 unrolled ones (fast compile, natural
    tensor-parallel sharding on the width axes, scan-friendly remat);
  * activations run in bfloat16 on the MXU with float32 params by default
    (configurable), matmuls request float32 accumulation;
  * the canonical architecture (W=256, D=88 -> 43 blocks, head Linear+ReLU,
    tail Linear+Sigmoid, global residual) is bit-compatible with released
    torch checkpoints after layout transposition (see checkpoint.py).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class R2LConfig:
    input_dim: int = 1008          # n_sample*3*(2L+1) = 16*3*21
    output_dim: int = 3
    netdepth: int = 88             # D (reference --netdepth)
    netwidth: int = 256            # W (reference --netwidth)
    n_block: int = -1              # -1 -> (D-2)//2 (reference trial.n_block)
    n_learnable: int = 2           # linears per block
    act: str = "relu"              # head activation
    inact: str = "relu"            # within-block activation
    outact: str = "none"           # block output activation
    res_scale: float = 1.0
    body_arch: str = "resmlp"      # 'resmlp' | 'mlp'
    use_residual: bool = True      # global body(x) + x
    linear_tail: bool = False      # tail without sigmoid
    # --layerwise_netwidths: per-layer body widths for the plain-MLP body
    # (reference `model/nerf_raybased.py:489-493`; the resmlp branch there
    # ignores the list but its tail would take Ws[D-2] and crash — we
    # reject the combination up front in configs.args_to_r2l_config).
    layerwise_widths: tuple = ()
    compute_dtype: Any = jnp.float32  # activation dtype (bf16 for speed)
    precision: str = "high"        # matmul precision for f32 operands
    #                                ("default"=1-pass bf16, "high"=3-pass
    #                                near-f32, "highest"=6-pass full f32 —
    #                                ~300x slower than bf16 on v5e).
    #                                Matches the CLI default; tests pin
    #                                "highest" where exactness matters.

    @property
    def num_blocks(self) -> int:
        return r2l_num_blocks(self.netdepth, self.n_block)

    @property
    def widths(self) -> list:
        """Per-layer widths Ws[0..D-1] (reference `:489-493`: the given
        list + a trailing 3; uniform netwidth otherwise)."""
        if self.layerwise_widths:
            ws = list(self.layerwise_widths) + [3]
            if len(ws) < self.netdepth - 1:
                raise ValueError(
                    f"layerwise_netwidths needs >= netdepth-2 = "
                    f"{self.netdepth - 2} entries, got {len(ws) - 1}")
            return ws
        return [self.netwidth] * (self.netdepth - 1) + [3]


def r2l_num_blocks(netdepth: int, n_block: int = -1) -> int:
    return n_block if n_block > 0 else (netdepth - 2) // 2


def _activation(name: str):
    name = name.lower()
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, 0.01)
    if name == "none":
        return None
    raise NotImplementedError(f"activation {name!r}")


def _linear_init(key: jax.Array, fan_in: int, fan_out: int):
    """torch.nn.Linear default init (kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return w, b


def init_r2l(key: jax.Array, cfg: R2LConfig) -> dict:
    """Initialize the parameter pytree.

    Layout (weights stored [in, out] so forward is ``x @ w + b``):
      head: {w [input_dim, W], b [W]}
      body: {w [n_block, n_learnable, W, W], b [n_block, n_learnable, W]}
            (resmlp) or a list of {w, b} (plain mlp)
      tail: {w [W, out], b [out]}
    """
    W, D = cfg.netwidth, cfg.netdepth
    k_head, k_body, k_tail = jax.random.split(key, 3)
    Ws = cfg.widths  # uniform unless --layerwise_netwidths (mlp body only)

    hw, hb = _linear_init(k_head, cfg.input_dim, Ws[0])
    params: dict = {"head": {"w": hw, "b": hb}}

    if cfg.body_arch == "resmlp":
        nb, nl = cfg.num_blocks, cfg.n_learnable
        keys = jax.random.split(k_body, nb * nl).reshape(nb, nl)
        ws, bs = [], []
        for i in range(nb):
            ws_i, bs_i = [], []
            for j in range(nl):
                w, b = _linear_init(keys[i, j], W, W)
                ws_i.append(w)
                bs_i.append(b)
            ws.append(jnp.stack(ws_i))
            bs.append(jnp.stack(bs_i))
        params["body"] = {"w": jnp.stack(ws), "b": jnp.stack(bs)}
    elif cfg.body_arch == "mlp":
        # Plain MLP body: Linear(Ws[i-1], Ws[i]) for i in 1..D-2
        # (reference `model/nerf_raybased.py:503-505`).
        layers = []
        keys = jax.random.split(k_body, max(D - 2, 1))
        for i in range(1, D - 1):
            w, b = _linear_init(keys[i - 1], Ws[i - 1], Ws[i])
            layers.append({"w": w, "b": b})
        params["body"] = layers
    else:
        raise NotImplementedError(cfg.body_arch)

    tw, tb = _linear_init(k_tail, Ws[D - 2], cfg.output_dim)
    params["tail"] = {"w": tw, "b": tb}
    return params


def apply_r2l(params: dict, cfg: R2LConfig, x: Array) -> Array:
    """Forward pass: [..., input_dim] -> [..., output_dim].

    Mirrors reference `model/nerf_raybased.py:539-544`:
    tail(body(head(x)) [+ head(x)]).
    """
    cd = cfg.compute_dtype
    act = _activation(cfg.act) or (lambda v: v)
    inact = _activation(cfg.inact)
    outact = _activation(cfg.outact)

    x = x.astype(cd)
    h = act(jnp.dot(x, params["head"]["w"].astype(cd),
                    preferred_element_type=jnp.float32, precision=cfg.precision).astype(cd)
            + params["head"]["b"].astype(cd))

    if cfg.body_arch == "resmlp":
        nl = cfg.n_learnable

        def block(carry, wb):
            w, b = wb  # w: [nl, W, W], b: [nl, W]
            h_in = carry
            h = h_in
            for j in range(nl):
                h = jnp.dot(h, w[j].astype(cd),
                            preferred_element_type=jnp.float32, precision=cfg.precision).astype(cd)
                h = h + b[j].astype(cd)
                if j < nl - 1 and inact is not None:
                    h = inact(h)
            h = h * cfg.res_scale + h_in
            if outact is not None:
                h = outact(h)
            return h, None

        body_out, _ = jax.lax.scan(
            block, h, (params["body"]["w"], params["body"]["b"]))
    else:
        body_out = h
        for layer in params["body"]:
            body_out = jnp.dot(body_out, layer["w"].astype(cd),
                               preferred_element_type=jnp.float32, precision=cfg.precision).astype(cd)
            body_out = act(body_out + layer["b"].astype(cd))

    h = body_out + h if cfg.use_residual else body_out

    out = jnp.dot(h, params["tail"]["w"].astype(cd),
                  preferred_element_type=jnp.float32, precision=cfg.precision)
    out = out + params["tail"]["b"].astype(jnp.float32)
    if not cfg.linear_tail:
        out = jax.nn.sigmoid(out)
    return out
