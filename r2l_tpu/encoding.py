"""Positional encoders (pure jnp).

Two layouts, bit-compatible with the reference so converted checkpoints see
identical feature orderings:

  * ``nerf_embed``  — NeRF-style, per-frequency interleave applied to whole
    vectors: [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]
    (reference `model/nerf_raybased.py:23-73` / `helpers:24-74`);
    3-d point, L=10 -> 63 dims; 3-d viewdir, L=4 -> 27 dims.

  * ``r2l_embed`` — R2L-style, per-*scalar* [sin(s*2^0..2^{L-1}),
    cos(s*2^0..2^{L-1}), s] then flattened
    (reference `model/nerf_raybased.py:191-208` ``PositionalEmbedder``);
    48-d flattened ray samples, L=10 -> 48*21 = 1008 dims.

Both are trivially fusable elementwise ops — XLA folds them into the first
matmul's producer; the Pallas fast path re-computes them in-kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def nerf_embed_dim(input_dims: int, L: int, include_input: bool = True) -> int:
    return input_dims * (2 * L + (1 if include_input else 0))


def nerf_embed(x: Array, L: int, include_input: bool = True) -> Array:
    """NeRF-style positional encoding of [..., d] -> [..., d*(2L+1)].

    Frequency bands are 2^0 .. 2^(L-1) (log-sampled), and the layout is
    per-frequency: [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...].
    """
    if L == 0:
        return x if include_input else x[..., :0]
    freqs = 2.0 ** jnp.arange(L, dtype=x.dtype)          # [L]
    y = x[..., None, :] * freqs[:, None]                 # [..., L, d]
    sc = jnp.stack([jnp.sin(y), jnp.cos(y)], axis=-2)    # [..., L, 2, d]
    sc = sc.reshape(*x.shape[:-1], 2 * L * x.shape[-1])  # [..., 2L*d]
    if include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc


# Same formula as nerf_embed_dim — one source of truth.
r2l_embed_dim = nerf_embed_dim


def r2l_embed(x: Array, L: int, include_input: bool = True) -> Array:
    """R2L-style positional encoding of [..., dim] -> [..., dim*(2L+1)].

    Per-scalar layout: for each input scalar s,
    [sin(s*2^0)..sin(s*2^{L-1}), cos(s*2^0)..cos(s*2^{L-1}), s].
    """
    freqs = 2.0 ** jnp.arange(L, dtype=x.dtype)            # [L]
    y = x[..., None] * freqs                               # [..., dim, L]
    parts = [jnp.sin(y), jnp.cos(y)]
    if include_input:
        parts.append(x[..., None])
    y = jnp.concatenate(parts, axis=-1)                    # [..., dim, 2L+1]
    return y.reshape(*x.shape[:-1], -1)                    # [..., dim*(2L+1)]
