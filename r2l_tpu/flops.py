"""FLOPs / parameter accounting via XLA cost analysis.

The reference counts FLOPs with forward hooks on torch modules
(`/root/reference/smilelogging/utils.py:129-138,259-316`, logged at
`main.py:538-552` as "FLOPs/pixel"). Here the compiler itself is the
source of truth: ``jax.jit(fn).lower(...).compile().cost_analysis()``
reports exactly what will execute, including fusion effects.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def param_bytes(params: Any) -> int:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize
               for p in jax.tree.leaves(params))


def xla_cost(fn: Callable, *args, **kwargs) -> dict:
    """Compile ``fn`` for the given abstract args; return XLA's cost dict
    (keys like 'flops', 'bytes accessed')."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return dict(cost or {})


def flops_per_pixel(fn: Callable, n_ray: int, *args) -> float:
    """FLOPs/pixel of a ray-batched forward (reference `main.py:546-552`
    prints the same quantity from hook counters)."""
    cost = xla_cost(fn, *args)
    return float(cost.get("flops", 0.0)) / n_ray


def r2l_analytic_flops_per_pixel(cfg) -> float:
    """Closed-form matmul FLOPs/ray for the CANONICAL resmlp body
    (W256/D88 -> 11.79M, matching the paper table in BASELINE.md).
    For mlp / layerwise / odd-depth bodies use
    ``flops_per_pixel_from_params`` — this formula assumes a uniform
    num_blocks x n_learnable x W^2 body."""
    return 2.0 * (cfg.input_dim * cfg.netwidth
                  + cfg.num_blocks * cfg.n_learnable * cfg.netwidth ** 2
                  + cfg.netwidth * cfg.output_dim)


def flops_per_pixel_from_params(params: Any) -> float:
    """Matmul FLOPs/ray counted from the ACTUAL weight shapes: one ray
    uses every linear once, so FLOPs = 2 * sum(in*out) over weight
    matrices — exact for any body architecture (mlp, layerwise widths,
    stacked resmlp, teacher list-of-dicts), unlike the canonical closed
    form.

    Weight leaves are any pytree entry keyed ``"w"``. A 2-D leaf is one
    ``[in, out]`` linear (2*in*out FLOPs); leaves with leading stack axes
    (the scan-stacked resmlp body ``[n_block, n_learnable, W, W]``) apply
    each stacked ``[in, out]`` matrix once per ray, so the count is
    2 * prod(shape) in every case. Matches the reference's hook counter
    with ``count_adds=False`` (`/root/reference/main.py:546-552`,
    `smilelogging/utils.py:259-316`)."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", ""))
        if key == "w" and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            total += 2 * int(np.prod(leaf.shape))
    return float(total)


def nerf_flops_per_pixel_from_params(params: Any, n_samples: int,
                                     n_importance: int) -> float:
    """Teacher FLOPs/pixel, reference semantics (`main.py:541-545`):
    one per-point forward's matmul FLOPs times the number of network
    queries per pixel — coarse pass N_samples points plus fine pass
    (N_samples + N_importance) points, i.e. (2*N_samples + N_importance)
    total (the reference multiplies the single-model count by that sum,
    coarse and fine sharing the same architecture)."""
    return flops_per_pixel_from_params(params) * (2 * n_samples
                                                  + n_importance)
