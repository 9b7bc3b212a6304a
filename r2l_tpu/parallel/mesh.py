"""Device mesh + sharding rules (GSPMD over ICI; no custom comm backend).

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(`/root/reference/main.py:37-42,472-479`; SURVEY.md §2.8). The TPU-native
replacement is a ``jax.sharding.Mesh``:

  * axis ``'data'`` — rays/batch sharded (data parallel; grad ``psum``
    inserted by XLA via pjit);
  * axis ``'model'`` — optional tensor parallelism: MLP width axes sharded
    Megatron-style (first linear of each block column-parallel, second
    row-parallel) so each block needs ONE reduce over 'model';
  * multi-host: the same mesh spans hosts; DCN becomes the outer 'data'
    axis — no code change, just device order in ``make_mesh``.

Everything is expressed as shardings on pjit inputs/outputs; XLA inserts
the collectives.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: dict[str, int] | None = None,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Create a mesh. Default: all devices on axis 'data'.

    ``axes`` maps axis name -> size; sizes must multiply to #devices.
    A size of -1 means "whatever is left" (at most one).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not axes:
        axes = {"data": n}
    axes = dict(axes)
    wild = [k for k, v in axes.items() if v == -1]
    if wild:
        assert len(wild) == 1, "at most one -1 axis"
        fixed = int(np.prod([v for v in axes.values() if v != -1]))
        axes[wild[0]] = n // fixed
    sizes = list(axes.values())
    assert int(np.prod(sizes)) == n, f"mesh {axes} != {n} devices"
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (rays/batch) across the given mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def r2l_param_shardings(mesh: Mesh, params: Any,
                        model_axis: str = "model") -> Any:
    """Sharding pytree for R2L params.

    Without a 'model' axis everything is replicated. With one, the stacked
    body weights [n_block, n_learnable, W, W] are sharded Megatron-style:
    the full stack is sharded on its *output* width for j=0 (column
    parallel) and handled by GSPMD propagation for j=1. Since both linears
    of a block live in one stacked array, we shard the last axis and let
    XLA re-shard between the two applications — W=256 weights are tiny, so
    the re-shard cost is negligible while activations stay sharded.
    """
    if model_axis not in mesh.axis_names:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: repl, params)

    def spec_for(path: tuple, leaf) -> NamedSharding:
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "head" in names and names[-1] == "w":
            return NamedSharding(mesh, P(None, model_axis))
        if "body" in names and names[-1] == "w" and leaf.ndim == 4:
            return NamedSharding(mesh, P(None, None, None, model_axis))
        if "body" in names and names[-1] == "b" and leaf.ndim == 3:
            return NamedSharding(mesh, P(None, None, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_pytree(pytree: Any, shardings: Any) -> Any:
    """Place a pytree on devices with the given shardings."""
    return jax.tree.map(jax.device_put, pytree, shardings)
