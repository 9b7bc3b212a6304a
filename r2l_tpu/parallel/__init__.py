from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   r2l_param_shardings, shard_pytree)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "r2l_param_shardings", "shard_pytree"]
