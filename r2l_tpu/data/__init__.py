from .blender import BlenderData, load_blender_data
from .rayshards import (RayShardDataset, RayBatchLoader, write_ray_shards,
                        shuffle_rays)

__all__ = [
    "BlenderData", "load_blender_data",
    "RayShardDataset", "RayBatchLoader", "write_ray_shards", "shuffle_rays",
]
