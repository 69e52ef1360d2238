"""Device-mesh + sharding layer (new capability; reference is single-device)."""

from .mesh import (DATA_AXIS, SPATIAL_AXIS, batch_sharding, image_sharding,
                   init_distributed, label_sharding, make_mesh, make_mesh_2d,
                   put_sharded, replicate, replicated, shard_batch,
                   spans_processes)

__all__ = ["DATA_AXIS", "SPATIAL_AXIS", "batch_sharding", "image_sharding", "init_distributed",
           "label_sharding", "make_mesh", "make_mesh_2d", "put_sharded",
           "replicate", "replicated", "shard_batch", "spans_processes"]
