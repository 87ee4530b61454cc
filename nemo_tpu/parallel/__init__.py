"""Multi-chip scaling: meshes, shardings, data-parallel step wrappers."""

from .mesh import (batch_sharding, data_parallel_step, make_mesh, replicated,
                   replicate_tree, shard_batch)

__all__ = ["batch_sharding", "data_parallel_step", "make_mesh", "replicated",
           "replicate_tree", "shard_batch"]
