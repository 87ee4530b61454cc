"""Multi-chip scaling: meshes, shardings, dp step wrappers, seed fan-out,
multi-host init hooks."""

from . import distributed
from .fanout import fit_many_seeds, make_fanout
from .mesh import (batch_sharding, data_parallel_step, make_mesh, replicated,
                   replicate_tree, shard_batch)

__all__ = ["distributed", "fit_many_seeds", "make_fanout", "batch_sharding",
           "data_parallel_step", "make_mesh", "replicated", "replicate_tree",
           "shard_batch"]
