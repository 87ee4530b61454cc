"""Multi-chip scaling via jax.sharding meshes.

The reference is a single-GPU optimizer; its only "parallelism" is
independent SLURM jobs (SURVEY.md §2f). The TPU-native scaling story:

  * **data parallel (dp)**: the sampled (view, frame) batch shards across
    chips; parameters are replicated; XLA inserts the gradient psum. This is
    the throughput axis for one action (batch 512 -> 64/chip on a v5p pod
    slice).
  * **action parallel (fan-out)**: independent actions/seeds vmap across a
    second mesh axis — the TPU equivalent of the reference's SLURM job
    arrays, without the scheduler round-trip.

Everything routes through `jax.jit` with `NamedSharding` constraints; no
per-collective code is needed because the model is pure data-parallel (the
MLPs are tiny and replicated).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "dp") -> Mesh:
    """A 1-D device mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "dp"):
    """Place arrays with their leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a parameter pytree across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def data_parallel_step(step_fn, mesh: Mesh, axis_name: str = "dp"):
    """Wrap a (params, batch...) -> (params, metrics) step for dp execution.

    Constrains the batch arguments to the dp axis and parameters to full
    replication; XLA then emits a single all-reduce over gradients on ICI.
    """
    rep = replicated(mesh)
    bat = batch_sharding(mesh, axis_name)

    def wrapped(params, opt_state, view_idx, frame_idx, *rest):
        params = jax.lax.with_sharding_constraint(
            params, jax.tree_util.tree_map(lambda _: rep, params))
        view_idx = jax.lax.with_sharding_constraint(view_idx, bat)
        frame_idx = jax.lax.with_sharding_constraint(frame_idx, bat)
        return step_fn(params, opt_state, view_idx, frame_idx, *rest)

    return jax.jit(wrapped)
