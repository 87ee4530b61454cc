"""Multi-host (multi-process) initialization hooks.

The reference has no multi-node path at all — its fan-out is one SLURM job
per action on separate machines (SURVEY.md §2f). For TPU pods, JAX's SPMD
model extends the single-host mesh transparently once `jax.distributed`
is initialized: `jax.devices()` becomes the global device list, and the
same `make_mesh()` / `NamedSharding` code paths shard over ICI+DCN with no
further changes. These helpers wire that up and keep host-side side effects
(checkpoint writes, CSVs, renders) on process 0 only.

Usage (one call near the top of a pod job, before any jax computation):

    from nemo_tpu.parallel import distributed
    distributed.initialize()            # env-driven (TPU pods: automatic)
    if distributed.is_primary():
        ...   # write checkpoints / metrics

On a single host, `initialize()` is a no-op; everything keeps working
unchanged (tests and the single-chip CLI never need it).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed if running in a multi-process job.

    Returns True if distributed mode is active after the call. Safe to call
    multiple times and on single-host runs:

    * On TPU pods (GKE/GCE metadata present) or when the standard
      `JAX_COORDINATOR_ADDRESS` / `JAX_NUM_PROCESSES` / `JAX_PROCESS_ID`
      env triplet is set, arguments are optional — JAX autodetects.
    * With explicit arguments, they're forwarded verbatim.
    * With neither, it's a no-op returning False (single host).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    explicit = coordinator_address is not None
    env = (os.environ.get("JAX_COORDINATOR_ADDRESS")
           or os.environ.get("COORDINATOR_ADDRESS"))
    autodetect = (os.environ.get("TPU_WORKER_HOSTNAMES")
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not (explicit or env or autodetect):
        return False
    kwargs = {}
    if explicit:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should do host-side IO (ckpts, CSVs)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) slice of a globally-sharded batch owned by this
    process, for host-side data feeding (`jax.make_array_from_process_local_data`
    handles the device placement; this is for the npz-side slicing)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def barrier(name: str = "nemo_tpu_barrier") -> None:
    """Block until all processes reach this point (no-op single-host)."""
    if jax.process_count() == 1:
        return
    # A tiny psum over the global mesh is the canonical JAX barrier.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np
    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("all",))
    x = jax.device_put(
        np.zeros(devs.size, np.float32), NamedSharding(mesh, P("all")))
    jax.block_until_ready(jax.jit(
        lambda v: v.sum(), out_shardings=NamedSharding(mesh, P()))(x))
