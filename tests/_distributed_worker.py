"""Worker process for tests/test_parallel.py::test_multiprocess_distributed.

Run as: python _distributed_worker.py <coordinator> <num_procs> <pid> <out>

Forces the CPU backend (the env var is ignored outside pytest — CLAUDE.md),
initializes jax.distributed against a real TCP coordinator, runs one psum
across the 2-process CPU mesh, checks local_batch_slice partitioning, hits
the barrier, and writes its view of the world to <out> as JSON.
"""

import json
import sys


def main():
    coord, nproc, pid, out = (sys.argv[1], int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from nemo_tpu.parallel import distributed

    active = distributed.initialize(coordinator_address=coord,
                                    num_processes=nproc, process_id=pid)

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())              # global device list
    mesh = Mesh(devs, ("all",))
    local = np.full((4,), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("all")), local, (4 * nproc,))
    total = float(jax.jit(lambda v: v.sum(),
                          out_shardings=NamedSharding(mesh, P()))(garr))

    sl = distributed.local_batch_slice(8)
    distributed.barrier()

    with open(out, "w") as f:
        json.dump({
            "active": bool(active),
            "process_index": distributed.process_index(),
            "process_count": distributed.process_count(),
            "is_primary": distributed.is_primary(),
            "num_global_devices": int(devs.size),
            "psum_total": total,
            "slice": [sl.start, sl.stop],
        }, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
