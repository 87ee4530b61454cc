"""Multi-chip scaling: meshes, shardings, dp step wrappers, seed fan-out,
multi-host init hooks.

Attribute imports are LAZY (PEP 562): `distributed.initialize()` must run
before anything initializes the XLA backend (jax.distributed's contract),
and `fanout`/`mesh` pull in the fit stack whose module-level tables touch
the backend. Eager imports here would make the documented pod-job pattern

    from nemo_tpu.parallel import distributed
    distributed.initialize()

fail with "must be called before any JAX calls that might initialise the
XLA backend" — exercised by tests/test_parallel.py's 2-process test.
"""

from . import distributed  # light: imports only os/typing/jax, no backend

_LAZY = {
    "fit_many_seeds": "fanout", "make_fanout": "fanout",
    "batch_sharding": "mesh", "data_parallel_step": "mesh",
    "make_mesh": "mesh", "replicated": "mesh", "replicate_tree": "mesh",
    "shard_batch": "mesh",
}

__all__ = ["distributed", *sorted(_LAZY)]


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f".{_LAZY[name]}", __name__)
        val = getattr(mod, name)
        globals()[name] = val
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
