"""Fan-out: many independent fits on one chip / one mesh.

The reference parallelizes across actions, seeds and hyper-parameters with
SLURM job arrays (run_scripts_examples/nemomocap-example.sh:60-82,
custom_video/nemo-run.sh grid loops) — one GPU per job. The TPU-native
equivalent vmaps the ENTIRE fit stage over a seed axis: S independent
optimizations share one compiled program and one chip (the per-fit tensors
are small, so a v5 chip fits dozens), or shard the seed axis over a mesh
for multi-chip sweeps.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fit.loop import _sample_batch
from ..fit.model import NemoAssets, NemoConfig, fit_loss, init_params
from ..fit.optimizer import (make_optimizer, plateau_init_all,
                             plateau_update_all)


def make_fanout(cfg: NemoConfig, assets: NemoAssets, num_seeds: int,
                steps: Optional[int] = None, base_seed: int = 0,
                mesh=None):
    """Build the compiled seed fan-out: returns (fan, inputs) where
    fan(*inputs) -> (stacked final params, (S, steps) loss curves).

    Exposed separately from fit_many_seeds so repeated sweeps reuse ONE
    jitted program (a fresh closure per call would re-trace every time)."""
    steps = cfg.n_steps if steps is None else steps
    opt = make_optimizer(cfg)

    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(base_seed, base_seed + num_seeds))
    params0 = jax.vmap(
        lambda k: init_params(k, cfg, assets.num_views, assets.img_d0))(keys)
    opt_state0 = jax.vmap(opt.init)(params0)
    plateau0 = jax.vmap(lambda _: plateau_init_all(cfg))(
        jnp.arange(num_seeds))
    run_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)

    V, F, B = assets.num_views, assets.num_frames, cfg.batch_size

    def body(carry, _):
        params, opt_state, plateau, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        vi, fi = _sample_batch(k1, B, V, F)
        (loss, metrics), grads = jax.value_and_grad(
            fit_loss, has_aux=True)(params, cfg, assets, vi, fi, key=k2)
        updates, opt_state = opt.update(grads, opt_state, params,
                                        plateau=plateau)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        plateau = plateau_update_all(plateau, loss, cfg)
        return (params, opt_state, plateau, key), loss

    def one_seed(params, opt_state, plateau, key):
        (params, opt_state, plateau, _), losses = jax.lax.scan(
            body, (params, opt_state, plateau, key), None, length=steps)
        return params, losses

    fan = jax.jit(jax.vmap(one_seed, in_axes=(0, 0, 0, 0)))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        seed_sh = NamedSharding(mesh, P("dp"))
        params0, opt_state0, plateau0, run_keys = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, seed_sh),
            (params0, opt_state0, plateau0, run_keys))
    return fan, (params0, opt_state0, plateau0, run_keys)


def fit_many_seeds(cfg: NemoConfig, assets: NemoAssets, num_seeds: int,
                   steps: Optional[int] = None, base_seed: int = 0,
                   mesh=None) -> Dict[str, np.ndarray]:
    """Run `num_seeds` independent main-stage fits in one vmapped scan.

    Returns stacked final params + per-seed loss curves. With `mesh`, the
    seed axis shards across devices (the SLURM-array replacement). For
    repeated sweeps, build once with make_fanout and call the compiled
    program directly.
    """
    fan, inputs = make_fanout(cfg, assets, num_seeds, steps, base_seed, mesh)
    params, losses = fan(*inputs)
    return {"params": params, "losses": np.asarray(losses)}
