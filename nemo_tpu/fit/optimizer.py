"""Per-parameter-group optimizers + on-device plateau LR scheduling.

Behavioral reference: NemoV1/V2 build 3-4 independent torch Adams — cameras,
motion(+rbf), phase, instance — each with its own lr (and weight decay for
the motion group), plus a ReduceLROnPlateau per optimizer
(nemo/neural_motion_model.py:3404-3438, :3701-3728). The reference steps the
schedulers every optimization step with the current loss (:3594-3596).

TPU-first mapping: one optax GradientTransformation per group, all states
carried through lax.scan; the plateau scheduler is a tiny pure state machine
(best, bad-step count, scale) whose scale multiplies that group's update.
torch semantics replicated: mode='min', threshold=1e-4 (relative), patience
10, cooldown 0, min_lr 1e-6.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .model import NemoConfig, Params

PLATEAU_PATIENCE = 10
PLATEAU_THRESHOLD = 1e-4
PLATEAU_MIN_LR = 1e-6

# parameter-group names (top-level keys of the params pytree);
# motion/rbf/instance exist for V1+, poses/orient/trans for V0.
GROUPS = ("cameras", "motion", "rbf", "phase", "instance", "betas",
          "poses", "orient", "trans")


class PlateauState(NamedTuple):
    best: jnp.ndarray       # scalar
    num_bad: jnp.ndarray    # scalar int
    scale: jnp.ndarray      # scalar lr multiplier


def plateau_init() -> PlateauState:
    return PlateauState(best=jnp.asarray(jnp.inf),
                        num_bad=jnp.asarray(0, jnp.int32),
                        scale=jnp.asarray(1.0))


def plateau_update(state: PlateauState, loss: jnp.ndarray, factor: float,
                   base_lr: float) -> PlateauState:
    """One torch-exact ReduceLROnPlateau step (rel threshold, min mode)."""
    improved = loss < state.best * (1.0 - PLATEAU_THRESHOLD)
    best = jnp.where(improved, loss, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    trip = num_bad > PLATEAU_PATIENCE
    min_scale = PLATEAU_MIN_LR / max(base_lr, PLATEAU_MIN_LR)
    scale = jnp.where(trip, jnp.maximum(state.scale * factor, min_scale),
                      state.scale)
    num_bad = jnp.where(trip, 0, num_bad)
    return PlateauState(best=best, num_bad=num_bad, scale=scale)


def group_lrs(cfg: NemoConfig) -> Dict[str, float]:
    return {
        "cameras": cfg.lr_camera,
        "motion": cfg.lr_human,
        "rbf": cfg.lr_human,        # rbf params live in the motion optimizer
        "phase": cfg.lr_phase,
        "instance": cfg.lr_instance,
        "betas": 0.0,               # learned_betas is a parameter the
                                    # reference never hands to any optimizer
        # V0's five-optimizer split (:3172-3199)
        "poses": cfg.lr_pose,
        "orient": cfg.lr_orient,
        "trans": cfg.lr_trans,
    }


def make_group_transform(cfg: NemoConfig, group: str
                         ) -> optax.GradientTransformation:
    """Optimizer for one group, matching the reference exactly.

    'adam' + weight decay = torch Adam's L2-into-gradient (decay added
    BEFORE the moment update); 'adamw' = decoupled decay after.
    Only the motion(+rbf) group carries weight decay (:3420-3426).
    """
    lr = group_lrs(cfg)[group]
    if lr == 0.0:
        return optax.set_to_zero()
    wd = cfg.wd_human if group in ("motion", "rbf", "poses", "orient") else 0.0
    if wd and cfg.opt_human == "adam":
        return optax.chain(optax.add_decayed_weights(wd),
                           optax.scale_by_adam(),
                           optax.scale(-lr))
    if wd and cfg.opt_human == "adamw":
        return optax.chain(optax.scale_by_adam(),
                           optax.add_decayed_weights(wd),
                           optax.scale(-lr))
    return optax.chain(optax.scale_by_adam(), optax.scale(-lr))


@dataclasses.dataclass
class GroupOptimizer:
    """Independent per-group transforms with a shared-interface update."""
    transforms: Dict[str, optax.GradientTransformation]
    cfg: NemoConfig

    def init(self, params: Params) -> Dict[str, Any]:
        return {g: self.transforms[g].init(params[g])
                for g in params if g in self.transforms}

    def update(self, grads: Params, opt_state: Dict[str, Any],
               params: Params, active: Optional[Tuple[str, ...]] = None,
               plateau: Optional[Dict[str, PlateauState]] = None
               ) -> Tuple[Params, Dict[str, Any]]:
        """Compute updates per group.

        active: groups to update this phase; inactive groups get zero updates
        and UNCHANGED optimizer state (exactly like the reference stepping
        only a subset of its torch optimizers).
        plateau: optional per-group plateau states whose scale multiplies
        the group's update.
        """
        new_state = dict(opt_state)
        updates: Params = {}
        for g, p in params.items():
            if g not in self.transforms or (active is not None
                                            and g not in active):
                updates[g] = jax.tree_util.tree_map(jnp.zeros_like, p)
                continue
            u, s = self.transforms[g].update(grads[g], opt_state[g], p)
            if plateau is not None and g in plateau:
                u = jax.tree_util.tree_map(
                    lambda x: x * plateau[g].scale, u)
            updates[g] = u
            new_state[g] = s
        return updates, new_state


def make_optimizer(cfg: NemoConfig) -> GroupOptimizer:
    return GroupOptimizer(
        transforms={g: make_group_transform(cfg, g) for g in GROUPS},
        cfg=cfg)


def make_camera_stage_optimizer(cfg: NemoConfig) -> GroupOptimizer:
    """The V0-V3 camera stage builds a FRESH Adam over cameras only
    (:2870-2871); its moments are discarded afterwards."""
    return GroupOptimizer(
        transforms={"cameras": optax.chain(optax.scale_by_adam(),
                                           optax.scale(-cfg.lr_camera))},
        cfg=cfg)


def plateau_init_all(cfg: NemoConfig) -> Dict[str, PlateauState]:
    return {g: plateau_init() for g in GROUPS if group_lrs(cfg)[g] > 0}


def plateau_update_all(states: Dict[str, PlateauState], loss: jnp.ndarray,
                       cfg: NemoConfig) -> Dict[str, PlateauState]:
    if cfg.lr_factor >= 1:
        return states
    lrs = group_lrs(cfg)
    return {g: plateau_update(s, loss, cfg.lr_factor, lrs[g])
            for g, s in states.items()}
