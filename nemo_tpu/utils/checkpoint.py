"""Checkpoint / resume for fit state.

Behavioral reference: MultiViewModel.save/load
(nemo/neural_motion_model.py:257-280) — parameters + ALL optimizer states +
the config used at init (model_config.p, :199-202) so a run can be rebuilt
identically. Frozen components (smpl, priors) are never serialized.

Implementation: orbax if available, with a portable npz+json fallback that
has no framework dependencies (useful for cross-version reads).
"""

from __future__ import annotations

import dataclasses
import json
import os
import os.path as osp
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_fit_state(path: str, state, cfg=None) -> None:
    """Save params + optimizer states + plateau + step (+config json)."""
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(osp.join(path, "params.npz"),
                        **_flatten_with_paths(state.params))
    np.savez_compressed(osp.join(path, "opt_state.npz"),
                        **_flatten_with_paths(state.opt_state))
    np.savez_compressed(osp.join(path, "plateau.npz"),
                        **_flatten_with_paths(state.plateau))
    np.save(osp.join(path, "key.npy"), np.asarray(state.key))
    meta = {"step": int(state.step)}
    if cfg is not None:
        meta["config"] = dataclasses.asdict(cfg)
    with open(osp.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def _restore_tree(template, flat: Dict[str, np.ndarray]):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    new_leaves = []
    for path, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        if key in flat:
            new_leaves.append(jax.numpy.asarray(flat[key]))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_fit_state(path: str, state):
    """Restore into an existing (template) FitState; returns a new FitState.

    Like the reference's load() (:268-280), unknown/extra entries are
    ignored and frozen modules are untouched (they're not stored at all).
    """
    from ..fit.loop import FitState
    params = _restore_tree(state.params,
                           dict(np.load(osp.join(path, "params.npz"))))
    opt_state = _restore_tree(state.opt_state,
                              dict(np.load(osp.join(path, "opt_state.npz"))))
    plateau = _restore_tree(state.plateau,
                            dict(np.load(osp.join(path, "plateau.npz"))))
    key = jax.numpy.asarray(np.load(osp.join(path, "key.npy")))
    with open(osp.join(path, "meta.json")) as f:
        meta = json.load(f)
    return FitState(params=params, opt_state=opt_state, plateau=plateau,
                    key=key, step=meta["step"])


def load_saved_config(path: str) -> Dict[str, Any]:
    with open(osp.join(path, "meta.json")) as f:
        return json.load(f).get("config", {})


# ---------------------------------------------------------------------------
# orbax backend (optional): async-friendly checkpointing for long runs
# ---------------------------------------------------------------------------

def save_fit_state_orbax(path: str, state, cfg=None) -> None:
    """Orbax-based save of the same fit state (structured pytree)."""
    import orbax.checkpoint as ocp
    payload = {"params": state.params, "opt_state": state.opt_state,
               "plateau": state.plateau, "key": state.key}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(osp.abspath(path), payload, force=True)
    meta = {"step": int(state.step)}
    if cfg is not None:
        meta["config"] = dataclasses.asdict(cfg)
    with open(osp.join(path, "nemo_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_fit_state_orbax(path: str, state):
    """Restore a fit state saved with save_fit_state_orbax."""
    import orbax.checkpoint as ocp
    from ..fit.loop import FitState
    template = {"params": state.params, "opt_state": state.opt_state,
                "plateau": state.plateau, "key": state.key}
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(osp.abspath(path), template)
    with open(osp.join(path, "nemo_meta.json")) as f:
        meta = json.load(f)
    return FitState(params=restored["params"],
                    opt_state=restored["opt_state"],
                    plateau=restored["plateau"], key=restored["key"],
                    step=meta["step"])
