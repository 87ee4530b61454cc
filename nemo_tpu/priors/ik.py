"""IK engine: VPoser-latent inverse kinematics fitting.

Behavioral reference: human_body_prior/models/ik_engine.py:156-287 — fit
(VPoser latent z, betas, global orient, translation) so the posed body's
source keypoints match 3D targets, with per-part data weights plus z/betas
regularizers. The reference runs torch LBFGS/Adam closures (:246-252); here
each fit is one jitted lax.scan of optimizer steps, selectable between
Adam and L-BFGS (optax.lbfgs with its zoom linesearch — the compiled
counterpart of torch.optim.LBFGS's closure loop).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..body.smpl import SMPLModel, smpl_forward
from ..geometry.rotations import batch_rodrigues
from .vposer import Params as VPoserParams, vposer_decode


@dataclasses.dataclass(frozen=True)
class IKConfig:
    num_steps: int = 100
    lr: float = 1e-1
    data_weight: float = 100.0
    z_weight: float = 1.0      # latent magnitude regularizer
    betas_weight: float = 0.5
    # 'adam' | 'lbfgs' — the reference's optimizer switch
    # (ik_engine.py:246-252); lbfgs uses far fewer steps per solve
    optimizer: str = "adam"


def ik_fit(smpl: SMPLModel, vposer: VPoserParams,
           target_joints: jnp.ndarray,
           joint_mask: Optional[jnp.ndarray] = None,
           init: Optional[Dict[str, jnp.ndarray]] = None,
           cfg: IKConfig = IKConfig()) -> Dict[str, jnp.ndarray]:
    """Fit body state to 3D keypoint targets through the VPoser decoder.

    Args:
      target_joints: (B, 49, 3) target joints in the SPIN 49-joint order
        (use joint_mask to select the annotated subset).
      joint_mask: (49,) or (B, 49) weights; default all ones.
      init: optional dict with 'z' (B, 32), 'betas' (1, 10),
        'orient' (B, 3) axis-angle, 'trans' (B, 3).
    Returns:
      dict with fitted 'z', 'betas', 'orient', 'trans', 'pose_body' (B, 63),
      'joints', and the 'loss' history (num_steps,).
    """
    B = target_joints.shape[0]
    if joint_mask is None:
        joint_mask = jnp.ones(target_joints.shape[1])
    joint_mask = jnp.broadcast_to(joint_mask, target_joints.shape[:2])

    params0 = {
        "z": jnp.zeros((B, 32)),
        "betas": jnp.zeros((1, 10)),
        "orient": jnp.zeros((B, 3)),
        "trans": jnp.zeros((B, 3)),
    }
    if init:
        params0.update({k: jnp.asarray(v) for k, v in init.items()})

    def joints_of(p):
        dec = vposer_decode(vposer, p["z"])
        pose63 = dec["pose_body"].reshape(B, 63)
        full = jnp.concatenate([pose63, jnp.zeros((B, 6))], axis=1)
        rot = batch_rodrigues(full.reshape(B, 23, 3))
        orient = batch_rodrigues(p["orient"].reshape(B, 1, 3))
        _, j = smpl_forward(smpl, p["betas"], rot, orient,
                            want_vertices=False, transl=p["trans"])
        return j, pose63

    def loss_fn(p):
        j, _ = joints_of(p)
        data = (joint_mask[..., None] * (j - target_joints) ** 2).sum(-1)
        loss = cfg.data_weight * data.mean()
        loss = loss + cfg.z_weight * (p["z"] ** 2).mean()
        loss = loss + cfg.betas_weight * (p["betas"] ** 2).mean()
        return loss

    if cfg.optimizer == "lbfgs":
        opt = optax.lbfgs()
        value_and_grad = optax.value_and_grad_from_state(loss_fn)

        def step(carry, _):
            p, state = carry
            loss, g = value_and_grad(p, state=state)
            upd, state = opt.update(g, state, p, value=loss, grad=g,
                                    value_fn=loss_fn)
            return (optax.apply_updates(p, upd), state), loss
    else:
        opt = optax.adam(cfg.lr)

        def step(carry, _):
            p, state = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            upd, state = opt.update(g, state)
            return (optax.apply_updates(p, upd), state), loss

    (params, _), losses = jax.lax.scan(
        step, (params0, opt.init(params0)), None, length=cfg.num_steps)

    joints, pose63 = joints_of(params)
    return {**params, "pose_body": pose63, "joints": joints, "loss": losses}
