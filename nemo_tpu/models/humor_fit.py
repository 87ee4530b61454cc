"""HuMoR test-time motion optimization (MotionOptimizer).

Behavioral reference: humor/humor/fitting/motion_optimizer.py:29-1139 — the
3-stage fitting schedule used for the HuMoR baselines:

  stage 1: global orientation + translation vs 2D keypoints
  stage 2: + SMPL pose sequence (smoothness-regularized)
  stage 3: re-parameterize the motion as (initial state, latent sequence z)
           of the CVAE and optimize in latent space, decoding with roll_out

and humor/humor/fitting/fitting_loss.py (2D reprojection + prior terms).

TPU-native: each stage is one jitted lax.scan of Adam steps; stage 3
backprops through the scan-based roll_out.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..body.smpl import SMPLModel, smpl_forward
from ..geometry.camera import perspective_projection
from ..geometry.rotations import batch_rodrigues
from ..priors.robustifiers import gmof
from .humor import (HumorConfig, Params, STATE_DIM, humor_roll_out,
                    pack_state, split_state)


@dataclasses.dataclass(frozen=True)
class MotionOptConfig:
    steps_stage1: int = 30
    steps_stage2: int = 80
    steps_stage3: int = 70
    lr: float = 1e-2
    rho: float = 100.0
    smooth_weight: float = 100.0
    motion_prior_weight: float = 1e-2
    joint_consistency_weight: float = 100.0


def _reproj_loss(joints3d, cam_t, cam_center, focal, kp2d, rho):
    B = joints3d.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    proj = perspective_projection(joints3d, eye,
                                  jnp.broadcast_to(cam_t, (B, 3)),
                                  focal, jnp.broadcast_to(cam_center, (B, 2)))
    conf = kp2d[..., 2:]
    return (conf * gmof(proj - kp2d[..., :2], rho=rho)).sum(-1).mean()


def _run_adam(loss_fn, params0, steps, lr):
    opt = optax.adam(lr)

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s)
        return (optax.apply_updates(p, u), s), loss

    (p, _), losses = jax.lax.scan(step, (params0, opt.init(params0)), None,
                                  length=steps)
    return p, losses


def humor_motion_fit(smpl: SMPLModel, humor_params: Params,
                     humor_cfg: HumorConfig,
                     kp2d: jnp.ndarray,
                     init_pose: jnp.ndarray,
                     cam_t: jnp.ndarray,
                     cam_center: jnp.ndarray,
                     focal_length: float = 5000.0,
                     cfg: MotionOptConfig = MotionOptConfig(),
                     key=None) -> Dict[str, jnp.ndarray]:
    """Fit a motion of T frames to 2D keypoints with the HuMoR prior.

    Args:
      kp2d: (T, 25, 3) keypoints + confidence (OP-25 subset of the 49).
      init_pose: (T, 72) per-frame initializer (e.g. VIBE).
      cam_t: (3,) camera translation; identity rotation (HuMoR convention).
    Returns dict with fitted 'pose' (T, 72), 'trans' (T, 3), 'z' latents,
    per-stage loss histories.
    """
    T = kp2d.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    proj_idx = jnp.arange(25)

    def joints_of(pose72, trans):
        rot = batch_rodrigues(pose72.reshape(T, 24, 3))
        _, j = smpl_forward(smpl, jnp.zeros((1, 10)), rot[:, 1:], rot[:, :1],
                            want_vertices=False, transl=trans)
        return j[:, proj_idx]

    # ---- stage 1: root orient + trans ----
    s1_0 = {"orient": init_pose[:, :3], "trans": jnp.zeros((T, 3))}

    def s1_loss(p):
        pose = jnp.concatenate([p["orient"], init_pose[:, 3:]], axis=1)
        j = joints_of(pose, p["trans"])
        return _reproj_loss(j, cam_t, cam_center, focal_length, kp2d, cfg.rho)

    s1, l1 = _run_adam(s1_loss, s1_0, cfg.steps_stage1, cfg.lr)

    # ---- stage 2: full pose sequence + smoothness ----
    s2_0 = {"pose": jnp.concatenate([s1["orient"], init_pose[:, 3:]], axis=1),
            "trans": s1["trans"]}

    def s2_loss(p):
        j = joints_of(p["pose"], p["trans"])
        data = _reproj_loss(j, cam_t, cam_center, focal_length, kp2d, cfg.rho)
        smooth = ((p["pose"][1:] - p["pose"][:-1]) ** 2).mean() + \
                 ((p["trans"][1:] - p["trans"][:-1]) ** 2).mean()
        return data + cfg.smooth_weight * smooth

    s2, l2 = _run_adam(s2_loss, s2_0, cfg.steps_stage2, cfg.lr)

    # ---- stage 3: latent-space motion (initial state + z sequence) ----
    # Build the initial HuMoR state from the stage-2 result.
    def state_from(pose72, trans, prev_pose72, prev_trans):
        rot = batch_rodrigues(pose72.reshape(1, 24, 3))
        _, j = smpl_forward(smpl, jnp.zeros((1, 10)), rot[:, 1:], rot[:, :1],
                            want_vertices=False, transl=trans[None])
        j22 = j[0, :22].reshape(-1)
        prev_rot = batch_rodrigues(prev_pose72.reshape(1, 24, 3))
        _, jp = smpl_forward(smpl, jnp.zeros((1, 10)), prev_rot[:, 1:],
                             prev_rot[:, :1], want_vertices=False,
                             transl=prev_trans[None])
        return pack_state({
            "trans": trans,
            "trans_vel": trans - prev_trans,
            "root_orient": pose72[:3],
            "root_orient_vel": pose72[:3] - prev_pose72[:3],
            "pose_body": pose72[3:66],
            "joints": j22,
            "joints_vel": j22 - jp[0, :22].reshape(-1),
        })

    x0 = state_from(s2["pose"][0], s2["trans"][0],
                    s2["pose"][0], s2["trans"][0])[None]
    s3_0 = {"x0": x0, "z": jnp.zeros((1, T - 1, humor_cfg.latent_size))}

    def decode_motion(p):
        out = humor_roll_out(humor_params, humor_cfg, p["x0"], T - 1,
                             z_seq=p["z"])
        states = jnp.concatenate([p["x0"][:, None], out["states"]], axis=1)[0]
        d = split_state(states)
        pose = jnp.concatenate(
            [d["root_orient"], d["pose_body"], jnp.zeros((T, 6))], axis=1)
        return pose, d["trans"], states

    def s3_loss(p):
        pose, trans, states = decode_motion(p)
        j = joints_of(pose, trans)
        data = _reproj_loss(j, cam_t, cam_center, focal_length, kp2d, cfg.rho)
        prior = (p["z"] ** 2).mean()
        # regressed-joint consistency: packed joints must match FK joints
        rot = batch_rodrigues(pose.reshape(T, 24, 3))
        _, j_fk = smpl_forward(smpl, jnp.zeros((1, 10)), rot[:, 1:],
                               rot[:, :1], want_vertices=False, transl=trans)
        d = split_state(states)
        consist = ((d["joints"].reshape(T, 22, 3)
                    - j_fk[:, :22]) ** 2).mean()
        return (data + cfg.motion_prior_weight * prior
                + cfg.joint_consistency_weight * consist)

    s3, l3 = _run_adam(s3_loss, s3_0, cfg.steps_stage3, cfg.lr)
    pose, trans, _ = decode_motion(s3)

    return {"pose": pose, "trans": trans, "z": s3["z"][0],
            "stage1_loss": l1, "stage2_loss": l2, "stage3_loss": l3,
            "stage2_pose": s2["pose"], "stage2_trans": s2["trans"]}
