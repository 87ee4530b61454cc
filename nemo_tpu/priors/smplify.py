"""SMPLify: classic single-frame SMPL fitting (losses + optimizer loop).

Behavioral reference: hmr/smplify/losses.py:11-96 (gmof robustifier,
angle prior, body_fitting_loss, camera_fitting_loss) and the SMPLify stage
used for the VIBE+SMPLify baseline. The optimization loop here is the
TPU-native equivalent: optax Adam under one jitted lax.scan per stage
instead of torch closures.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..body import constants
from ..body.smpl import SMPLModel, smpl_forward
from ..geometry.camera import perspective_projection
from ..geometry.rotations import batch_rodrigues
from .gmm import GMMPrior, gmm_log_likelihood
from .robustifiers import angle_prior, gmof


def smplify_body_fitting_loss(body_pose: jnp.ndarray, betas: jnp.ndarray,
                              model_joints: jnp.ndarray,
                              camera_t: jnp.ndarray,
                              camera_center: jnp.ndarray,
                              joints_2d: jnp.ndarray,
                              joints_conf: jnp.ndarray,
                              pose_prior: GMMPrior,
                              focal_length: float = 5000.0,
                              sigma: float = 100.0,
                              pose_prior_weight: float = 4.78,
                              shape_prior_weight: float = 5.0,
                              angle_prior_weight: float = 15.2
                              ) -> jnp.ndarray:
    """body_fitting_loss (losses.py:27-58): robust reprojection +
    GMM/angle/shape priors; identity camera rotation."""
    B = body_pose.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    proj = perspective_projection(model_joints, eye, camera_t,
                                  focal_length, camera_center)
    reproj = gmof(proj - joints_2d, rho=sigma)
    reproj_loss = ((joints_conf ** 2) * reproj.sum(-1)).sum(-1)

    prior_loss = (pose_prior_weight ** 2) * gmm_log_likelihood(
        pose_prior, body_pose)
    ang_loss = (angle_prior_weight ** 2) * angle_prior(body_pose).sum(-1)
    shape_loss = (shape_prior_weight ** 2) * (betas ** 2).sum(-1)
    return (reproj_loss + prior_loss + ang_loss + shape_loss).sum()


_TORSO_OP = [constants.JOINT_IDS[j] for j in
             ("OP RHip", "OP LHip", "OP RShoulder", "OP LShoulder")]
_TORSO_GT = [constants.JOINT_IDS[j] for j in
             ("Right Hip", "Left Hip", "Right Shoulder", "Left Shoulder")]


def smplify_camera_fitting_loss(model_joints: jnp.ndarray,
                                camera_t: jnp.ndarray,
                                camera_t_est: jnp.ndarray,
                                camera_center: jnp.ndarray,
                                joints_2d: jnp.ndarray,
                                joints_conf: jnp.ndarray,
                                focal_length: float = 5000.0,
                                depth_loss_weight: float = 100.0
                                ) -> jnp.ndarray:
    """camera_fitting_loss (losses.py:61-96): torso-joint reprojection with
    an OP-vs-GT validity switch + depth anchor."""
    B = model_joints.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    proj = perspective_projection(model_joints, eye, camera_t,
                                  focal_length, camera_center)
    err_op = (joints_2d[:, _TORSO_OP] - proj[:, _TORSO_OP]) ** 2
    err_gt = (joints_2d[:, _TORSO_GT] - proj[:, _TORSO_GT]) ** 2
    is_valid = (joints_conf[:, _TORSO_OP].min(axis=-1) > 0
                ).astype(proj.dtype)[:, None, None]
    reproj = (is_valid * err_op + (1 - is_valid) * err_gt).sum(axis=(1, 2))
    depth = (depth_loss_weight ** 2) * (camera_t[:, 2] - camera_t_est[:, 2]) ** 2
    return (reproj + depth).sum()


def smplify_fit(smpl: SMPLModel, pose_prior: GMMPrior,
                init_pose: jnp.ndarray, init_betas: jnp.ndarray,
                init_cam_t: jnp.ndarray, camera_center: jnp.ndarray,
                keypoints_2d: jnp.ndarray,
                focal_length: float = 5000.0,
                num_iters: int = 100,
                lr: float = 1e-2,
                ) -> Dict[str, jnp.ndarray]:
    """Two-stage SMPLify: camera translation, then body pose/shape.

    The reference runs torch Adam closures per stage; here each stage is one
    jitted lax.scan. init_pose: (B, 72) axis-angle (orient + body).
    Returns refined {'pose', 'betas', 'cam_t', 'loss'}.
    """
    joints_2d = keypoints_2d[..., :2]
    conf = keypoints_2d[..., 2]

    def model_joints_of(pose72, betas):
        rot = batch_rodrigues(pose72.reshape(-1, 24, 3))
        _, j = smpl_forward(smpl, betas, rot[:, 1:], rot[:, :1],
                            want_vertices=False)
        return j

    # ---- stage 1: camera translation ----
    cam_opt = optax.adam(lr)

    def cam_loss(cam_t):
        j = model_joints_of(init_pose, init_betas)
        return smplify_camera_fitting_loss(
            j, cam_t, init_cam_t, camera_center, joints_2d, conf,
            focal_length)

    def cam_step(carry, _):
        cam_t, state = carry
        loss, g = jax.value_and_grad(cam_loss)(cam_t)
        upd, state = cam_opt.update(g, state)
        return (optax.apply_updates(cam_t, upd), state), loss

    (cam_t, _), _ = jax.lax.scan(
        cam_step, (init_cam_t, cam_opt.init(init_cam_t)), None,
        length=num_iters)

    # ---- stage 2: pose + betas (camera fixed) ----
    body_opt = optax.adam(lr)
    params0 = {"pose": init_pose, "betas": init_betas}

    def body_loss(p):
        j = model_joints_of(p["pose"], p["betas"])
        return smplify_body_fitting_loss(
            p["pose"][:, 3:], p["betas"], j, cam_t, camera_center,
            joints_2d, conf, pose_prior, focal_length)

    def body_step(carry, _):
        p, state = carry
        loss, g = jax.value_and_grad(body_loss)(p)
        upd, state = body_opt.update(g, state)
        return (optax.apply_updates(p, upd), state), loss

    (params, _), losses = jax.lax.scan(
        body_step, (params0, body_opt.init(params0)), None,
        length=num_iters)

    return {"pose": params["pose"], "betas": params["betas"],
            "cam_t": cam_t, "loss": losses[-1]}
