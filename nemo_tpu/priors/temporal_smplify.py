"""TemporalSMPLify: multi-frame SMPL refinement of VIBE predictions.

Behavioral reference: VIBE/lib/smplify/temporal_smplify.py:26-251 (the
two-stage fit with betas shared across the sequence),
VIBE/lib/smplify/losses.py:103-200 (temporal body/camera losses with the
2D/3D smoothness terms), and VIBE/lib/utils/demo_utils.py:91-167
(smplify_runner: weak-persp <-> full-camera conversion, best-frame betas
selection, per-frame accept mask).

TPU-native shape: the reference runs torch LBFGS closures per stage; here
each stage is ONE jitted lax.scan over optax.lbfgs (zoom linesearch)
iterations — static shapes, no host sync inside the fit. Betas are a
single (10,) leaf shared across frames (the reference broadcasts a
(1, 10) tensor via arrange_betas, temporal_smplify.py:15-24), so the
scan's grad accumulates the cross-frame coupling in one backward pass.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..body import constants
from ..body.smpl import SMPLModel, smpl_forward
from ..geometry.camera import perspective_projection
from ..geometry.rotations import batch_rodrigues
from .gmm import GMMPrior, gmm_log_likelihood
from .robustifiers import angle_prior, gmof
from .smplify import _TORSO_OP

# Joints excluded from the body-fitting stage
# (temporal_smplify.py:44-45): the hips/neck are unreliable in 2D.
IGN_JOINTS = [constants.JOINT_IDS[j] for j in
              ("OP Neck", "OP RHip", "OP LHip", "Right Hip", "Left Hip")]


def temporal_camera_fitting_loss(model_joints: jnp.ndarray,
                                 camera_t: jnp.ndarray,
                                 camera_t_est: jnp.ndarray,
                                 camera_center: jnp.ndarray,
                                 joints_2d: jnp.ndarray,
                                 joints_conf: jnp.ndarray,
                                 focal_length: float = 5000.0,
                                 depth_loss_weight: float = 100.0
                                 ) -> jnp.ndarray:
    """temporal_camera_fitting_loss (losses.py:170-200): OpenPose torso
    joints only (no GT fallback, unlike the single-frame variant) + depth
    anchor to the initial estimate."""
    B = model_joints.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    proj = perspective_projection(model_joints, eye, camera_t,
                                  focal_length, camera_center)
    err_op = (joints_2d[:, _TORSO_OP] - proj[:, _TORSO_OP]) ** 2
    is_valid = (joints_conf[:, _TORSO_OP].min(axis=-1) > 0
                ).astype(proj.dtype)[:, None, None]
    reproj = (is_valid * err_op).sum(axis=(1, 2))
    depth = (depth_loss_weight ** 2) * (camera_t[:, 2]
                                        - camera_t_est[:, 2]) ** 2
    return (reproj + depth).sum()


def temporal_body_fitting_loss(body_pose: jnp.ndarray, betas: jnp.ndarray,
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
                               angle_prior_weight: float = 15.2,
                               smooth_2d_weight: float = 0.01,
                               smooth_3d_weight: float = 1.0,
                               output: str = "sum") -> jnp.ndarray:
    """temporal_body_fitting_loss (losses.py:103-167): the single-frame
    body loss plus L1 frame-difference smoothness on projected 2D joints
    (weight 0.01^2) and 3D joints (weight 1.0^2), both gated by the NEXT
    frame's squared confidence with a zero row prepended.

    output='reprojection' returns the per-frame, per-joint conf^2-weighted
    GMoF reprojection term (B, J) — what smplify_runner thresholds on.
    """
    B = body_pose.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    proj = perspective_projection(model_joints, eye, camera_t,
                                  focal_length, camera_center)
    reproj = gmof(proj - joints_2d, rho=sigma)
    reproj_loss = (joints_conf ** 2) * reproj.sum(-1)          # (B, J)
    if output == "reprojection":
        return reproj_loss

    prior_loss = (pose_prior_weight ** 2) * gmm_log_likelihood(
        pose_prior, body_pose)
    ang_loss = (angle_prior_weight ** 2) * angle_prior(body_pose).sum(-1)
    shape_loss = (shape_prior_weight ** 2) * (betas ** 2).sum(-1)
    total = reproj_loss.sum(-1) + prior_loss + ang_loss + shape_loss

    # Frame-difference smoothness (losses.py:137-155). The reference's
    # torch.cat([zeros(1, J), diff]) prepend is a pad here; conf gate is
    # conf[1:] (the later frame of each pair).
    conf_d = joints_conf[1:] ** 2                              # (B-1, J)
    j2d_d = jnp.abs(proj[1:] - proj[:-1]).sum(-1)              # (B-1, J)
    j3d_d = jnp.abs(model_joints[1:] - model_joints[:-1]).sum(-1)
    zero = jnp.zeros((1,), total.dtype)
    smooth_2d = (smooth_2d_weight ** 2) * jnp.concatenate(
        [zero, (conf_d * j2d_d).sum(-1)])
    smooth_3d = (smooth_3d_weight ** 2) * jnp.concatenate(
        [zero, (conf_d * j3d_d).sum(-1)])
    return (total + smooth_2d + smooth_3d).sum()


def _lbfgs_scan(loss_fn, params, n_steps: int):
    """n_steps optax.lbfgs iterations (zoom linesearch) as one scan —
    the compiled counterpart of torch LBFGS(strong_wolfe) closures
    (temporal_smplify.py:96-115)."""
    opt = optax.lbfgs()
    vg = optax.value_and_grad_from_state(loss_fn)

    def step(carry, _):
        p, state = carry
        loss, g = vg(p, state=state)
        upd, state = opt.update(g, state, p, value=loss, grad=g,
                                value_fn=loss_fn)
        return (optax.apply_updates(p, upd), state), loss

    (params, _), losses = jax.lax.scan(step, (params, opt.init(params)),
                                       None, length=n_steps)
    return params, losses


def temporal_smplify_fit(smpl: SMPLModel, pose_prior: GMMPrior,
                         init_pose: jnp.ndarray, init_betas: jnp.ndarray,
                         init_cam_t: jnp.ndarray,
                         camera_center: jnp.ndarray,
                         keypoints_2d: jnp.ndarray,
                         focal_length: float = 5000.0,
                         num_iters: int = 1,
                         max_iter: int = 20,
                         ) -> Dict[str, jnp.ndarray]:
    """Two-stage temporal fit (temporal_smplify.py:58-214).

    Stage 1 optimizes {global orient, camera translation} against the
    torso-only camera loss; stage 2 optimizes {body pose, global orient,
    shared betas} against the temporal body loss with IGN_JOINTS
    confidences zeroed. Each reference 'iteration' is one LBFGS.step with
    max_iter internal iterations, so the scan runs num_iters * max_iter
    linesearch steps.

    init_pose: (B, 72) axis-angle. init_betas: (10,) — ONE shape shared
    across the whole sequence. Returns refined pose/betas/cam_t, final
    vertices/joints, the per-frame reprojection loss (B, J), and the
    weak-perspective camera the VIBE pickle format carries.
    """
    joints_2d = keypoints_2d[..., :2]
    conf = keypoints_2d[..., 2]
    B = init_pose.shape[0]

    def fwd(orient, body, betas10, want_vertices=False):
        pose = jnp.concatenate([orient, body], axis=-1)
        rot = batch_rodrigues(pose.reshape(-1, 24, 3))
        # betas are SHARED across the sequence (arrange_betas with
        # num_video=1) — exactly the (1, 10) contract of the fused
        # joints-only FK path; the vertices path wants per-frame betas
        betas = (jnp.broadcast_to(betas10[None], (B, betas10.shape[0]))
                 if want_vertices else betas10[None])
        return smpl_forward(smpl, betas, rot[:, 1:], rot[:, :1],
                            want_vertices=want_vertices)

    orient0 = init_pose[:, :3]
    body0 = init_pose[:, 3:]
    n_steps = num_iters * max_iter

    # ---- stage 1: camera translation + global orientation ----
    def cam_loss(p):
        _, j = fwd(p["orient"], body0, init_betas)
        return temporal_camera_fitting_loss(
            j, p["cam_t"], init_cam_t, camera_center, joints_2d, conf,
            focal_length)

    cam_p, _ = _lbfgs_scan(cam_loss,
                           {"orient": orient0, "cam_t": init_cam_t},
                           n_steps)
    cam_t = cam_p["cam_t"]

    # ---- stage 2: body pose + shared betas + orientation ----
    conf_body = conf.at[:, jnp.asarray(IGN_JOINTS)].set(0.0)

    def body_loss(p):
        _, j = fwd(p["orient"], p["body"], p["betas"])
        return temporal_body_fitting_loss(
            p["body"], p["betas"][None], j, cam_t, camera_center,
            joints_2d, conf_body, pose_prior, focal_length)

    body_p, losses = _lbfgs_scan(
        body_loss,
        {"orient": cam_p["orient"], "body": body0, "betas": init_betas},
        n_steps)

    verts, joints = fwd(body_p["orient"], body_p["body"], body_p["betas"],
                        want_vertices=True)
    reproj = temporal_body_fitting_loss(
        body_p["body"], body_p["betas"][None], joints, cam_t,
        camera_center, joints_2d, conf_body, pose_prior, focal_length,
        output="reprojection")

    # Back to the crop-frame weak-perspective cam the pickle stores
    # (temporal_smplify.py:201-205): s = 2f / (224 * tz).
    weak_cam = jnp.stack([
        2.0 * focal_length / (224.0 * cam_t[:, 2] + 1e-9),
        cam_t[:, 0], cam_t[:, 1]], axis=-1)

    return {"pose": jnp.concatenate([body_p["orient"], body_p["body"]],
                                    axis=-1),
            "betas": body_p["betas"], "cam_t": cam_t,
            "weak_cam": weak_cam, "verts": verts, "joints": joints,
            "reproj_loss": reproj, "losses": losses}


def get_fitting_loss(smpl: SMPLModel, pose_prior: GMMPrior,
                     pose: jnp.ndarray, betas: jnp.ndarray,
                     cam_t: jnp.ndarray, camera_center: jnp.ndarray,
                     keypoints_2d: jnp.ndarray,
                     focal_length: float = 5000.0) -> jnp.ndarray:
    """Pre-fit per-frame reprojection loss (temporal_smplify.py:217-251):
    conf^2-weighted GMoF on the CURRENT prediction with IGN_JOINTS zeroed.
    pose: (B, 72), betas: (B, 10). Returns (B, J)."""
    joints_2d = keypoints_2d[..., :2]
    conf = keypoints_2d[..., 2].at[:, jnp.asarray(IGN_JOINTS)].set(0.0)
    rot = batch_rodrigues(pose.reshape(-1, 24, 3))
    # per-frame betas here (the network's own per-frame predictions), so
    # the full LBS path, not the shared-betas joints-only one
    _, joints = smpl_forward(smpl, betas, rot[:, 1:], rot[:, :1],
                             want_vertices=True)
    return temporal_body_fitting_loss(
        pose[:, 3:], betas, joints, cam_t, camera_center, joints_2d,
        conf, pose_prior, focal_length, output="reprojection")


def run_temporal_smplify(smpl: SMPLModel, pose_prior: GMMPrior,
                         pred_pose: jnp.ndarray, pred_betas: jnp.ndarray,
                         pred_cam: jnp.ndarray, j2d: jnp.ndarray,
                         focal_length: float = 5000.0,
                         crop_size: float = 224.0,
                         opt_steps: int = 1,
                         max_iter: int = 20
                         ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """smplify_runner (demo_utils.py:91-167): weak-persp -> full camera,
    betas pinned to the best pre-fit frame, temporal fit, per-frame accept
    mask where the refined reprojection loss improves.

    pred_pose: (B, 72) aa. pred_cam: (B, 3) crop-frame weak persp
    (s, tx, ty). j2d: (B, 49, 3) keypoints in crop pixel coords.
    Returns (refined dict, update mask (B,) bool).
    """
    B = pred_pose.shape[0]
    cam_t = jnp.stack([
        pred_cam[:, 1], pred_cam[:, 2],
        2.0 * focal_length / (crop_size * pred_cam[:, 0] + 1e-9)],
        axis=-1)
    center = jnp.full((B, 2), 0.5 * crop_size, pred_pose.dtype)

    pre_loss = get_fitting_loss(smpl, pose_prior, pred_pose, pred_betas,
                                cam_t, center, j2d,
                                focal_length).mean(-1)          # (B,)
    best = jnp.argmin(pre_loss)
    betas0 = pred_betas[best]                                   # (10,)

    out = temporal_smplify_fit(smpl, pose_prior, pred_pose, betas0,
                               cam_t, center, j2d, focal_length,
                               num_iters=opt_steps, max_iter=max_iter)
    new_loss = out["reproj_loss"].mean(-1)
    update = new_loss < pre_loss
    out["new_loss"] = new_loss
    out["pre_loss"] = pre_loss
    return out, update
