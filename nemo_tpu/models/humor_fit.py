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
import numpy as np
import optax

from ..body.smpl import SMPLModel, smpl_forward
from ..geometry.camera import perspective_projection
from ..geometry.rotations import batch_rodrigues
from ..priors.robustifiers import gmof
from .humor import (HumorConfig, Params, STATE_DIM, humor_roll_out,
                    pack_state, split_state)


@dataclasses.dataclass(frozen=True)
class MotionOptConfig:
    """Stage schedule + loss weights (defaults from the reference's
    fit_rgb_demo_no_split.cfg stage-3 column)."""
    steps_stage1: int = 30
    steps_stage2: int = 80
    steps_stage3: int = 70
    lr: float = 1e-2
    rho: float = 100.0
    smooth_weight: float = 100.0
    motion_prior_weight: float = 0.075
    joint_consistency_weight: float = 100.0
    shape_prior_weight: float = 0.05       # betas L2 (fitting_loss.py:444-448)
    bone_length_weight: float = 2000.0     # (:436-442)
    contact_vel_weight: float = 100.0      # (:450-458)
    contact_height_weight: float = 10.0    # (:460-469)
    floor_reg_weight: float = 0.167        # (:471-485)
    init_motion_prior_weight: float = 0.075  # init-state GMM NLL (cfg :26)
    contact_height_thresh: float = 0.08    # CONTACT_HEIGHT_THRESH (:18)
    # 3D observation energies (fitting_loss.py root_fit :94-125 /
    # smpl_fit :204-208 / motion_fit :271-276) — active per obs3d keys
    joints3d_weight: float = 0.0           # masked L2 vs obs joints (:360-364)
    verts3d_weight: float = 0.0            # masked L2 vs obs markers (:372-376)
    points3d_weight: float = 0.0           # one-way chamfer to scan (:378-396)
    joints3d_rollout_weight: float = 0.0   # obs joints vs rollout (:271-276)
    joints3d_smooth_weight: float = 0.0    # joint delta smoothness (:366-370)
    robust_loss: str = "bisquare"          # points3d robustifier (:393-395)
    robust_tuning_const: float = 4.6851
    kp2d_weight: float = 1.0               # joint2d-weight (fit_proxd.cfg
    #                                        runs 0.001 next to points3d 1.0)
    optimize_camera: bool = False          # learn cam rotation + translation
    # 'adam' | 'lbfgs' — the reference optimizes every stage with
    # torch.optim.LBFGS closures (motion_optimizer.py:233-285); lbfgs here
    # is optax.lbfgs + linesearch inside the same jitted scan
    optimizer: str = "adam"


# SMPL joints predicted as contacts by HuMoR: hips, knees, ankles, toes,
# hands (amass_utils.py:22-23 CONTACT_ORDERING -> SMPL joint ids)
CONTACT_INDS = (0, 4, 5, 7, 8, 10, 11, 20, 21)


def _reproj_loss(joints3d, cam_t, cam_center, focal, kp2d, rho,
                 cam_R=None):
    B = joints3d.shape[0]
    if cam_R is None:
        cam_R = jnp.eye(3)
    cam_R = jnp.broadcast_to(cam_R, (B, 3, 3))
    proj = perspective_projection(joints3d, cam_R,
                                  jnp.broadcast_to(cam_t, (B, 3)),
                                  focal, jnp.broadcast_to(cam_center, (B, 2)))
    conf = kp2d[..., 2:]
    return (conf * gmof(proj - kp2d[..., :2], rho=rho)).sum(-1).mean()


def _floor_height(points: jnp.ndarray, floor: jnp.ndarray) -> jnp.ndarray:
    """Signed distance of (..., 3) points above the plane encoded as
    normal*offset (fitting_loss.py floor convention :471-485)."""
    norm = jnp.sqrt((floor ** 2).sum() + 1e-12)
    return (points @ floor) / norm - norm


def masked_l2_loss(obs: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """joints3d/verts3d observation loss (fitting_loss.py:360-364,
    372-376): 0.5 * sum of squared error over the finite obs entries —
    non-finite obs marks occluded data (get_visible_mask :311-315)."""
    vis = jnp.isfinite(obs)
    diff = jnp.where(vis, obs, 0.0) - jnp.where(vis, pred, 0.0)
    return 0.5 * (diff ** 2).sum()


def joints3d_smooth_loss(pred: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum of squared per-frame joint deltas
    (fitting_loss.py:366-370); pred (T, J, 3)."""
    return 0.5 * ((pred[1:] - pred[:-1]) ** 2).sum()


def points3d_loss(obs_pts: jnp.ndarray, pred_verts: jnp.ndarray,
                  robust_loss: str = "bisquare",
                  tune_const: float = 4.6851) -> jnp.ndarray:
    """One-way scan->mesh chamfer with robust weighting
    (fitting_loss.py:378-396): min squared distance from each observed
    point to the predicted vertex set, sqrt'd, Tukey-bisquare weighted on
    the detached residuals, then 0.5 * sum of the weighted squares.
    obs_pts (T, N, 3), pred_verts (T, V, 3)."""
    from ..ops.chamfer import chamfer_distance

    sq = jax.vmap(lambda o, v: chamfer_distance(o, v)[0])(
        obs_pts, pred_verts)                            # (T, N)
    res = jnp.sqrt(sq + 1e-12).reshape(1, -1)           # (1, T*N)
    weighted, _ = apply_robust_weighting(res, robust_loss, tune_const)
    return 0.5 * weighted.sum()


def _run_opt(loss_fn, params0, steps, lr, optimizer="adam"):
    """One jitted scan of optimizer steps: Adam, or optax.lbfgs with its
    zoom linesearch (the compiled counterpart of the reference's
    torch.optim.LBFGS closure loops, motion_optimizer.py:233-285)."""
    if optimizer == "lbfgs":
        opt = optax.lbfgs()
        value_and_grad = optax.value_and_grad_from_state(loss_fn)

        def step(carry, _):
            p, s = carry
            loss, g = value_and_grad(p, state=s)
            u, s = opt.update(g, s, p, value=loss, grad=g,
                              value_fn=loss_fn)
            return (optax.apply_updates(p, u), s), loss
    else:
        opt = optax.adam(lr)

        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s)
            return (optax.apply_updates(p, u), s), loss

    (p, _), losses = jax.lax.scan(step, (params0, opt.init(params0)), None,
                                  length=steps)
    return p, losses


def _run_adam(loss_fn, params0, steps, lr):
    return _run_opt(loss_fn, params0, steps, lr, optimizer="adam")


def load_init_motion_prior(path: str) -> Dict[str, jnp.ndarray]:
    """Load the init-state GMM (prior_gmm.npz: weights (K,), means (K, D),
    covariances (K, D, D); D=138 = joints66 + joints_vel66 + trans_vel3 +
    root_orient_vel3), the format train_state_prior.py:123 writes and
    run_fitting.py:252-262 loads. Cholesky factors precomputed host-side."""
    import os.path as osp

    f = path if path.endswith(".npz") else osp.join(path, "prior_gmm.npz")
    data = np.load(f)
    covs = np.asarray(data["covariances"], np.float64)
    chol = np.linalg.cholesky(covs)
    logdet = 2.0 * np.log(np.diagonal(chol, axis1=1, axis2=2)).sum(1)
    return {"log_weights": jnp.log(jnp.asarray(data["weights"])),
            "means": jnp.asarray(data["means"], jnp.float32),
            "chol": jnp.asarray(chol, jnp.float32),
            "logdet": jnp.asarray(logdet, jnp.float32)}


def init_state_gmm_nll(state: jnp.ndarray,
                       prior: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """-log p(state) under the full-covariance GMM
    (fitting_loss.py:416-429 init_motion_prior_loss); state (D,)."""
    diff = state[None] - prior["means"]                     # (K, D)
    y = jax.scipy.linalg.solve_triangular(
        prior["chol"], diff[..., None], lower=True)[..., 0]  # (K, D)
    d = state.shape[-1]
    comp = (prior["log_weights"]
            - 0.5 * (d * jnp.log(2 * jnp.pi) + prior["logdet"]
                     + (y ** 2).sum(-1)))
    return -jax.scipy.special.logsumexp(comp)


def humor_motion_fit(smpl: SMPLModel, humor_params: Params,
                     humor_cfg: HumorConfig,
                     kp2d: Optional[jnp.ndarray],
                     init_pose: jnp.ndarray,
                     cam_t: jnp.ndarray,
                     cam_center: jnp.ndarray,
                     focal_length: float = 5000.0,
                     cfg: MotionOptConfig = MotionOptConfig(),
                     init_motion_prior: Optional[Dict[str, jnp.ndarray]]
                     = None,
                     obs3d: Optional[Dict[str, jnp.ndarray]] = None,
                     key=None) -> Dict[str, jnp.ndarray]:
    """Fit a motion of T frames to 2D keypoints with the HuMoR prior.

    Args:
      kp2d: (T, 25, 3) keypoints + confidence (OP-25 subset of the 49),
        or None for 3D-only fitting (AMASS / RGB-D without 2D).
      init_pose: (T, 72) per-frame initializer (e.g. VIBE).
      cam_t: (3,) camera translation; identity rotation (HuMoR convention).
      init_motion_prior: optional init-state GMM (load_init_motion_prior);
        adds cfg.init_motion_prior_weight * NLL(x0 state) in stage 3, the
        custom entry's --init-motion-prior (fitting config.py:104,
        fit_rgb_demo cfg stage-3 weight 0.075).
      obs3d: optional 3D observations (fitting_loss.py root_fit :94-125),
        each active when its cfg weight > 0:
          'joints3d'  (T, 22, 3) SMPL-tree joints, non-finite = occluded;
          'verts3d'   (T, K, 3) markers at 'verts3d_inds' (np int array,
                      default the KEYPT_VERTS rows of the full mesh);
          'points3d'  (T, N, 3) per-frame body scan (PROX depth
                      back-projection, prox_dataset.py:320-349) — one-way
                      chamfer to ALL vertices (motion_optimizer.py:1117);
          'floor_plane' (3,) observed normal*offset plane (PlaneRCNN /
                      PROX) — initializes the stage-3 floor and anchors
                      floor_reg (motion_optimizer.py:142-149).
        With points3d, stage-1 trans is initialized at the per-frame point
        cloud mean (motion_optimizer.py:152-156).
    Returns dict with fitted 'pose' (T, 72), 'trans' (T, 3), 'z' latents,
    per-stage loss histories.
    """
    T = kp2d.shape[0] if kp2d is not None else init_pose.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    proj_idx = jnp.arange(25)

    def joints_of(pose72, trans, betas=None):
        rot = batch_rodrigues(pose72.reshape(T, 24, 3))
        b = jnp.zeros((1, 10)) if betas is None else betas.reshape(1, 10)
        _, j = smpl_forward(smpl, b, rot[:, 1:], rot[:, :1],
                            want_vertices=False, transl=trans)
        return j[:, proj_idx]

    def verts_of(pose72, trans, betas=None):
        rot = batch_rodrigues(pose72.reshape(-1, 24, 3))
        b = jnp.zeros((1, 10)) if betas is None else betas.reshape(1, 10)
        v, _ = smpl_forward(smpl, b, rot[:, 1:], rot[:, :1],
                            want_vertices=True, transl=trans)
        return v

    def fk22(pose72, trans, betas):
        rot = batch_rodrigues(pose72.reshape(-1, 24, 3))
        _, _, jf = smpl_forward(smpl, betas.reshape(1, 10), rot[:, 1:],
                                rot[:, :1], want_vertices=False,
                                transl=trans.reshape(-1, 3),
                                want_fk_joints=True)
        return jf[:, :22]

    def obs3d_terms(pose72, trans, betas, joints22=None):
        """The 3D data losses of root_fit (fitting_loss.py:94-125),
        shared by all stages."""
        if obs3d is None:
            return 0.0
        loss = 0.0
        b = jnp.zeros(10) if betas is None else betas
        if "joints3d" in obs3d and cfg.joints3d_weight > 0:
            j22 = joints22 if joints22 is not None else fk22(pose72, trans, b)
            loss = loss + cfg.joints3d_weight * masked_l2_loss(
                obs3d["joints3d"], j22)
        want_verts = (("verts3d" in obs3d and cfg.verts3d_weight > 0)
                      or ("points3d" in obs3d and cfg.points3d_weight > 0))
        if want_verts:
            v = verts_of(pose72, trans, b)
            if "verts3d" in obs3d and cfg.verts3d_weight > 0:
                vi = obs3d.get("verts3d_inds")
                pred_m = v[:, vi] if vi is not None else v
                loss = loss + cfg.verts3d_weight * masked_l2_loss(
                    obs3d["verts3d"], pred_m)
            if "points3d" in obs3d and cfg.points3d_weight > 0:
                loss = loss + cfg.points3d_weight * points3d_loss(
                    obs3d["points3d"], v, cfg.robust_loss,
                    cfg.robust_tuning_const)
        return loss

    def reproj_or_zero(pose72, trans, betas, cam_R, cam_t_):
        if kp2d is None or cfg.kp2d_weight == 0.0:
            return 0.0
        j = joints_of(pose72, trans, betas)
        return cfg.kp2d_weight * _reproj_loss(
            j, cam_t_, cam_center, focal_length, kp2d, cfg.rho, cam_R=cam_R)

    # ---- stage 1: root orient + trans (+ optional camera) ----
    from ..geometry.rotations import rot6d_to_rotmat
    trans0 = (obs3d["points3d"].mean(axis=1)
              if obs3d is not None and "points3d" in obs3d
              else jnp.zeros((T, 3)))
    s1_0 = {"orient": init_pose[:, :3], "trans": trans0}
    if cfg.optimize_camera:
        s1_0["cam_rot6d"] = jnp.array([1., 0., 0., 1., 0., 0.])
        s1_0["cam_t"] = jnp.asarray(cam_t)

    def cam_of(p):
        if cfg.optimize_camera:
            return rot6d_to_rotmat(p["cam_rot6d"]), p["cam_t"]
        return None, cam_t

    def s1_loss(p):
        pose = jnp.concatenate([p["orient"], init_pose[:, 3:]], axis=1)
        R, t = cam_of(p)
        return (reproj_or_zero(pose, p["trans"], None, R, t)
                + obs3d_terms(pose, p["trans"], None))

    s1, l1 = _run_opt(s1_loss, s1_0, cfg.steps_stage1, cfg.lr,
                      cfg.optimizer)
    cam_R_fit, cam_t_fit = cam_of(s1)

    # ---- stage 2: full pose sequence + betas + smoothness ----
    # (motion_optimizer.py:275-283 optimizes trans/root_orient/betas/pose
    # with shape prior + joints3d smoothness)
    s2_0 = {"pose": jnp.concatenate([s1["orient"], init_pose[:, 3:]], axis=1),
            "trans": s1["trans"], "betas": jnp.zeros(10)}

    def s2_loss(p):
        data = reproj_or_zero(p["pose"], p["trans"], p["betas"],
                              cam_R_fit, cam_t_fit)
        data = data + obs3d_terms(p["pose"], p["trans"], p["betas"])
        smooth = ((p["pose"][1:] - p["pose"][:-1]) ** 2).mean() + \
                 ((p["trans"][1:] - p["trans"][:-1]) ** 2).mean()
        if cfg.joints3d_smooth_weight > 0:
            # smpl_fit's joints3d_smooth term (fitting_loss.py:204-208)
            data = data + cfg.joints3d_smooth_weight * joints3d_smooth_loss(
                fk22(p["pose"], p["trans"], p["betas"]))
        shape_prior = (p["betas"] ** 2).sum()
        return (data + cfg.smooth_weight * smooth
                + cfg.shape_prior_weight * shape_prior)

    s2, l2 = _run_opt(s2_loss, s2_0, cfg.steps_stage2, cfg.lr,
                      cfg.optimizer)
    betas_fit = s2["betas"]

    # ---- stage 3: latent-space motion (initial state + z sequence) ----
    # Build the initial HuMoR state from the stage-2 result; joints are the
    # true FK joints (SMPL tree order, world frame), like the reference's
    # body-model joints.
    def state_from(pose72, trans, prev_pose72, prev_trans):
        j22 = fk22(pose72, trans, betas_fit)[0].reshape(-1)
        jp = fk22(prev_pose72, prev_trans, betas_fit)[0].reshape(-1)
        return pack_state({
            "trans": trans,
            "trans_vel": trans - prev_trans,
            "root_orient": pose72[:3],
            "root_orient_vel": pose72[:3] - prev_pose72[:3],
            "pose_body": pose72[3:66],
            "joints": j22,
            "joints_vel": j22 - jp,
        })

    x0 = state_from(s2["pose"][0], s2["trans"][0],
                    s2["pose"][0], s2["trans"][0])[None]
    s3_0 = {"x0": x0, "z": jnp.zeros((1, T - 1, humor_cfg.latent_size))}

    # Floor plane (normal * offset, motion_optimizer.py:147-150): init from
    # the lowest stage-2 contact-joint height along +z, optimized in stage 3
    # when any floor/contact term is on.
    cid = jnp.asarray(CONTACT_INDS)
    j2 = fk22(s2["pose"], s2["trans"], betas_fit)       # (T, 22, 3)
    if obs3d is not None and "floor_plane" in obs3d:
        # observed plane: (a, b, c, d) as the datasets ship it, or the
        # optimization form normal*offset (3,). The reference initializes
        # AND regularizes against the observed plane
        # (motion_optimizer.py:142-149, fitting_loss.py:471-485).
        fp = jnp.asarray(obs3d["floor_plane"], jnp.float32).reshape(-1)
        floor0 = fp[:3] * fp[3] if fp.shape[0] == 4 else fp
    else:
        floor0 = jnp.array([0.0, 0.0, 1.0]) * (
            j2[:, cid, 2].min() + jnp.asarray(1e-3))
    use_floor = (cfg.contact_height_weight > 0 or cfg.floor_reg_weight > 0
                 ) and humor_cfg.pred_contacts
    if use_floor:
        s3_0["floor"] = floor0

    def decode_motion(p):
        out = humor_roll_out(humor_params, humor_cfg, p["x0"], T - 1,
                             z_seq=p["z"])
        states = jnp.concatenate([p["x0"][:, None], out["states"]], axis=1)[0]
        d = split_state(states)
        pose = jnp.concatenate(
            [d["root_orient"], d["pose_body"], jnp.zeros((T, 6))], axis=1)
        return pose, d["trans"], states, out

    def s3_loss(p):
        pose, trans, states, out = decode_motion(p)
        data = reproj_or_zero(pose, trans, betas_fit, cam_R_fit, cam_t_fit)
        data = data + obs3d_terms(pose, trans, betas_fit)
        # (joints3d_smooth is a stage-1/2 term only: every shipped config
        # zeroes its stage-3 column, fit_amass_keypts.cfg / fit_proxd.cfg)
        # motion prior: NLL of z under the rollout's conditional prior
        # (fitting_loss.py:404-414 motion_prior_loss with cond_prior)
        pm, pv = out["prior_mean"][0], out["prior_var"][0]
        z = p["z"][0]
        prior = (0.5 * (jnp.log(2 * jnp.pi * pv)
                        + (z - pm) ** 2 / pv)).sum(-1).mean()
        d = split_state(states)
        roll_j = d["joints"].reshape(T, 22, 3)
        if (obs3d is not None and "joints3d" in obs3d
                and cfg.joints3d_rollout_weight > 0):
            # rolled-out joints must match the observations too
            # (fitting_loss.py:271-276 joints3d_rollout)
            data = data + cfg.joints3d_rollout_weight * masked_l2_loss(
                obs3d["joints3d"], roll_j)
        # regressed-joint consistency (:431-434)
        j_fk = fk22(pose, trans, betas_fit)
        consist = ((roll_j - j_fk) ** 2).mean()
        # bone lengths constant across frames (:436-442)
        par = jnp.asarray(smpl.parents[1:22])
        bl = jnp.sqrt(((roll_j[:, 1:22] - roll_j[:, par]) ** 2).sum(-1)
                      + 1e-12)
        bone = ((bl[1:] - bl[:-1]) ** 2).mean()
        loss = (data + cfg.motion_prior_weight * prior
                + cfg.joint_consistency_weight * consist
                + cfg.bone_length_weight * bone)
        if init_motion_prior is not None:
            # GMM prior over [joints, joints_vel, trans_vel,
            # root_orient_vel] of the initial state (fitting_loss.py:
            # 416-429; stage-3 weight 0.075 in fit_rgb_demo cfg)
            d0 = split_state(p["x0"][0])
            init_state = jnp.concatenate(
                [d0["joints"], d0["joints_vel"], d0["trans_vel"],
                 d0["root_orient_vel"]], axis=-1).reshape(-1)
            loss = loss + cfg.init_motion_prior_weight * \
                init_state_gmm_nll(init_state, init_motion_prior)
        if humor_cfg.pred_contacts and (cfg.contact_vel_weight > 0
                                        or cfg.contact_height_weight > 0):
            conf = jax.nn.sigmoid(out["contacts"][0])       # (T-1, 9)
            cj = roll_j[:, cid]                              # (T, 9, 3)
            # velocity ~ 0 at contacts (:450-458)
            vel = ((cj[1:] - cj[:-1]) ** 2).sum(-1)
            loss = loss + cfg.contact_vel_weight * (vel * conf).mean()
            if use_floor:
                # contacting joints near the floor (:460-469)
                h = jnp.abs(_floor_height(cj[1:], p["floor"]))
                pen = jax.nn.relu(h - cfg.contact_height_thresh)
                loss = loss + cfg.contact_height_weight * (pen * conf).mean()
                # floor stays near its initialization (:471-485)
                loss = loss + cfg.floor_reg_weight * (
                    (p["floor"] - floor0) ** 2).sum()
        return loss

    s3, l3 = _run_opt(s3_loss, s3_0, cfg.steps_stage3, cfg.lr,
                      cfg.optimizer)
    pose, trans, _, _ = decode_motion(s3)

    out = {"pose": pose, "trans": trans, "z": s3["z"][0],
           "betas": betas_fit,
           "stage1_loss": l1, "stage2_loss": l2, "stage3_loss": l3,
           "stage2_pose": s2["pose"], "stage2_trans": s2["trans"]}
    if use_floor:
        out["floor"] = s3["floor"]
    if cfg.optimize_camera:
        out["cam_R"] = cam_R_fit
        out["cam_t"] = cam_t_fit
    return out


# --- fitting-frame + robust-weighting utilities --------------------------------
# (humor/humor/fitting/fitting_utils.py — the camera->prior canonical frame
# and the Tukey bisquare weighting run_fitting applies to RGB-D point-cloud
# residuals)

def bdot(a: jnp.ndarray, b: jnp.ndarray,
         keepdims: bool = False) -> jnp.ndarray:
    """Batched dot product over the last axis (fitting_utils.py:79-86)."""
    return (a * b).sum(-1, keepdims=keepdims)


def compute_plane_intersection(point: jnp.ndarray, direction: jnp.ndarray,
                               plane: jnp.ndarray):
    """Ray/plane intersection: returns (point + s * direction, s); s < 0
    means the -direction ray intersects (fitting_utils.py:61-77).
    point/direction: (B, 3); plane: (B, 4) [a, b, c, d]."""
    normal, off = plane[:, :3], plane[:, 3]
    s = (off - bdot(normal, point)) / bdot(normal, direction)
    return point + s[:, None] * direction, s


def parse_floor_plane(floor_plane: jnp.ndarray) -> jnp.ndarray:
    """Optimization-form floor plane (B, 3) [= normal * d] -> (B, 4)
    [a, b, c, d] with the normal facing up in the camera frame (-y up,
    so the y component must be non-positive) (fitting_utils.py:88-103)."""
    off = jnp.linalg.norm(floor_plane, axis=1, keepdims=True)
    normal = floor_plane / off
    neg = normal[:, 1:2] > 0.0
    normal = jnp.where(neg, -normal, normal)
    off = jnp.where(neg, -off, off)
    return jnp.concatenate([normal, off], axis=1)


def compute_cam2prior(floor_plane: jnp.ndarray, trans: jnp.ndarray,
                      root_orient: jnp.ndarray, joints: jnp.ndarray):
    """Rotation/translation from the camera frame to the canonical frame
    the motion/init-state priors were trained in: up = floor normal,
    right = body -x projected to the floor, fwd = up x right
    (fitting_utils.py:148-188). Returns (cam2prior_R (B, 3, 3),
    cam2prior_t (B, 3) [= -trans], root_height (B, 1))."""
    B = floor_plane.shape[0]
    plane4 = (parse_floor_plane(floor_plane)
              if floor_plane.shape[1] == 3 else floor_plane)
    normal = plane4[:, :3]
    floor_trans, _ = compute_plane_intersection(trans, -normal, plane4)

    root_mat = batch_rodrigues(root_orient)
    body_right = -root_mat[:, :, 0]
    floor_body_right, s = compute_plane_intersection(trans, body_right,
                                                     plane4)
    right = floor_body_right - floor_trans
    right = jnp.where(s[:, None] < 0, -right, right)
    right = right / jnp.linalg.norm(right, axis=1, keepdims=True)
    fwd = jnp.cross(normal, right)
    fwd = fwd / jnp.linalg.norm(fwd, axis=1, keepdims=True)

    prior_R = jnp.stack([right, fwd, normal], axis=2)
    cam2prior_R = jnp.swapaxes(prior_R, 1, 2)
    cam2prior_t = -trans
    _, s_root = compute_plane_intersection(joints[:, 0], -normal, plane4)
    return cam2prior_R, cam2prior_t, s_root.reshape(B, 1)


def _lower_median(x: jnp.ndarray) -> jnp.ndarray:
    """torch.median semantics: the LOWER of the two middle order statistics
    on even counts (np/jnp.median averages them instead)."""
    n = x.shape[-1]
    return jnp.sort(x, axis=-1)[..., (n - 1) // 2: (n - 1) // 2 + 1]


def robust_std(res: jnp.ndarray) -> jnp.ndarray:
    """Robust per-row std via median absolute deviation
    (fitting_utils.py:211-225; torch.median's lower-median tie rule).
    res: (B, N) -> (B, 1)."""
    med = _lower_median(res)
    mad = _lower_median(jnp.abs(res - med))
    return mad / 0.67449


def bisquare_robust_weights(res: jnp.ndarray,
                            tune_const: float = 4.6851) -> jnp.ndarray:
    """Tukey bisquare weights, zero outside the tuning radius
    (fitting_utils.py:230-249; like the reference, assumes non-negative
    residuals — run_fitting feeds point-cloud distances)."""
    norm_res = res / (robust_std(res) * tune_const)
    w = (1.0 - norm_res ** 2) ** 2
    return jnp.where(norm_res >= 1.0, 0.0, w)


def apply_robust_weighting(res: jnp.ndarray,
                           robust_loss_type: str = "bisquare",
                           robust_tuning_const: float = 4.6851):
    """Robustly weighted squared residuals (fitting_utils.py:190-209):
    weights are computed on detached residuals so no gradient flows
    through them. Returns (weighted squared residuals, weights)."""
    detached = jax.lax.stop_gradient(res)
    if robust_loss_type == "none":
        w = jnp.ones_like(detached)
    else:
        w = bisquare_robust_weights(detached, robust_tuning_const)
    return w * res ** 2, w


def apply_cam2prior(data_dict: Dict[str, jnp.ndarray], R: jnp.ndarray,
                    t: jnp.ndarray, root_height: jnp.ndarray,
                    body_pose: jnp.ndarray, betas: jnp.ndarray,
                    key_frame_idx: int, smpl_joints_fn,
                    inverse: bool = False) -> Dict[str, jnp.ndarray]:
    """Apply the camera->prior transform from compute_cam2prior to a
    {trans (B, T, 3), root_orient (B, T, 3)} motion — forward re-floors the
    trajectory so the key frame's root joint sits at root_height
    (fitting_utils.py:576-644).

    smpl_joints_fn(pose_body (B*T, 63), betas (B*T, nb), root_orient
    (B*T, 3), trans (B*T, 3)) -> joints (B*T, J, 3), used only in the
    forward direction for the floor offset (the reference runs its
    BodyModel there)."""
    from ..geometry.rotations import rotmat_to_aa

    prior: Dict[str, jnp.ndarray] = {}
    root_orient = data_dict["root_orient"]
    B, T, _ = root_orient.shape
    R_time = jnp.broadcast_to(R[:, None], (B, T, 3, 3))
    t_time = jnp.broadcast_to(t[:, None], (B, T, 3))
    ro_mat = batch_rodrigues(root_orient.reshape(-1, 3)).reshape(B, T, 3, 3)
    if inverse:
        prior_mat = jnp.swapaxes(R_time, 2, 3) @ ro_mat
    else:
        prior_mat = R_time @ ro_mat
    prior["root_orient"] = rotmat_to_aa(
        prior_mat.reshape(-1, 3, 3)).reshape(B, T, 3)

    if "trans" in data_dict:
        trans = data_dict["trans"]
        if inverse:
            if T > 1:
                off = trans[jnp.arange(B), key_frame_idx][:, None]
            else:
                off = trans[:, 0:1]
            trans = trans - off
            trans = (jnp.swapaxes(R_time, 2, 3)
                     @ trans[..., None])[..., 0]
            trans = trans - t_time
        else:
            trans = trans + t_time
            trans = (R_time @ trans[..., None])[..., 0]
            joints = smpl_joints_fn(
                body_pose.reshape(B * T, -1),
                betas.reshape(B * T, -1),
                prior["root_orient"].reshape(B * T, 3),
                trans.reshape(B * T, 3)).reshape(B, T, -1, 3)
            if T > 1:
                cur_h = joints[jnp.arange(B), key_frame_idx, 0, 2:3]
            else:
                cur_h = joints[:, 0, 0, 2:3]
            height_diff = root_height - cur_h
            off = jnp.concatenate(
                [jnp.zeros((B, 2)), height_diff], axis=1)
            trans = trans + off[:, None]
        prior["trans"] = trans
    return prior
