"""The NeMo neural motion model: parameters, forward pass, and loss.

Behavioral reference: nemo/neural_motion_model.py NemoV0-V4
(:3127-4151). The five model versions map to one parameterized forward:

  V0  separate pose/orient/trans networks, warmup on SPIN theta
  V1  single MotionNet (pose+orient+trans) + instance codes, VIBE warmup
  V2  V1 + RBF phase embedding
  V3  V2 + instance-code L2 + 3D loss vs initializer theta + code noise
  V4  V3 + camera stage that trains all params with detached pose and
      straight 25-joint projection indexing

Everything here is one jit-able pure function of (params, batch, key); the
whole fit loop wraps it in lax.scan (see loop.py). No host syncs, no Python
loops over views.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..body import constants as body_constants
from ..body.smpl import SMPLModel, smpl_forward
from ..geometry.camera import (FOCAL_LENGTH, camera_from_params,
                               init_camera_params, perspective_projection)
from ..geometry.rotations import (batch_rodrigues, rot6d_to_rotmat,
                                  rotmat_to_aa)
from ..modules.networks import (apply_monotonic_gather, apply_motion_net,
                                apply_rbf, init_monotonic, init_motion_net,
                                init_rbf)
from ..priors.gmm import GMMPrior, gmm_log_likelihood
from ..priors.vposer import (vposer_decode, vposer_encode,
                             vposer_kl_to_std_normal)
from .losses import camera_fitting_loss, keypoint_loss, per_view_average

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NemoConfig:
    """Fit hyper-parameters (argparse surface of the reference entry script,
    scripts/learned_multi_view_recon_nn.py:39-120 + config/default-v1.yml)."""
    model_version: int = 2
    h_dim: int = 500
    instance_code_size: int = 10
    phase_rbf_dim: int = 0
    rbf_kernel: str = "linear"
    monotonic_network_n_nodes: int = 200
    phase_init: str = "rand"
    loss: str = "mse_robust"
    # learning rates / optimizer
    lr_camera: float = 0.1
    lr_human: float = 0.01
    lr_instance: float = 0.001
    lr_phase: float = 1e-5
    # V0-only per-network learning rates (:3180-3194)
    lr_pose: float = 0.01
    lr_orient: float = 0.01
    lr_trans: float = 0.01
    lr_factor: float = 0.5        # ReduceLROnPlateau factor; >=1 disables
    wd_human: float = 0.001
    opt_human: str = "adam"       # 'adam' (L2-in-grad) | 'adamw' (decoupled)
    # loss weights
    weight_vp_loss: float = 0.0
    weight_vp_z_loss: float = 0.0
    weight_gmm_loss: float = 0.5
    # v2v prior on an even vertex subsample (0 = all 6890, the reference
    # behavior). TPU-only knob: the step's dominant cost is the two
    # full-mesh skinnings; 1024 vertices ~ 2 lane tiles
    vp_v2v_n_verts: int = 0
    weight_instance_loss: float = 0.0
    weight_3d_loss: float = 0.0
    # HuMoR dynamics prior on consecutive-frame transitions (the custom
    # entry's --weight_humor_loss; neural_motion_model_jeff.py:2913-2937)
    weight_humor_loss: float = 0.0
    humor_fps: float = 30.0
    code_noise: float = 0.0
    # schedule
    batch_size: int = 512
    n_steps: int = 2000
    warmup_step: int = 300
    opt_cam_step: int = 1000
    # full-batch stepping: every main-loop step runs the fixed (V x F)
    # grid instead of a random batch — the custom entry's mode
    # (learned_multi_view_recon_nn_custom.py:315)
    full_batch: bool = False
    label_type: str = "op"
    # 'intersection' label agreement gate in pixels (collate_gt_2d :2939)
    label_intersection_threshold: float = 30.0
    focal_length: float = FOCAL_LENGTH

    @property
    def uses_rbf(self) -> bool:
        return self.model_version >= 2 and self.phase_rbf_dim > 0

    @property
    def uses_instance_code(self) -> bool:
        return self.instance_code_size > 0 and self.model_version >= 1

    @property
    def proj_joint_idx(self) -> np.ndarray:
        if self.model_version >= 4:
            return np.asarray(body_constants.PROJ_JOINT_IDX_V4)
        return np.asarray(body_constants.PROJ_JOINT_IDX_V0)

    @property
    def motion_input_dim(self) -> int:
        base = self.phase_rbf_dim if self.uses_rbf else 1
        return base + self.instance_code_size


@dataclasses.dataclass(frozen=True)
class NemoAssets:
    """Frozen components: body model, priors, 2D supervision tensors."""
    smpl: SMPLModel
    gmm: Optional[GMMPrior]
    vposer: Optional[Dict[str, jnp.ndarray]]
    points2d_gt: jnp.ndarray    # (V, F, 25, 3)
    bbox_diag: jnp.ndarray      # (V, F)
    hmr_theta: jnp.ndarray      # (V, F, 69)
    hmr_mask: jnp.ndarray       # (V, F, 1)
    img_d0: float
    img_d1: float
    # optional SPIN-theta slot: V0's warmup target (:3216-3227) when the
    # bundle carries both initializers (V1+ always uses hmr_theta :3441)
    spin_theta: Optional[jnp.ndarray] = None   # (V, F, 69)
    # optional v2v vertex-subset tables (cfg.vp_v2v_n_verts > 0): the
    # VPoser v2v prior evaluated on an even vertex subsample — the step's
    # dominant cost scales with the vertex count (ROADMAP: perf profile)
    v2v_vidx: Optional[jnp.ndarray] = None      # (n,) int32 vertex ids
    v2v_pd_tiles: Optional[jnp.ndarray] = None  # tile_tables of the subset
    v2v_w_tiles: Optional[jnp.ndarray] = None
    # optional frozen HuMoR motion prior (cfg.weight_humor_loss > 0):
    humor: Optional[Dict[str, Any]] = None      # params pytree
    humor_cfg: Optional[Any] = None             # HumorConfig (static)

    @property
    def num_views(self) -> int:
        return self.points2d_gt.shape[0]

    @property
    def num_frames(self) -> int:
        return self.points2d_gt.shape[1]


jax.tree_util.register_pytree_node(
    NemoAssets,
    lambda a: ((a.smpl, a.gmm, a.vposer, a.points2d_gt, a.bbox_diag,
                a.hmr_theta, a.hmr_mask, a.v2v_vidx, a.v2v_pd_tiles,
                a.v2v_w_tiles, a.humor, a.spin_theta),
               (a.img_d0, a.img_d1, a.humor_cfg)),
    lambda aux, c: NemoAssets(c[0], c[1], c[2], c[3], c[4], c[5], c[6],
                              img_d0=aux[0], img_d1=aux[1],
                              v2v_vidx=c[7], v2v_pd_tiles=c[8],
                              v2v_w_tiles=c[9], humor=c[10],
                              humor_cfg=aux[2], spin_theta=c[11]),
)


def init_params(key, cfg: NemoConfig, num_views: int, img_d0: float) -> Params:
    """Initialize the trainable parameter pytree.

    V1+ (:3369-3453): one MotionNet (+ optional RBF, instance codes).
    V0 (:3127-3205): separate RotNet(23) / RotNet(1) / FCNN(1->3) networks,
    no instance codes.
    """
    k_cam, k_inst, k_motion, k_phase, k_o, k_t = jax.random.split(key, 6)
    params: Params = {
        "cameras": init_camera_params(k_cam, num_views, img_d0,
                                      cfg.focal_length),
        "phase": init_monotonic(k_phase, num_views,
                                cfg.monotonic_network_n_nodes,
                                cfg.phase_init),
        "betas": jnp.zeros((1, 10)),
    }
    if cfg.model_version == 0:
        from ..modules.networks import init_fcnn, init_rot_net
        params["poses"] = init_rot_net(k_motion, 1, cfg.h_dim, 23,
                                       init_last_layer_zero=True)
        params["orient"] = init_rot_net(k_o, 1, cfg.h_dim, 1,
                                        init_last_layer_zero=True)
        params["trans"] = init_fcnn(k_t, 1, cfg.h_dim, 3)
        return params
    params["motion"] = init_motion_net(k_motion, cfg.motion_input_dim,
                                       cfg.h_dim, n_joints=24,
                                       init_last_layer_zero=True)
    if cfg.uses_instance_code:
        params["instance"] = 1e-4 * jax.random.normal(
            k_inst, (num_views, cfg.instance_code_size))
    if cfg.uses_rbf:
        params["rbf"] = init_rbf(cfg.phase_rbf_dim)
    return params


def frame_idx_to_raw_phase(frame_idx: jnp.ndarray, num_frames: int
                           ) -> jnp.ndarray:
    """frame index -> raw phase in [0, 1] (:2978-2984)."""
    return frame_idx.astype(jnp.float32) / (num_frames - 1)


def _motion_input(params: Params, cfg: NemoConfig, phases: jnp.ndarray,
                  view_idx: jnp.ndarray, key=None) -> jnp.ndarray:
    """Assemble MotionNet input: [phase embedding, instance code]."""
    emb = apply_rbf(params["rbf"], phases, cfg.rbf_kernel) if cfg.uses_rbf \
        else phases
    if cfg.uses_instance_code:
        codes = params["instance"][view_idx]
        if key is not None and cfg.code_noise > 0:
            codes = codes + cfg.code_noise * jax.random.normal(
                key, codes.shape)
        emb = jnp.concatenate([emb, codes], axis=-1)
    return emb


def _trans_at_phase0(params: Params, cfg: NemoConfig) -> jnp.ndarray:
    """MotionNet translation at (phase 0 through RBF, zero instance code).

    Matches :3754-3764: the zero-phase anchor uses a ZERO instance code (not
    the per-view code), and phase 0 goes through the RBF embedding.
    """
    zero_phase = jnp.zeros((1, 1))
    emb = apply_rbf(params["rbf"], zero_phase, cfg.rbf_kernel) if cfg.uses_rbf \
        else zero_phase
    if cfg.uses_instance_code:
        emb = jnp.concatenate(
            [emb, jnp.zeros((1, cfg.instance_code_size))], axis=-1)
    _, _, trans0 = apply_motion_net(params["motion"], emb, 24)
    return trans0


def predict(params: Params, cfg: NemoConfig, assets: NemoAssets,
            view_idx: jnp.ndarray, frame_idx: jnp.ndarray,
            key=None, want_vertices: bool = False,
            detach_pose: bool = False, add_trans: bool = True,
            phases: Optional[jnp.ndarray] = None,
            want_fk_joints: bool = False) -> Dict[str, jnp.ndarray]:
    """Full forward: phase warp -> motion MLP -> SMPL FK (+translation).

    Vectorized equivalent of get_preds_batch + get_preds_given_phases_and_view
    (:3637-3672, :3733-3781). Returns dict with 'j' (B, 25, 3) projection
    joints, 'v' vertices (if requested), 'poses' (B, 69) axis-angle,
    'orient' (B, 6), 'orient_aa' (B, 3), 'trans' (B, 3), plus the rotmats.
    """
    if phases is None:
        raw = frame_idx_to_raw_phase(frame_idx, assets.num_frames)[:, None]
    else:
        raw = phases[:, None]
    warped = apply_monotonic_gather(params["phase"], view_idx, raw)  # (B, 1)

    if cfg.model_version == 0:
        # V0: separate networks (get_preds_given_phases :3005-3034)
        from ..modules.networks import apply_fcnn, apply_rot_net
        pose_d = apply_rot_net(params["poses"], warped, 23)
        orient_d = apply_rot_net(params["orient"], warped, 1)
        trans = apply_fcnn(params["trans"], warped)
        trans0 = apply_fcnn(params["trans"], jnp.zeros((1, 1)))
        trans = trans - trans0
    else:
        inp = _motion_input(params, cfg, warped, view_idx, key)
        pose_d, orient_d, trans = apply_motion_net(params["motion"], inp, 24)
        trans = trans - _trans_at_phase0(params, cfg)

    body_rotmat = pose_d["rotmat"]
    if detach_pose:
        body_rotmat = jax.lax.stop_gradient(body_rotmat)
    orient_rotmat = rot6d_to_rotmat(orient_d["rot6d"])[:, None]

    smpl_out = smpl_forward(
        assets.smpl, params["betas"], body_rotmat, orient_rotmat,
        want_vertices=want_vertices, want_fk_joints=want_fk_joints)
    if want_fk_joints:
        verts, joints49, fk_joints = smpl_out
    else:
        (verts, joints49), fk_joints = smpl_out, None

    if add_trans:
        joints49 = joints49 + trans[:, None, :]
        if verts is not None:
            verts = verts + trans[:, None, :]
        if fk_joints is not None:
            fk_joints = fk_joints + trans[:, None, :]

    out = {
        "j": joints49[:, cfg.proj_joint_idx],
        "j49": joints49,
        "poses": pose_d["pose"],
        "pose_rotmat": pose_d["rotmat"],
        "orient": orient_d["rot6d"],
        "orient_aa": orient_d["pose"],
        "trans": trans,
        "warped_phase": warped,
    }
    if verts is not None:
        out["v"] = verts
    if fk_joints is not None:
        out["fk_joints"] = fk_joints
        out["orient_rotmat"] = orient_rotmat[:, 0]
    return out


def project_to_views(params: Params, cfg: NemoConfig, assets: NemoAssets,
                     points3d: jnp.ndarray, view_idx: jnp.ndarray
                     ) -> jnp.ndarray:
    """Project (B, N, 3) points through each sample's learned camera.

    Replaces learned_camera_projection's python-loop-over-views (:3073-3124)
    with a per-sample camera gather.
    """
    cam9 = params["cameras"][view_idx]                     # (B, 9)
    cam = camera_from_params(cam9, assets.img_d0, assets.img_d1,
                             cfg.focal_length)
    return perspective_projection(points3d, cam.rotation, cam.translation,
                                  cam.focal_length, cam.center)


def _smpl_verts_from_aa(params: Params, assets: NemoAssets,
                        poses_aa: jnp.ndarray, orient6d: jnp.ndarray
                        ) -> jnp.ndarray:
    """SMPL vertices (vertex-major, (B, 3, V)) from axis-angle body pose
    (vposer_loss path :2786-2791).

    The reference re-converts the predicted axis-angle through Rodrigues for
    both the original and reconstructed poses, so gradients flow through the
    aa representation; we replicate exactly. Runs through the fused Pallas
    skinning op (ops/lbs_pallas.py) — the v2v L1 downstream is
    layout-agnostic, so the mesh is never transposed back.
    """
    from ..body.smpl import smpl_verts_t, smpl_verts_t_subset
    B = poses_aa.shape[0]
    rot = batch_rodrigues(poses_aa.reshape(B, 23, 3))
    orient_rot = rot6d_to_rotmat(orient6d)[:, None]
    if assets.v2v_vidx is not None:
        # opt-in vertex subsample (cfg.vp_v2v_n_verts) — the v2v prior only
        # needs a surface-covering sample and skinning scales with V
        return smpl_verts_t_subset(assets.smpl, params["betas"], rot,
                                   orient_rot, assets.v2v_vidx,
                                   assets.v2v_pd_tiles, assets.v2v_w_tiles)
    # padded=True: tile-aligned (B, 3, Vp) with zero pad lanes — the v2v
    # difference cancels there, and the slice/pad copies (~170 MB/step over
    # the two forwards' VJPs) disappear.
    return smpl_verts_t(assets.smpl, params["betas"], rot, orient_rot,
                        padded=True)


def vposer_losses(params: Params, assets: NemoAssets, poses: jnp.ndarray,
                  orient6d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(v2v recon L1, KL) — vposer_loss (:2775-2804).

    The reconstruction passes the VPoser mean latent; the v2v L1 compares
    SMPL meshes with the reconstruction DETACHED (:2793), pulling the
    predicted mesh toward the prior manifold.
    """
    vp = assets.vposer
    B = poses.shape[0]
    mu, scale = vposer_encode(vp, poses[:, :63])
    dec = vposer_decode(vp, mu)
    recon = jnp.concatenate(
        [dec["pose_body"].reshape(B, 63), poses[:, 63:]], axis=1)

    if assets.v2v_vidx is None:
        # full mesh: the fused v2v kernel skins both pose sets and reduces
        # |diff| in one program — neither (B, 3, V) mesh ever hits HBM,
        # and the rec side is a constant exactly like the reference's
        # detached reconstruction
        from ..body.smpl import smpl_v2v_l1_sum
        rot_o = batch_rodrigues(poses.reshape(B, 23, 3))
        rot_r = batch_rodrigues(recon.reshape(B, 23, 3))
        orient_rot = rot6d_to_rotmat(orient6d)[:, None]
        total = smpl_v2v_l1_sum(assets.smpl, params["betas"], rot_o,
                                orient_rot, rot_r, orient_rot)
        v2v = total / (B * 3 * assets.smpl.num_vertices)
    else:
        # vertex-subset path (cfg.vp_v2v_n_verts): two small skinnings
        verts_orig = _smpl_verts_from_aa(params, assets, poses, orient6d)
        verts_rec = _smpl_verts_from_aa(params, assets, recon, orient6d)
        n_real = B * 3 * int(assets.v2v_vidx.shape[0])
        diff = (jax.lax.stop_gradient(verts_rec).astype(jnp.float32)
                - verts_orig.astype(jnp.float32))
        v2v = jnp.abs(diff).sum() / n_real
    kl = vposer_kl_to_std_normal(mu, scale)
    return v2v, kl


def humor_dynamics_loss(params: Params, cfg: NemoConfig, assets: NemoAssets,
                        view_idx: jnp.ndarray, frame_idx: jnp.ndarray
                        ) -> jnp.ndarray:
    """HuMoR dynamics prior: KL of consecutive-frame motion transitions
    under the frozen conditional prior.

    The custom entry's --weight_humor_loss term
    (scripts/learned_multi_view_recon_nn_custom.py flags;
    neural_motion_model_jeff.py:2913-2937): infer the posterior latent for
    each transition of the predicted motion and penalize its divergence from
    the HuMoR conditional prior. The reference runs MotionOptimizer's
    infer_latent_motion/rollout over the full sequence; the scan-friendly
    equivalent evaluates the batch's frames as (f-1, f, f+1) windows — each
    window yields two velocity-complete HuMoR states (finite differences at
    cfg.humor_fps, matching estimate_velocities) and one transition KL.
    """
    from ..models.humor import STATE_DIM, humor_infer_seq

    fps = cfg.humor_fps
    F = assets.num_frames
    B = view_idx.shape[0]
    fc = jnp.clip(frame_idx, 1, F - 2)
    vi3 = jnp.concatenate([view_idx] * 3)
    fi3 = jnp.concatenate([fc - 1, fc, fc + 1])
    preds = predict(params, cfg, assets, vi3, fi3, want_vertices=False,
                    want_fk_joints=True)

    def split3(x):
        return x[:B], x[B:2 * B], x[2 * B:]

    trans = split3(preds["trans"])
    orient_R = split3(preds["orient_rotmat"])          # 3 x (B, 3, 3)
    orient_aa = split3(preds["orient_aa"])
    poses = split3(preds["poses"])
    joints = split3(preds["fk_joints"][:, :22].reshape(3 * B, 66))

    def state(i):
        """HuMoR 'smpl+joints' state at window position i (needs i-1)."""
        trans_vel = (trans[i] - trans[i - 1]) * fps
        dR = jnp.einsum("bij,bkj->bik", orient_R[i], orient_R[i - 1],
                        precision=jax.lax.Precision.HIGHEST)
        root_orient_vel = rotmat_to_aa(dR) * fps
        joints_vel = (joints[i] - joints[i - 1]) * fps
        return jnp.concatenate([
            trans[i], trans_vel, orient_aa[i], root_orient_vel,
            poses[i][:, :63], joints[i], joints_vel], axis=-1)

    states = jnp.stack([state(1), state(2)], axis=1)   # (B, 2, STATE_DIM)
    assert states.shape[-1] == STATE_DIM
    return humor_infer_seq(assets.humor, assets.humor_cfg, states)["kl"].mean()


def fit_loss(params: Params, cfg: NemoConfig, assets: NemoAssets,
             view_idx: jnp.ndarray, frame_idx: jnp.ndarray,
             key=None, training: bool = True, detach_pose: bool = False,
             include_priors: bool = True, include_3d: Optional[bool] = None
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The main-stage loss (NemoV3.step :3796-3909; V1 path when the extra
    weights are zero). Returns (total_loss, metrics dict).

    include_priors gates vposer/gmm/instance terms; include_3d (default =
    include_priors) gates the 3D theta loss separately because V4's camera
    stage keeps it while dropping the priors (:4128-4140).
    """
    if include_3d is None:
        include_3d = include_priors
    noise_key = key if (training and cfg.code_noise > 0) else None
    need_verts = include_priors and (cfg.weight_vp_loss > 0 or
                                     cfg.weight_vp_z_loss > 0)
    preds = predict(params, cfg, assets, view_idx, frame_idx, key=noise_key,
                    want_vertices=False, detach_pose=detach_pose)

    points2d = project_to_views(params, cfg, assets, preds["j"], view_idx)
    gt = assets.points2d_gt[view_idx, frame_idx]          # (B, 25, 3)
    gt_size = assets.bbox_diag[view_idx, frame_idx]       # (B,)

    loss_all = keypoint_loss(points2d, gt[..., :2], gt[..., 2:], gt_size,
                             cfg.loss)
    kp = per_view_average(loss_all, gt[..., 2:], view_idx, assets.num_views)
    loss = kp
    metrics = {"kp_loss": kp}

    if include_priors:
        poses = preds["poses"]
        if need_verts:
            v2v, kl = vposer_losses(params, assets, poses, preds["orient"])
            metrics["vp_recon_loss"] = v2v
            metrics["vp_kl_loss"] = kl
            if cfg.weight_vp_loss:
                loss = loss + cfg.weight_vp_loss * v2v
            if cfg.weight_vp_z_loss:
                loss = loss + cfg.weight_vp_z_loss * kl
        else:
            metrics["vp_recon_loss"] = jnp.zeros(())
            metrics["vp_kl_loss"] = jnp.zeros(())

        if cfg.uses_instance_code and cfg.model_version >= 3:
            inst = (params["instance"] ** 2).mean()
            metrics["instance_loss"] = inst
            if cfg.weight_instance_loss:
                loss = loss + cfg.weight_instance_loss * inst

        if assets.gmm is not None:
            g = gmm_log_likelihood(assets.gmm, poses).mean()
            metrics["gmm_loss"] = g
            if cfg.weight_gmm_loss:
                loss = loss + cfg.weight_gmm_loss * g

        if cfg.weight_humor_loss and assets.humor is not None:
            hl = humor_dynamics_loss(params, cfg, assets, view_idx,
                                     frame_idx)
            metrics["humor_loss"] = hl
            loss = loss + cfg.weight_humor_loss * hl

    if include_3d and cfg.weight_3d_loss and cfg.model_version >= 3:
        theta = assets.hmr_theta[view_idx, frame_idx]
        mask = assets.hmr_mask[view_idx, frame_idx]
        l3d = keypoint_loss(preds["poses"], theta, mask,
                            loss_type="mse_robust").mean()
        metrics["loss_3d"] = l3d
        loss = loss + cfg.weight_3d_loss * l3d

    metrics["total_loss"] = loss
    return loss, metrics


def warmup_loss(params: Params, cfg: NemoConfig, assets: NemoAssets,
                view_idx: jnp.ndarray, frame_idx: jnp.ndarray
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Warmup: fit predicted axis-angle pose to initializer theta.

    V1+ (:3455-3509): mse_robust with the initializer's validity mask.
    V0 (:3207-3269): plain unmasked MSE against SPIN theta.
    """
    preds = predict(params, cfg, assets, view_idx, frame_idx,
                    want_vertices=False)
    if cfg.model_version == 0:
        # V0 warms up on SPIN theta when packed (:3216-3227); VIBE theta
        # is the fallback when the bundle has only one initializer slot
        src = assets.spin_theta if assets.spin_theta is not None \
            else assets.hmr_theta
        theta = src[view_idx, frame_idx]
        loss = ((preds["poses"] - theta) ** 2).mean()
    else:
        theta = assets.hmr_theta[view_idx, frame_idx]
        mask = assets.hmr_mask[view_idx, frame_idx]
        loss = keypoint_loss(preds["poses"], theta, mask,
                             loss_type="mse_robust").mean()
    return loss, {"warmup_loss": loss}


def camera_stage_loss(params: Params, cfg: NemoConfig, assets: NemoAssets,
                      view_idx: jnp.ndarray, frame_idx: jnp.ndarray,
                      key=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Camera-optimization loss.

    V0-V3 (:2869-2906): frame 0 of every view, camera params only, plain mean.
    V4 (:4060-4149): random batches, pose detached, per-view averaging + 3D
    loss, all params trainable. The caller picks the (view, frame) sampling;
    this function switches on model_version for the loss shape.
    """
    if cfg.model_version >= 4:
        return fit_loss(params, cfg, assets, view_idx, frame_idx, key=key,
                        training=True, detach_pose=True,
                        include_priors=False, include_3d=True)
    preds = predict(params, cfg, assets, view_idx, frame_idx,
                    want_vertices=False)
    points2d = project_to_views(params, cfg, assets, preds["j"], view_idx)
    gt = assets.points2d_gt[view_idx, frame_idx]
    gt_size = assets.bbox_diag[view_idx, frame_idx]
    loss = camera_fitting_loss(points2d, gt, gt_size, cfg.loss)
    return loss, {"cam_loss": loss}
