"""Torch twin of the reference NeMo fit numerics, for parity testing.

This module re-implements — in torch, from the reference's equations — every
piece of the NemoV2 fit-loss path so the jitted jax `fit_loss` (and the
optimizer trajectory around it) can be compared step-for-step against the
exact PyTorch semantics the reference relies on. Citations:

  * rot6d_to_rotmat:        /root/reference/hmr/geometry.py:47-61
  * batch_rodrigues:        /root/reference/hmr/geometry.py:9-23 (aa->quat->R)
  * rotmat -> axis-angle:   /root/reference/hmr/geometry.py:181-346
  * LBS forward:            /root/reference/human_body_prior/body_model/lbs.py:164-260
  * 49-joint assembly:      /root/reference/hmr/smpl.py:17-43
  * perspective projection: /root/reference/hmr/geometry.py:78-106
  * MonotonicNetwork:       /root/reference/monotonic_network.py:7-39
  * RBF embedding:          /root/reference/nemo/rbf.py:30-75
  * FCNN / MotionNet:       /root/reference/nemo/neural_motion_model.py:58-148
  * keypoint_loss + GMoF:   /root/reference/nemo/neural_motion_model.py:2806-2843,
                            /root/reference/nemo/utils/misc_utils.py:91-105
  * per-view averaging:     /root/reference/nemo/neural_motion_model.py:3839-3846
                            (V1 step :3551-3560)
  * vposer_loss:            /root/reference/nemo/neural_motion_model.py:2775-2804
  * gmm_prior_loss:         /root/reference/nemo/neural_motion_model.py:2758-2773
                            + /root/reference/hmr/smplify/prior.py:181-196
  * trans(phase=0) anchor:  /root/reference/nemo/neural_motion_model.py:3754-3766
  * optimizer groups:       /root/reference/nemo/neural_motion_model.py:3404-3438,
                            :3701-3728

No code is copied from the reference; everything is written from the math.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(a) -> torch.Tensor:
    return torch.as_tensor(np.asarray(a), dtype=torch.float32)


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------

def rot6d_to_rotmat(x: torch.Tensor) -> torch.Tensor:
    """(N, 6) -> (N, 3, 3), Gram-Schmidt on the (3, 2) column pair."""
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[:, :, 0], x[:, :, 1]
    b1 = F.normalize(a1, dim=1)
    b2 = F.normalize(a2 - (b1 * a2).sum(1, keepdim=True) * b1, dim=1)
    b3 = torch.cross(b1, b2, dim=1)
    return torch.stack([b1, b2, b3], dim=-1)


def batch_rodrigues(aa: torch.Tensor) -> torch.Tensor:
    """(N, 3) axis-angle -> (N, 3, 3) via quaternion (hmr/geometry.py:9-45)."""
    angle = torch.norm(aa + 1e-8, dim=1, keepdim=True)
    half = angle * 0.5
    quat = torch.cat([torch.cos(half), torch.sin(half) * (aa / angle)], dim=1)
    q = quat / quat.norm(p=2, dim=1, keepdim=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    R = torch.stack([
        ww + xx - yy - zz, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, ww - xx + yy - zz, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, ww - xx - yy + zz,
    ], dim=1)
    return R.reshape(-1, 3, 3)


def rotmat_to_quat(R: torch.Tensor, eps: float = 1e-6) -> torch.Tensor:
    """(N, 3, 3) -> (N, 4) wxyz, kornia 4-case selection on the transpose."""
    Rt = R.transpose(1, 2)
    r = lambda i, j: Rt[:, i, j]
    t0 = 1 + r(0, 0) - r(1, 1) - r(2, 2)
    q0 = torch.stack([r(1, 2) - r(2, 1), t0, r(0, 1) + r(1, 0),
                      r(2, 0) + r(0, 2)], -1)
    t1 = 1 - r(0, 0) + r(1, 1) - r(2, 2)
    q1 = torch.stack([r(2, 0) - r(0, 2), r(0, 1) + r(1, 0), t1,
                      r(1, 2) + r(2, 1)], -1)
    t2 = 1 - r(0, 0) - r(1, 1) + r(2, 2)
    q2 = torch.stack([r(0, 1) - r(1, 0), r(2, 0) + r(0, 2),
                      r(1, 2) + r(2, 1), t2], -1)
    t3 = 1 + r(0, 0) + r(1, 1) + r(2, 2)
    q3 = torch.stack([t3, r(1, 2) - r(2, 1), r(2, 0) - r(0, 2),
                      r(0, 1) - r(1, 0)], -1)
    c_d2 = r(2, 2) < eps
    c01 = r(0, 0) > r(1, 1)
    c0n1 = r(0, 0) < -r(1, 1)
    m0 = (c_d2 & c01).float().unsqueeze(-1)
    m1 = (c_d2 & ~c01).float().unsqueeze(-1)
    m2 = (~c_d2 & c0n1).float().unsqueeze(-1)
    m3 = (~c_d2 & ~c0n1).float().unsqueeze(-1)
    q = q0 * m0 + q1 * m1 + q2 * m2 + q3 * m3
    t = (t0.unsqueeze(-1) * m0 + t1.unsqueeze(-1) * m1 +
         t2.unsqueeze(-1) * m2 + t3.unsqueeze(-1) * m3)
    return q * 0.5 / torch.sqrt(t)


def quat_to_aa(quat: torch.Tensor) -> torch.Tensor:
    q1, q2, q3 = quat[..., 1], quat[..., 2], quat[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    sin_t = torch.sqrt(sin_sq)
    cos_t = quat[..., 0]
    two_theta = 2.0 * torch.where(cos_t < 0.0,
                                  torch.atan2(-sin_t, -cos_t),
                                  torch.atan2(sin_t, cos_t))
    k = torch.where(sin_sq > 0.0, two_theta / sin_t,
                    2.0 * torch.ones_like(sin_t))
    return torch.stack([q1 * k, q2 * k, q3 * k], dim=-1)


def rotmat_to_aa(R: torch.Tensor) -> torch.Tensor:
    aa = quat_to_aa(rotmat_to_quat(R))
    aa = torch.where(torch.isnan(aa), torch.zeros_like(aa), aa)
    return aa


# ---------------------------------------------------------------------------
# SMPL (lbs.py:164-260 + hmr/smpl.py:17-43 joint assembly)
# ---------------------------------------------------------------------------

class TorchSMPL:
    def __init__(self, smpl_model):
        """smpl_model: nemo_tpu SMPLModel (tables read as numpy)."""
        self.v_template = _t(smpl_model.v_template)          # (V, 3)
        self.shapedirs = _t(smpl_model.shapedirs)            # (V, 3, 10)
        self.posedirs = _t(smpl_model.posedirs)              # (207, V*3)
        self.J_regressor = _t(smpl_model.J_regressor)        # (24, V)
        self.lbs_weights = _t(smpl_model.lbs_weights)        # (V, 24)
        self.J_regressor_extra = _t(smpl_model.J_regressor_extra)
        self.parents = np.asarray(smpl_model.parents)
        self.vertex_joint_ids = np.asarray(smpl_model.vertex_joint_ids)
        self.joint_map = np.asarray(smpl_model.joint_map)

    def rigid_transform(self, rot_mats, J):
        """FK chain (lbs.py batch_rigid_transform)."""
        B, Jn = rot_mats.shape[0], rot_mats.shape[1]
        rel = J.clone()
        rel[:, 1:] = J[:, 1:] - J[:, self.parents[1:]]
        T = torch.zeros(B, Jn, 4, 4)
        T[:, :, :3, :3] = rot_mats
        T[:, :, :3, 3] = rel
        T[:, :, 3, 3] = 1.0
        chain = [T[:, 0]]
        for i in range(1, Jn):
            chain.append(torch.matmul(chain[self.parents[i]], T[:, i]))
        G = torch.stack(chain, dim=1)                        # (B, J, 4, 4)
        posed = G[:, :, :3, 3]
        rel_T = G.clone()
        rel_T[:, :, :3, 3] = posed - torch.einsum(
            'bjmn,bjn->bjm', G[:, :, :3, :3], J)
        return posed, rel_T

    def forward(self, betas, body_rotmat, orient_rotmat):
        """betas (1, 10); body_rotmat (B, 23, 3, 3); orient (B, 1, 3, 3)."""
        B = body_rotmat.shape[0]
        rot_mats = torch.cat([orient_rotmat.expand(B, 1, 3, 3), body_rotmat],
                             dim=1)
        v_shaped = self.v_template + torch.einsum(
            'bl,mkl->bmk', betas, self.shapedirs)            # (1, V, 3)
        J = torch.einsum('jv,bvk->bjk', self.J_regressor, v_shaped)
        if J.shape[0] == 1 and B > 1:
            J = J.expand(B, -1, -1)
        ident = torch.eye(3)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
        pose_offsets = torch.matmul(pose_feature, self.posedirs).view(B, -1, 3)
        v_posed = pose_offsets + v_shaped                    # (B, V, 3)
        posed_joints, A = self.rigid_transform(rot_mats, J)
        T = torch.einsum('vj,bjmn->bvmn', self.lbs_weights, A)
        vh = torch.cat([v_posed,
                        torch.ones(B, v_posed.shape[1], 1)], dim=2)
        verts = torch.einsum('bvmn,bvn->bvm', T, vh)[:, :, :3]
        extra = torch.einsum('jv,bvk->bjk', self.J_regressor_extra, verts)
        sel = verts[:, self.vertex_joint_ids]
        joints54 = torch.cat([posed_joints, sel, extra], dim=1)
        return verts, joints54[:, self.joint_map]


# ---------------------------------------------------------------------------
# camera
# ---------------------------------------------------------------------------

def perspective_projection(points, rotation, translation, focal_length,
                           camera_center):
    """hmr/geometry.py:78-106; plain (unguarded) divide like the reference."""
    pts = torch.einsum('bij,bkj->bki', rotation, points)
    pts = pts + translation.unsqueeze(1)
    proj = pts / pts[:, :, -1].unsqueeze(-1)
    return focal_length[:, None, None] * proj[:, :, :2] \
        + camera_center.unsqueeze(1)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def gmof(residual, rho=100.0, sqrt=False):
    sq = residual ** 2
    if sqrt:
        sq = torch.sqrt(sq.sum(-1)).unsqueeze(-1)
    return rho ** 2 * sq / (sq + rho ** 2)


def keypoint_loss(pred, gt, gt_weight, gt_size=None, loss_type="mse_robust"):
    gate = (gt_weight > 0.5).float()
    if loss_type == "mse":
        return gate * (pred - gt) ** 2
    if loss_type == "mse_robust":
        return gate * gmof(pred - gt, sqrt=False)
    if loss_type == "rmse":
        return gate * torch.sqrt(
            1e-6 + ((pred - gt) ** 2).sum(-1, keepdim=True))
    if loss_type == "rmse_robust":
        return gate * gmof(pred - gt, sqrt=True)
    if loss_type == "rmse_resized":
        s = gt_size.unsqueeze(-1).unsqueeze(-1)
        return gate * torch.sqrt(
            1e-6 + (((pred - gt) / s) ** 2).sum(-1, keepdim=True))
    if loss_type == "mse_robust_resized":
        s = gt_size.unsqueeze(-1).unsqueeze(-1)
        return gate * gmof((pred - gt) / s * 1000.0, sqrt=False)
    raise ValueError(loss_type)


# ---------------------------------------------------------------------------
# the full NemoV2 twin
# ---------------------------------------------------------------------------

class TorchNemoV2:
    """Reference NemoV2 semantics with parameters injected from the jax fit."""

    def __init__(self, cfg, smpl_model, vposer_np, gmm, points2d_gt,
                 bbox_diag, img_d0, img_d1, hmr_theta=None, hmr_mask=None):
        self.cfg = cfg
        self.hmr_theta = None if hmr_theta is None else _t(hmr_theta)
        self.hmr_mask = None if hmr_mask is None else _t(hmr_mask)
        self.smpl = TorchSMPL(smpl_model)
        self.vp = {k: _t(v) for k, v in vposer_np.items()}
        self.gmm_means = _t(gmm.means)
        self.gmm_precisions = _t(gmm.precisions)
        self.gmm_nll_weights = _t(gmm.nll_weights)
        self.points2d_gt = _t(points2d_gt)                   # (V, F, 25, 3)
        self.bbox_diag = _t(bbox_diag)                       # (V, F)
        self.img_d0, self.img_d1 = img_d0, img_d1
        self.num_views = self.points2d_gt.shape[0]
        self.num_frames = self.points2d_gt.shape[1]

    # -- parameters ---------------------------------------------------------

    def set_params(self, params_np):
        """Inject the jax param pytree (numpy leaves) as torch Parameters."""
        P = lambda a: torch.nn.Parameter(_t(a))
        self.learned_cameras = P(params_np["cameras"])
        self.shifts = P(params_np["phase"]["shifts"])        # (V, n_nodes)
        self.scales = P(params_np["phase"]["scales"])
        self.learned_betas = P(params_np["betas"])
        m = params_np["motion"]
        self.motion = {
            "W1": P(m["trunk"]["W1"]), "b1": P(m["trunk"]["b1"]),
            "W2": P(m["trunk"]["W2"]), "b2": P(m["trunk"]["b2"]),
            "W3": P(m["trunk"]["W3"]), "b3": P(m["trunk"]["b3"]),
            "W_rot": P(m["W_rot"]), "b_rot": P(m["b_rot"]),
            "W_lin": P(m["W_lin"]), "b_lin": P(m["b_lin"]),
        }
        if "instance" in params_np:
            self.learned_instance_code = P(params_np["instance"])
        if "rbf" in params_np:
            self.log_sigmas = P(params_np["rbf"]["log_sigmas"])

    def make_optimizers(self):
        """The reference V2 optimizer set (:3404-3438, :3701-3728)."""
        cfg = self.cfg
        opts = [
            torch.optim.Adam([self.learned_cameras], lr=cfg.lr_camera,
                             weight_decay=0),
            torch.optim.Adam(list(self.motion.values()) + [self.log_sigmas],
                             lr=cfg.lr_human, weight_decay=cfg.wd_human),
            torch.optim.Adam([self.shifts, self.scales], lr=cfg.lr_phase,
                             weight_decay=0.0),
        ]
        if cfg.instance_code_size > 0:
            opts.append(torch.optim.Adam([self.learned_instance_code],
                                         lr=cfg.lr_instance, weight_decay=0))
        return opts

    # -- submodules ---------------------------------------------------------

    def monotonic(self, view, raw):
        """One view's phase warp (monotonic_network.py:23-39)."""
        sh = torch.relu(self.shifts[view])
        sc = torch.relu(self.scales[view])

        def net(x):
            z = sc * (x.expand(-1, sh.shape[0]) - sh)
            return torch.sigmoid(z).mean(-1, keepdim=True)

        y = net(raw)
        y0 = net(torch.zeros_like(raw))
        y1 = net(torch.ones_like(raw))
        return (y - y0) / (y1 - y0 + 1e-6)

    def rbf(self, x):
        """nemo/rbf.py:47-56 — squared distances, no sqrt."""
        K = self.log_sigmas.shape[0]
        c = torch.linspace(0, 1, K)
        d = (x - c.unsqueeze(0)) ** 2 / torch.exp(self.log_sigmas).unsqueeze(0)
        kern = self.cfg.rbf_kernel
        if kern == "quadratic":
            return d.pow(2)
        if kern == "linear":
            return d
        if kern == "gaussian":
            return torch.exp(-d.pow(2))
        raise ValueError(kern)

    def motion_net(self, x):
        """MotionNet forward (:131-148)."""
        m = self.motion
        h = torch.relu(x @ m["W1"] + m["b1"])
        h = torch.relu(h @ m["W2"] + m["b2"])
        z = torch.relu(h @ m["W3"] + m["b3"])
        rot6d = z @ m["W_rot"] + m["b_rot"]
        B = x.shape[0]
        rotmat = rot6d_to_rotmat(rot6d).view(B, 24, 3, 3)
        pose = rotmat_to_aa(rotmat.reshape(-1, 3, 3)).reshape(B, 72)
        trans = z @ m["W_lin"] + m["b_lin"]
        orient_d = {"rot6d": rot6d[:, :6], "rotmat": rotmat[:, :1],
                    "pose": pose[:, :3]}
        pose_d = {"rot6d": rot6d[:, 6:], "rotmat": rotmat[:, 1:],
                  "pose": pose[:, 3:]}
        return pose_d, orient_d, trans

    # -- forward ------------------------------------------------------------

    def get_preds_batch(self, view_idx, frame_idx, detach_pose=False):
        """(:3637-3672, V2 :3733-3781; V4 detach at :4010-4058)."""
        cfg = self.cfg
        raw = torch.linspace(0, 1, self.num_frames)[frame_idx].unsqueeze(1)
        warped = torch.cat([
            self.monotonic(v, raw[view_idx == v])
            if (view_idx == v).any() else torch.zeros(0, 1)
            for v in range(self.num_views)], dim=0)
        # reorder back to batch order
        order = torch.cat([torch.where(view_idx == v)[0]
                           for v in range(self.num_views)])
        inv = torch.empty_like(order)
        inv[order] = torch.arange(len(order))
        warped = warped[inv]

        inp = self.rbf(warped) if cfg.phase_rbf_dim > 0 else warped
        if cfg.instance_code_size > 0:
            inp = torch.cat([inp, self.learned_instance_code[view_idx]], 1)
        pose_d, orient_d, trans = self.motion_net(inp)

        body_rotmat = pose_d["rotmat"].detach() if detach_pose \
            else pose_d["rotmat"]
        verts, joints49 = self.smpl.forward(self.learned_betas,
                                            body_rotmat,
                                            orient_d["rotmat"])
        # trans(phase=0) anchor (:3754-3766): zero phase through the RBF,
        # ZERO instance code.
        if cfg.phase_rbf_dim > 0:
            anchor_in = torch.cat([
                self.rbf(torch.zeros(1, 1)),
                torch.zeros(1, cfg.instance_code_size)], 1)
        else:
            anchor_in = torch.zeros(1, 1 + cfg.instance_code_size)
        trans0 = self.motion_net(anchor_in)[-1]
        trans = trans - trans0
        joints49 = joints49 + trans.unsqueeze(1)
        # V4 projects straight 25-joint indexing (:3997-3998); V0-3 swap
        # in joint 38 for the nose (:3061)
        idx = list(range(25)) if getattr(cfg, "model_version", 2) >= 4 \
            else [38] + list(range(1, 25))
        return {"j": joints49[:, idx], "poses": pose_d["pose"],
                "orient": orient_d["rot6d"], "orient_aa": orient_d["pose"],
                "trans": trans}

    def learned_camera_projection(self, points3d, view_idx):
        """(:3073-3124) — vectorized over the batch, same math."""
        cam = self.learned_cameras[view_idx]                 # (B, 9)
        rot = rot6d_to_rotmat(cam[:, 3:])
        trans = cam[:, :3]
        B = points3d.shape[0]
        f = torch.full((B,), float(self.cfg.focal_length))
        center = torch.tensor([self.img_d0 // 2, self.img_d1 // 2],
                              dtype=torch.float32).expand(B, 2)
        return perspective_projection(points3d, rot, trans, f, center)

    def vposer_encode(self, pose63):
        vp = self.vp
        x = (pose63 - vp["bn0_mean"]) / torch.sqrt(vp["bn0_var"] + 1e-5) \
            * vp["bn0_gamma"] + vp["bn0_beta"]
        x = x @ vp["enc_w1"] + vp["enc_b1"]
        x = F.leaky_relu(x, 0.01)
        x = (x - vp["bn1_mean"]) / torch.sqrt(vp["bn1_var"] + 1e-5) \
            * vp["bn1_gamma"] + vp["bn1_beta"]
        x = x @ vp["enc_w2"] + vp["enc_b2"]
        x = x @ vp["enc_w3"] + vp["enc_b3"]
        mu = x @ vp["mu_w"] + vp["mu_b"]
        scale = F.softplus(x @ vp["logvar_w"] + vp["logvar_b"])
        return mu, scale

    def vposer_decode(self, z):
        vp = self.vp
        x = F.leaky_relu(z @ vp["dec_w1"] + vp["dec_b1"], 0.01)
        x = F.leaky_relu(x @ vp["dec_w2"] + vp["dec_b2"], 0.01)
        x = x @ vp["dec_w3"] + vp["dec_b3"]
        B = z.shape[0]
        rotmat = rot6d_to_rotmat(x.reshape(-1, 6)).reshape(B, 21, 3, 3)
        return rotmat_to_aa(rotmat.reshape(-1, 3, 3)).reshape(B, 63)

    def vposer_loss(self, poses, orient):
        """(:2775-2804)."""
        N = poses.shape[0]
        mu, scale = self.vposer_encode(poses[:, :63])
        recon = torch.cat([self.vposer_decode(mu), poses[:, 63:]], 1)

        def smpl_from_aa(aa):
            rotm = batch_rodrigues(aa.reshape(-1, 3)).reshape(-1, 23, 3, 3)
            orient_rotm = rot6d_to_rotmat(orient).unsqueeze(1)
            v, _ = self.smpl.forward(self.learned_betas, rotm, orient_rotm)
            return v

        v_orig = smpl_from_aa(poses)
        v_rec = smpl_from_aa(recon)
        v2v = torch.abs(v_rec.detach() - v_orig).mean()
        q = torch.distributions.Normal(mu, scale)
        p = torch.distributions.Normal(torch.zeros_like(mu),
                                       torch.ones_like(scale))
        kl = torch.mean(torch.sum(
            torch.distributions.kl.kl_divergence(q, p), dim=1))
        return v2v, kl

    def gmm_prior_loss(self, poses):
        """(:2758-2773) + prior.py:181-196 merged max-mixture NLL."""
        diff = poses.unsqueeze(1) - self.gmm_means.unsqueeze(0)  # (B, M, D)
        pd = torch.einsum('mij,bmj->bmi', self.gmm_precisions, diff)
        quad = (pd * diff).sum(-1)
        nll = 0.5 * quad - torch.log(self.gmm_nll_weights)
        return nll.min(dim=1)[0].mean()

    def fit_loss(self, view_idx, frame_idx, detach_pose=False,
                 include_priors=True, include_3d=None):
        """One training-step loss (V2 :3511-3598; V3 extras :3860-3896;
        V4 camera stage = detach_pose + priors off + 3D on :4060-4149)."""
        cfg = self.cfg
        if include_3d is None:
            include_3d = include_priors
        preds = self.get_preds_batch(view_idx, frame_idx,
                                     detach_pose=detach_pose)
        points2d = self.learned_camera_projection(preds["j"], view_idx)
        gt = self.points2d_gt[view_idx, frame_idx]
        gt_size = self.bbox_diag[view_idx, frame_idx]
        loss_all = keypoint_loss(points2d, gt[..., :2], gt[..., 2:], gt_size,
                                 cfg.loss)
        loss = 0
        for v in view_idx.unique():
            m = gt[view_idx == v][..., -1:]
            loss = loss + (loss_all[view_idx == v] * m).mean()
        loss = loss / len(view_idx.unique())
        metrics = {"kp_loss": loss.detach().clone()}

        if include_priors:
            if cfg.weight_vp_loss or cfg.weight_vp_z_loss:
                v2v, kl = self.vposer_loss(preds["poses"], preds["orient"])
                metrics["vp_recon_loss"] = v2v.detach()
                metrics["vp_kl_loss"] = kl.detach()
                if cfg.weight_vp_loss:
                    loss = loss + cfg.weight_vp_loss * v2v
                if cfg.weight_vp_z_loss:
                    loss = loss + cfg.weight_vp_z_loss * kl

            # V3+ instance-code L2 (:3863-3866)
            if getattr(cfg, "model_version", 2) >= 3 and \
                    cfg.instance_code_size > 0:
                inst = (self.learned_instance_code ** 2).mean()
                metrics["instance_loss"] = inst.detach()
                if cfg.weight_instance_loss:
                    loss = loss + cfg.weight_instance_loss * inst

            if cfg.weight_gmm_loss:
                g = self.gmm_prior_loss(preds["poses"])
                metrics["gmm_loss"] = g.detach()
                loss = loss + cfg.weight_gmm_loss * g

        # V3+ 3D theta loss (:3868-3881)
        if include_3d and getattr(cfg, "weight_3d_loss", 0) and \
                getattr(cfg, "model_version", 2) >= 3:
            theta = self.hmr_theta[view_idx, frame_idx]
            mask = self.hmr_mask[view_idx, frame_idx]
            l3d = keypoint_loss(preds["poses"], theta, mask,
                                loss_type="mse_robust").mean()
            metrics["loss_3d"] = l3d.detach()
            loss = loss + cfg.weight_3d_loss * l3d

        metrics["total_loss"] = loss.detach().clone()
        return loss, metrics

    def camera_stage_loss(self, view_idx, frame_idx):
        """V4's all-param camera stage: detached pose, priors off, 3D on
        (:4060-4149)."""
        return self.fit_loss(view_idx, frame_idx, detach_pose=True,
                             include_priors=False, include_3d=True)

    def warmup_loss(self, view_idx, frame_idx):
        """V1+ warmup: masked mse_robust of predicted axis-angle pose vs the
        VIBE initializer theta (:3455-3509)."""
        preds = self.get_preds_batch(view_idx, frame_idx)
        theta = self.hmr_theta[view_idx, frame_idx]
        mask = self.hmr_mask[view_idx, frame_idx]
        return keypoint_loss(preds["poses"], theta, mask,
                             loss_type="mse_robust").mean()

    def camera_fit_loss(self):
        """V0-V3 camera stage: frame 0 of every view, plain mean keypoint
        loss, cameras-only (:2845-2906)."""
        vi = torch.arange(self.num_views).long()
        fi = torch.zeros(self.num_views).long()
        preds = self.get_preds_batch(vi, fi)
        points2d = self.learned_camera_projection(preds["j"], vi)
        gt = self.points2d_gt[vi, fi]
        gt_size = self.bbox_diag[vi, fi]
        return keypoint_loss(points2d, gt[..., :2], gt[..., 2:], gt_size,
                             self.cfg.loss).mean()
