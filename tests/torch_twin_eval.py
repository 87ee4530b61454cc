"""Torch/numpy twin of the reference's EVAL stack, written from the
reference equations (NOT a code copy):

  * compute_similarity_transform / rigid_transform_3D / reconstruction_error
    (nemo/utils/pose_utils.py:30-159)
  * eval_3d + dynamic masking (nemo/neural_motion_model.py:1056-1282)
  * eval_2d rmse/pck (:522-710)
  * eval_3d_global via rigid_transform_to_gt (:992-1054, :1490-1651)

Used by test_reference_twin_eval.py to pin the repo's CSV oracle cell-by-cell
against an independent implementation sharing only the SMPL tables.
"""

import numpy as np
import torch

from torch_twin import TorchSMPL, batch_rodrigues, keypoint_loss


# ---------------------------------------------------------------------------
# pose_utils twins (float64 numpy, like the reference's host-side eval)
# ---------------------------------------------------------------------------

def compute_similarity_transform(S1, S2):
    """pose_utils.py:86-137 on (N, 3) row points (the reference transposes
    internally when handed row-major input)."""
    S1 = np.asarray(S1, np.float64).T
    S2 = np.asarray(S2, np.float64).T
    mu1 = S1.mean(axis=1, keepdims=True)
    mu2 = S2.mean(axis=1, keepdims=True)
    X1, X2 = S1 - mu1, S2 - mu2
    var1 = np.sum(X1 ** 2)
    K = X1.dot(X2.T)
    U, s, Vh = np.linalg.svd(K)
    V = Vh.T
    Z = np.eye(U.shape[0])
    Z[-1, -1] *= np.sign(np.linalg.det(U.dot(V.T)))
    R = V.dot(Z.dot(U.T))
    scale = np.trace(R.dot(K)) / var1
    t = mu2 - scale * (R.dot(mu1))
    return (scale * R.dot(S1) + t).T


def reconstruction_error(S1, S2, pa=True):
    """pose_utils.py:140-159 (mean reduction)."""
    S1 = np.asarray(S1, np.float64)
    S2 = np.asarray(S2, np.float64)
    if pa:
        S1 = np.stack([compute_similarity_transform(S1[i], S2[i])
                       for i in range(S1.shape[0])])
    return np.sqrt(((S1 - S2) ** 2).sum(axis=-1)).mean(axis=-1).mean()


def rigid_transform_3D(A, B):
    """pose_utils.py:30-84 on (N, 3) row points -> (R, t (3, 1))."""
    A = np.asarray(A, np.float64).T
    B = np.asarray(B, np.float64).T
    cA = A.mean(axis=1).reshape(-1, 1)
    cB = B.mean(axis=1).reshape(-1, 1)
    H = (A - cA) @ (B - cB).T
    U, S, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        Vt[2, :] *= -1
        R = Vt.T @ U.T
    t = -R @ cA + cB
    return R, t


# ---------------------------------------------------------------------------
# SMPL helpers
# ---------------------------------------------------------------------------

def _smpl_aa(tsmpl: TorchSMPL, body_pose69, orient3=None):
    """smpl(betas=None, body_pose, global_orient, pose2rot=True): identity
    orient when orient3 is None, zero betas (reference eval convention)."""
    B = body_pose69.shape[0]
    body_rotmat = batch_rodrigues(
        torch.as_tensor(body_pose69, dtype=torch.float32).reshape(-1, 3)
    ).reshape(B, 23, 3, 3)
    if orient3 is None:
        orient_rotmat = torch.eye(3).expand(B, 1, 3, 3)
    else:
        orient_rotmat = batch_rodrigues(
            torch.as_tensor(orient3, dtype=torch.float32)).reshape(B, 1, 3, 3)
    with torch.no_grad():
        verts, joints = tsmpl.forward(torch.zeros(1, 10), body_rotmat,
                                      orient_rotmat)
    return verts.numpy(), joints.numpy()


# ---------------------------------------------------------------------------
# eval_3d (:1056-1282) + dynamic masking (:1082-1116)
# ---------------------------------------------------------------------------

def dynamic_mask(tsmpl, gt_pose_v, framerate_multiplier):
    """One view's dynamic-span mask (:1104-1116): GT joints at identity
    orient, per-frame diff x (30 * fm), max over joints, >= 2 m/s span."""
    F = gt_pose_v.shape[0]
    _, j = _smpl_aa(tsmpl, gt_pose_v[:, 3:])
    j_gt = j[:, :15]
    vel = np.sqrt(((j_gt[1:] - j_gt[:-1]) ** 2).sum(-1)) * (
        30 * framerate_multiplier)
    vel_mask = vel.max(1) >= 2
    inds = np.where(vel_mask)[0]
    mask = np.zeros((F,))
    if len(inds):
        mask[inds.min():inds.max()] = 1
    return mask


def eval_3d(tsmpl, pred_pose, gt_pose, baselines=None, dynamic_only=False,
            framerate_multiplier=None):
    """Per-view MPJPE/MPVPE columns like :1129-1277 (mpjpe-ours, mpvpe-ours,
    then each baseline)."""
    V, F = pred_pose.shape[:2]
    baselines = baselines or {}
    stats = {}

    for view in range(V):
        keep = np.arange(F)
        if dynamic_only:
            fm = (framerate_multiplier[view]
                  if framerate_multiplier is not None else 1.0)
            mask = dynamic_mask(tsmpl, gt_pose[view], fm)
            keep = np.array([f for f in range(F) if mask[f] != 0])

        v_gt, j_gt = _smpl_aa(tsmpl, gt_pose[view][keep][:, 3:])
        comparisons = [("ours", pred_pose[view][keep])]
        comparisons += [(k, p[view][keep]) for k, p in baselines.items()]
        for name, pose69 in comparisons:
            v_c, j_c = _smpl_aa(tsmpl, pose69)
            mpvpe = 1000 * reconstruction_error(v_gt, v_c, pa=False)
            mpjpe = 1000 * reconstruction_error(j_gt[:, :15], j_c[:, :15],
                                                pa=False)
            stats.setdefault(f"mpjpe-{name}", []).append(mpjpe)
            stats.setdefault(f"mpvpe-{name}", []).append(mpvpe)
    return stats


# ---------------------------------------------------------------------------
# eval_2d (:522-710)
# ---------------------------------------------------------------------------

def eval_2d(pred2d, labels, gt, bbox_diag):
    """recon_error_2d-*/pck-* per view: keypoint_loss('rmse').mean() and
    f_pck (:524-531, :631-675). First 15 joints only."""
    V = pred2d.shape[0]
    stats = {}

    def f_pck(p, g, w, size):
        p = torch.as_tensor(p, dtype=torch.float32)
        g = torch.as_tensor(g, dtype=torch.float32)
        w = torch.as_tensor(w, dtype=torch.float32)
        size = torch.as_tensor(size, dtype=torch.float32)
        size = size.unsqueeze(-1).unsqueeze(-1)
        rmse = torch.sqrt(1e-6 + ((p - g) ** 2).sum(-1, keepdim=True))
        mask = (w > 0.5).float()
        count = (mask * (rmse < (0.05 * size)).float()).sum()
        return float(100 * count / mask.sum())

    def add(name, pts):
        for view in range(V):
            p = torch.as_tensor(pts[view][:, :15, :2], dtype=torch.float32)
            g = torch.as_tensor(gt[view][:, :15, :2], dtype=torch.float32)
            w = torch.as_tensor(gt[view][:, :15, 2:], dtype=torch.float32)
            err = keypoint_loss(p, g, w, loss_type="rmse").mean()
            stats.setdefault(f"recon_error_2d-{name}", []).append(float(err))
            stats.setdefault(f"pck-{name}", []).append(
                f_pck(pts[view][:, :15, :2], gt[view][:, :15, :2],
                      gt[view][:, :15, 2:], bbox_diag[view]))

    add("ours", pred2d)
    for k, pts in labels.items():
        add(k, pts)
    return stats


# ---------------------------------------------------------------------------
# eval_3d_global (:992-1054) via rigid_transform_to_gt (:1490-1651)
# ---------------------------------------------------------------------------

def eval_3d_global(tsmpl, pred_j, pred_v, gt_pose, gt_trans,
                   glamr_pose=None, glamr_trans=None):
    """All-frames Kabsch on stacked vertices pred->GT (and GLAMR->GT),
    applied to vertices + joints, then reconstruction_error(pa=False)."""
    V, F = gt_pose.shape[:2]
    stats = {}

    def world(pose72, trans):
        v, j = _smpl_aa(tsmpl, pose72[:, 3:], pose72[:, :3])
        return v + trans[:, None, :], j + trans[:, None, :]

    for view in range(V):
        v_gt, j_gt = world(gt_pose[view], gt_trans[view])
        j_gt = j_gt[:, :15]
        comparisons = [("ours", pred_v[view], pred_j[view][:, :15])]
        if glamr_pose is not None:
            v_gl, j_gl = world(glamr_pose[view], glamr_trans[view])
            comparisons.append(("glamr", v_gl, j_gl[:, :15]))
        for name, v_c, j_c in comparisons:
            R, t = rigid_transform_3D(v_c.reshape(-1, 3),
                                      v_gt.reshape(-1, 3))
            v_a = (t + R @ v_c.reshape(-1, 3).T).T.reshape(v_gt.shape)
            j_a = (t + R @ j_c.reshape(-1, 3).T).T.reshape(j_gt.shape)
            stats.setdefault(f"mpjpe-{name}", []).append(
                1000 * reconstruction_error(j_gt, j_a, pa=False))
            stats.setdefault(f"mpvpe-{name}", []).append(
                1000 * reconstruction_error(v_gt, v_a, pa=False))
    return stats
