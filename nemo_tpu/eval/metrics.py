"""Evaluation metrics: MPJPE / MPVPE / PA variants / PCK / 2D RMSE.

Behavioral reference: nemo/neural_motion_model.py eval_2d :522-710, eval_3d
:1056-1282, dynamic masking :1082-1116, eval_3d_global :992-1054; metric math
from nemo/utils/pose_utils.py:148-159.

TPU-first: the reference runs SMPL batch=1 in a Python double loop per
(view, frame); here each comparison set is ONE batched smpl_forward over the
whole (V, F) grid, and final reductions are float64 on host for CSV parity.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..body.smpl import SMPLModel, smpl_forward
from ..geometry.procrustes import reconstruction_error_np


def smpl_grid_forward(model: SMPLModel, body_pose_aa: np.ndarray,
                      want_vertices: bool = True,
                      chunk: int = 512) -> Tuple[np.ndarray, np.ndarray]:
    """SMPL forward over a flattened grid of axis-angle body poses.

    body_pose_aa: (N, 69); identity global orient, zero betas — matching the
    reference's eval calls smpl(betas=None, global_orient=None, body_pose,
    pose2rot=True) (:1141-1152).
    Returns (vertices (N, V, 3) or None, joints49 (N, 49, 3)).
    """
    N = body_pose_aa.shape[0]
    fn = jax.jit(lambda p: smpl_forward(
        model, jnp.zeros((1, 10)), p.reshape(-1, 69), jnp.zeros((p.shape[0], 3)),
        pose2rot=True, want_vertices=want_vertices))
    verts_out, joints_out = [], []
    for i in range(0, N, chunk):
        v, j = fn(jnp.asarray(body_pose_aa[i:i + chunk]))
        joints_out.append(np.asarray(j))
        if want_vertices:
            verts_out.append(np.asarray(v))
    joints = np.concatenate(joints_out)
    verts = np.concatenate(verts_out) if want_vertices else None
    return verts, joints


def dynamic_frame_mask(gt_joints15: np.ndarray,
                       framerate_multiplier: float = 1.0,
                       fps: float = 30.0,
                       vel_threshold: float = 2.0) -> np.ndarray:
    """Dynamic-range mask for one view (:1082-1116).

    gt_joints15: (F, 15, 3). A frame is dynamic when the max GT joint speed
    is >= vel_threshold m/s; the mask covers the CONTIGUOUS span from the
    first to the last dynamic frame (the reference fills inds.min()..max()).

    framerate_multiplier is the reference's raw-frames-per-resampled-frame
    ratio n_seq_frames / num_frames (multi_view_sequence.py:300): per-frame
    GT displacement x (30 fps x fm) = metres/second at the raw video rate
    (:1108-1110).
    """
    F = gt_joints15.shape[0]
    diff = gt_joints15[1:] - gt_joints15[:-1]
    vel = np.sqrt((diff ** 2).sum(-1)) * (fps * framerate_multiplier)
    vel_max = vel.max(1)
    mask = np.zeros(F)
    inds = np.where(vel_max >= vel_threshold)[0]
    if len(inds):
        mask[inds.min():inds.max()] = 1
    return mask


def eval_frame_indices(F: int, num_frames: int = -1) -> np.ndarray:
    """The reference's eval frame sampling: ncol = min(F, num_frames) when
    num_frames > 0 else F; frame = round(cidx / ncol * F)
    (eval loops :1139, :2258)."""
    ncol = F if num_frames <= 0 else min(F, num_frames)
    return np.minimum(np.round(np.arange(ncol) / ncol * F).astype(np.int64),
                      F - 1)


def eval_view_indices(V: int, num_views: int = -1,
                      view_idxs=()) -> np.ndarray:
    """View selection: explicit view_idxs, else the first min(V, num_views)
    (:1063-1075)."""
    if len(view_idxs):
        return np.asarray(view_idxs, np.int64)
    return np.arange(V if num_views <= 0 else min(V, num_views))


def eval_3d(model: SMPLModel,
            pred_pose: np.ndarray,
            gt_pose: np.ndarray,
            baselines: Optional[Dict[str, np.ndarray]] = None,
            baseline_masks: Optional[Dict[str, np.ndarray]] = None,
            dynamic_only: bool = False,
            framerate_multiplier: Optional[np.ndarray] = None,
            pa: bool = True,
            num_frames: int = -1,
            num_views: int = -1,
            view_idxs=(),
            ) -> Dict[str, list]:
    """Per-view MPJPE/MPVPE table (eval_3d :1056-1282).

    Args:
      pred_pose: (V, F, 69) predicted body pose (axis-angle).
      gt_pose: (V, F, 72) GT full pose; joints from gt_pose[..., 3:] with
        identity global orient, exactly like the reference.
      baselines: optional {name: (V, F, 69)} body poses (vibe/vs/pare/glamr).
      dynamic_only: restrict frames to the GT high-velocity span (the mask
        is computed over ALL frames, then applied to the sampled set, like
        the reference's skip at :1255-1257).
      pa: also emit pa_mpjpe-* columns (Procrustes-aligned,
        reconstruction_error pa=True — the BASELINE.md north-star metric; a
        superset of the reference's CSV columns).
      num_frames / num_views / view_idxs: the reference eval methods'
        subsampling surface (:1060-1075, frame = round(cidx/ncol*F)).
    Returns:
      {column: [per-view values]} with the reference's column names.
    """
    V, F = pred_pose.shape[:2]
    baselines = baselines or {}
    views = eval_view_indices(V, num_views, view_idxs)
    fidx = eval_frame_indices(F, num_frames)

    def grid(poses69):
        v, j = smpl_grid_forward(model, poses69.reshape(V * F, 69))
        return (v.reshape(V, F, -1, 3), j.reshape(V, F, 49, 3)[..., :15, :])

    v_gt, j_gt = grid(gt_pose[..., 3:])
    v_pred, j_pred = grid(pred_pose)
    base_grids = {k: grid(p) for k, p in baselines.items()}

    if dynamic_only:
        fr = (framerate_multiplier if framerate_multiplier is not None
              else np.ones(V))
        masks = np.stack([dynamic_frame_mask(j_gt[v], fr[v])
                          for v in range(V)])
    else:
        masks = np.ones((V, F))

    stats: Dict[str, list] = {}

    def add(name, v_cmp, j_cmp):
        for v in views:
            sel = fidx[masks[v][fidx] > 0]
            mpvpe = 1000 * reconstruction_error_np(v_gt[v][sel],
                                                   v_cmp[v][sel], pa=False)
            mpjpe = 1000 * reconstruction_error_np(j_gt[v][sel],
                                                   j_cmp[v][sel], pa=False)
            stats.setdefault(f"mpjpe-{name}", []).append(float(mpjpe))
            stats.setdefault(f"mpvpe-{name}", []).append(float(mpvpe))
            if pa:
                pj = 1000 * reconstruction_error_np(j_gt[v][sel],
                                                    j_cmp[v][sel], pa=True)
                stats.setdefault(f"pa_mpjpe-{name}", []).append(float(pj))

    add("ours", v_pred, j_pred)
    for k, (vb, jb) in base_grids.items():
        add(k, vb, jb)
    return stats


def eval_3d_pa(model: SMPLModel, pred_pose: np.ndarray, gt_pose: np.ndarray
               ) -> Dict[str, list]:
    """PA-MPJPE per view (Procrustes-aligned variant, pose_utils pa=True)."""
    V, F = pred_pose.shape[:2]
    _, j_gt = smpl_grid_forward(model, gt_pose[..., 3:].reshape(V * F, 69),
                                want_vertices=False)
    _, j_pred = smpl_grid_forward(model, pred_pose.reshape(V * F, 69),
                                  want_vertices=False)
    j_gt = j_gt.reshape(V, F, 49, 3)[..., :15, :]
    j_pred = j_pred.reshape(V, F, 49, 3)[..., :15, :]
    out = {"pa_mpjpe-ours": []}
    for v in range(V):
        out["pa_mpjpe-ours"].append(float(
            1000 * reconstruction_error_np(j_gt[v], j_pred[v], pa=True)))
    return out


def rmse_2d(pred: np.ndarray, gt: np.ndarray, conf: np.ndarray) -> float:
    """2D recon error (eval_2d's keypoint_loss 'rmse' then .mean()).

    NOTE: the mean runs over ALL entries including confidence-gated zeros —
    replicating :631-636 exactly.
    """
    gate = (conf > 0.5).astype(np.float64)
    rmse = gate * np.sqrt(1e-6 + ((pred - gt) ** 2).sum(-1, keepdims=True))
    return float(rmse.mean())


def pck_2d(pred: np.ndarray, gt: np.ndarray, conf: np.ndarray,
           bbox_diag: np.ndarray, thresh: float = 0.05) -> float:
    """PCK @ thresh * bbox diagonal, % (f_pck :524-531)."""
    gate = (conf > 0.5).astype(np.float64)
    rmse = np.sqrt(1e-6 + ((pred - gt) ** 2).sum(-1, keepdims=True))
    size = bbox_diag[..., None, None]
    count = (gate * (rmse < thresh * size)).sum()
    total = gate.sum()
    return float(100.0 * count / max(total, 1))


def eval_2d(points2d_pred: np.ndarray,
            labels: Dict[str, np.ndarray],
            gt_label: np.ndarray,
            bbox_diag: np.ndarray,
            num_frames: int = -1,
            num_views: int = -1,
            view_idxs=()) -> Dict[str, list]:
    """Per-view 2D table (eval_2d :522-710): first 15 joints only.

    Args:
      points2d_pred: (V, F, 25, 2) projected predictions.
      labels: {name: (V, F, 25, >=2)} baseline 2D sets (op/vibe/vs/pare).
      gt_label: (V, F, 25, 3) GT 2D with confidence.
      bbox_diag: (V, F).
      num_frames / num_views / view_idxs: the reference's subsampling
        surface (:533-546, frame = round(cidx/ncol*F) at :593).
    """
    V, F = points2d_pred.shape[:2]
    views = eval_view_indices(V, num_views, view_idxs)
    fidx = eval_frame_indices(F, num_frames)
    stats: Dict[str, list] = {}

    def add(name, pts):
        for v in views:
            p = pts[v][fidx][:, :15, :2]
            g = gt_label[v][fidx][:, :15, :2]
            c = gt_label[v][fidx][:, :15, 2:]
            stats.setdefault(f"recon_error_2d-{name}", []).append(
                rmse_2d(p, g, c))
            stats.setdefault(f"pck-{name}", []).append(
                pck_2d(p, g, c, bbox_diag[v][fidx]))

    add("ours", points2d_pred)
    for k, pts in labels.items():
        add(k, pts)
    return stats


def world_grid_forward(model: SMPLModel, pose72: np.ndarray,
                       trans: np.ndarray, n_joints: int = 15
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """World-frame SMPL forward over a (V, F) grid of full poses.

    pose72: (V, F, 72) with global orient in [:3]; trans: (V, F, 3).
    smpl(betas=None, body_pose=pose[3:], global_orient=pose[:3]) + trans —
    the rigid_transform_to_gt GT/GLAMR recipe
    (neural_motion_model.py:1535-1545, :1566-1577).
    Returns (vertices (V, F, 6890, 3), joints (V, F, n_joints, 3)).
    """
    V, F = pose72.shape[:2]
    fn = jax.jit(lambda p, t: smpl_forward(
        model, jnp.zeros((1, 10)), p[:, 3:], p[:, :3], pose2rot=True,
        want_vertices=True, transl=t))
    vs, js = [], []
    for v in range(V):
        vv, jj = fn(jnp.asarray(pose72[v]), jnp.asarray(trans[v]))
        vs.append(np.asarray(vv))
        js.append(np.asarray(jj)[:, :n_joints])
    return np.stack(vs), np.stack(js)


def eval_3d_global(model: SMPLModel,
                   pred_j: np.ndarray, pred_v: np.ndarray,
                   gt_pose: np.ndarray, gt_trans: np.ndarray,
                   glamr_pose: Optional[np.ndarray] = None,
                   glamr_trans: Optional[np.ndarray] = None,
                   pred_trans: Optional[np.ndarray] = None,
                   want_aligned: bool = False,
                   num_frames: int = -1,
                   num_views: int = -1,
                   view_idxs=()):
    """Global-frame errors after an ALL-FRAMES rigid (Kabsch) alignment
    (eval_3d_global :992-1054 + rigid_transform_to_gt :1490-1651).

    Args:
      pred_j: (V, F, >=15, 3) world-frame predicted joints — get_preds'
        'j' output (the 25-joint projection selection); the first 15 are
        compared (:1026-1027).
      pred_v: (V, F, 6890, 3) world-frame predicted vertices.
      gt_pose: (V, F, 72) GT full pose (orient in [:3]); gt_trans (V, F, 3).
      glamr_pose / glamr_trans: optional GLAMR world baseline, same layout
        (the reference always emits its columns; here they appear when the
        bundle carries GLAMR world data).

    Per view, a rigid_transform_3D (NO scale) is fit on the stacked
    all-frames VERTICES pred->GT and applied to vertices and joints
    (:1594-1651); columns are exactly the reference's
    mpjpe-ours/mpvpe-ours/mpjpe-glamr/mpvpe-glamr (:1038-1052).

    want_aligned=True additionally returns (stats, aligned) where aligned
    holds per-view-aligned ROOT translations ('gt-t', 'pred-t', 'glamr-t'
    when inputs were given) — rigid_transform_to_gt also transforms trans
    (:1612-1617, :1643-1648), feeding the overlay.png trajectory plot.
    """
    from ..geometry.procrustes import rigid_transform_np

    V, F = gt_pose.shape[:2]
    views = eval_view_indices(V, num_views, view_idxs)
    fidx = eval_frame_indices(F, num_frames)

    def sub(a):
        return None if a is None else np.asarray(a)[:, fidx]

    gt_trans = sub(gt_trans)
    v_gt, j_gt = world_grid_forward(model, np.asarray(gt_pose)[:, fidx],
                                    gt_trans)

    stats: Dict[str, list] = {"mpjpe-ours": [], "mpvpe-ours": []}
    # gt-t restricted to the SAME selected views as pred-t/glamr-t so the
    # aligned dict's rows pair up under view subsetting
    aligned: Dict[str, np.ndarray] = {"gt-t": np.asarray(gt_trans)[views]}
    comparisons = [("ours", sub(pred_v), sub(pred_j)[..., :15, :],
                    sub(pred_trans))]
    if glamr_pose is not None and glamr_trans is not None:
        v_gl, j_gl = world_grid_forward(model, np.asarray(glamr_pose)[:, fidx],
                                        sub(glamr_trans))
        comparisons.append(("glamr", v_gl, j_gl, sub(glamr_trans)))
        stats["mpjpe-glamr"] = []
        stats["mpvpe-glamr"] = []

    for name, v_cmp, j_cmp, t_cmp in comparisons:
        t_out = [] if t_cmp is not None else None
        for v in views:
            R, t = rigid_transform_np(v_cmp[v].reshape(-1, 3),
                                      v_gt[v].reshape(-1, 3))
            align = lambda X: X.reshape(-1, 3) @ R.T + t
            vv = align(v_cmp[v]).reshape(v_gt[v].shape)
            vj = align(j_cmp[v]).reshape(j_gt[v].shape)
            stats[f"mpjpe-{name}"].append(float(
                1000 * reconstruction_error_np(j_gt[v], vj, pa=False)))
            stats[f"mpvpe-{name}"].append(float(
                1000 * reconstruction_error_np(v_gt[v], vv, pa=False)))
            if t_out is not None:
                t_out.append(align(np.asarray(t_cmp[v])))
        if t_out is not None:
            key = "pred-t" if name == "ours" else f"{name}-t"
            aligned[key] = np.stack(t_out)
    if want_aligned:
        return stats, aligned
    return stats


def write_csv(stats: Dict[str, list], path: str) -> None:
    """pandas-compatible CSV (index column first, like df.to_csv)."""
    import csv
    import os
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cols = list(stats.keys())
    n = len(next(iter(stats.values()))) if stats else 0
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] + cols)
        for i in range(n):
            w.writerow([i] + [stats[c][i] for c in cols])
