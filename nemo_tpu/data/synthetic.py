"""Synthetic multi-view problem generator.

Produces a ground-truth SMPL motion observed by known cameras with per-view
monotonic time warps — the closed-loop fixture the reference lacks (its only
oracle is metric CSVs on real data, SURVEY.md §4). A fit on this data must
drive 2D reprojection error toward zero and recover the 3D motion to within
a few millimetres, which is the core CI test for the whole framework.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..body.smpl import SMPLModel, smpl_forward
from ..body import constants
from ..geometry.camera import camera_from_params, project
from ..geometry.rotations import batch_rodrigues, rotmat_to_rot6d
from .bundle import MultiViewBundle


def smooth_motion(num_frames: int, seed: int = 0, amplitude: float = 0.35,
                  n_harmonics: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """A smooth, deterministic SMPL motion.

    Returns (fullpose_aa (F, 24, 3), trans (F, 3)): random low-frequency
    Fourier series per joint channel, zero at phase 0 for the translation
    (matching NeMo's trans(phase=0)=0 anchoring convention).
    """
    rng = np.random.RandomState(seed)
    t = np.linspace(0.0, 1.0, num_frames)[:, None]            # (F, 1)
    k = np.arange(1, n_harmonics + 1)[None, :]                # (1, H)

    def series(channels, amp):
        a = rng.randn(channels, n_harmonics) * amp / k         # (C, H)
        b = rng.randn(channels, n_harmonics) * amp / k
        base = rng.randn(channels) * amp * 0.5
        ang = 2 * np.pi * t * k                                # (F, H)
        return base[None] + np.sin(ang) @ a.T + (np.cos(ang) - 1.0) @ b.T

    pose = series(72, amplitude).reshape(num_frames, 24, 3)
    trans = series(3, 0.3)
    trans = trans - trans[:1]  # anchor phase 0 at origin
    return pose.astype(np.float32), trans.astype(np.float32)


def make_cameras(num_views: int, depth: float = 10.0, seed: int = 0
                 ) -> np.ndarray:
    """Ring of cameras looking at the origin, as 9-param encodings (V, 9)."""
    rng = np.random.RandomState(seed + 100)
    params = np.zeros((num_views, 9), np.float32)
    for v in range(num_views):
        yaw = 2 * np.pi * v / num_views + 0.1 * rng.randn()
        Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                       [0, 1, 0],
                       [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
        params[v, :3] = [0.1 * rng.randn(), 0.1 * rng.randn(),
                         depth + rng.randn()]
        # rot6d = first two columns, row-major (rotations.rotmat_to_rot6d)
        # in numpy: per-view EAGER jax dispatches cost ~50 s EACH over the
        # axon TPU tunnel (measured 209 s for 4 views — the entire
        # "Data loading" stall of every CLI run)
        params[v, 3:] = Ry[:, :2].reshape(6)
    return params


def monotone_warp(phases: np.ndarray, strength: float, seed: int
                  ) -> np.ndarray:
    """A random monotone [0,1]->[0,1] warp (positive Fourier-ish derivative)."""
    rng = np.random.RandomState(seed)
    a = np.abs(rng.randn(4)) + 0.2
    centers = rng.uniform(0, 1, 4)
    widths = rng.uniform(0.1, 0.4, 4)
    grid = np.linspace(0, 1, 512)
    dens = np.zeros_like(grid)
    for ai, ci, wi in zip(a, centers, widths):
        dens += ai * np.exp(-((grid - ci) / wi) ** 2)
    dens = 1.0 + strength * (dens / dens.mean() - 1.0)
    cdf = np.cumsum(dens)
    cdf = (cdf - cdf[0]) / (cdf[-1] - cdf[0])
    return np.interp(phases, grid, cdf).astype(np.float32)


def synthetic_problem(model: SMPLModel,
                      num_views: int = 4,
                      num_frames: int = 60,
                      img_hw: Tuple[int, int] = (1000, 1900),
                      noise_px: float = 0.0,
                      warp_strength: float = 0.5,
                      conf_dropout: float = 0.0,
                      seed: int = 0):
    """Generate a bundle plus its generating ground truth.

    Each view observes the same canonical motion at warped phases through its
    own camera; 2D keypoints are exact projections (+optional pixel noise),
    confidences 1 (with optional dropout to 0).

    Returns:
      (bundle, truth) where truth carries the canonical motion, per-view
      warps and cameras for direct assertions in tests.
    """
    rng = np.random.RandomState(seed)
    pose, trans = smooth_motion(num_frames, seed=seed)
    cams9 = make_cameras(num_views, seed=seed)
    betas = np.zeros((1, 10), np.float32)

    base_phase = np.linspace(0, 1, num_frames)
    proj_idx = np.asarray(constants.PROJ_JOINT_IDX_V0)

    # One batched device call for all views x frames (the naive per-view
    # eager loop costs minutes of dispatch on a 1-core host).
    warps = [monotone_warp(base_phase, warp_strength, seed * 31 + v)
             for v in range(num_views)]
    tidx = np.minimum((np.stack(warps) * num_frames).astype(np.int64),
                      num_frames - 1)                       # (V, F)
    pose_vf = pose[tidx]                                    # (V, F, 24, 3)
    trans_vf = trans[tidx]                                  # (V, F, 3)

    @jax.jit
    def gen_points(pose_vf, trans_vf, cams9):
        VF = num_views * num_frames
        rot = batch_rodrigues(pose_vf.reshape(VF, 24, 3))
        _, joints49 = smpl_forward(model, jnp.asarray(betas), rot[:, 1:],
                                   rot[:, :1], want_vertices=False)
        j = joints49[:, proj_idx] + trans_vf.reshape(VF, 1, 3)
        cam = camera_from_params(cams9, img_hw[0], img_hw[1])
        cam_b = jax.tree_util.tree_map(
            lambda a: jnp.repeat(a, num_frames, axis=0), cam)
        return project(j, cam_b).reshape(num_views, num_frames, 25, 2)

    pts2d = np.asarray(gen_points(jnp.asarray(pose_vf),
                                  jnp.asarray(trans_vf),
                                  jnp.asarray(cams9)))
    if noise_px > 0:
        pts2d = pts2d + noise_px * rng.randn(*pts2d.shape).astype(np.float32)
    conf = np.ones((num_views, num_frames, 25, 1), np.float32)
    if conf_dropout > 0:
        conf *= (rng.rand(*conf.shape) > conf_dropout)
    labels = np.concatenate([pts2d, conf], -1).astype(np.float32)
    hmr_theta = pose_vf[:, :, 1:].reshape(num_views, num_frames, 69)

    bundle = MultiViewBundle(
        labels={"gt": labels, "op": labels.copy()},
        hmr_theta=hmr_theta,
        hmr_mask=np.ones((num_views, num_frames, 1), np.float32),
        img_hw=np.asarray(img_hw, np.float32),
        gt3d_pose=np.stack([pose[np.minimum((w * num_frames).astype(np.int64),
                                            num_frames - 1)].reshape(
            num_frames, 72) for w in warps]),
        gt3d_trans=np.stack([trans[np.minimum((w * num_frames).astype(np.int64),
                                              num_frames - 1)] for w in warps]),
        gt_cameras=cams9,
        gt_betas=betas,
        name=f"synthetic_v{num_views}_f{num_frames}_s{seed}",
    )
    truth = {
        "pose": pose, "trans": trans, "cams9": cams9, "warps": np.stack(warps),
        "betas": betas,
    }
    return bundle, truth
