"""HMR/SPIN single-image SMPL regressor.

Behavioral reference: hmr/hmr_model.py:60-207 — ResNet-50 features -> 3
iterations of an MLP that refines (pose 24x6D, shape 10, cam 3) from the
SMPL mean parameters, then SMPL forward + weak-perspective projection.
Frozen inference component (SPIN checkpoint); dropout is identity.

TPU-first: the 3 refinement iterations are a trace-time Python loop over
pure matmuls (static; XLA unrolls and fuses), SMPL is our fused LBS, and the
whole thing jits as one program per batch size.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..body.smpl import SMPLModel, smpl_forward
from ..geometry.rotations import rot6d_to_rotmat, rotmat_to_aa
from .resnet import Params, convert_torch_resnet50, init_resnet50, resnet50_features

NPOSE = 24 * 6


def init_hmr_head(key, feat_dim: int = 2048) -> Params:
    ks = jax.random.split(key, 5)

    def lin(k, i, o, gain=None):
        if gain is None:
            s = 1.0 / np.sqrt(i)
            kw, kb = jax.random.split(k)
            return (jax.random.uniform(kw, (i, o), minval=-s, maxval=s),
                    jax.random.uniform(kb, (o,), minval=-s, maxval=s))
        a = gain * np.sqrt(6.0 / (i + o))
        return (jax.random.uniform(k, (i, o), minval=-a, maxval=a),
                jnp.zeros(o))

    fc1_w, fc1_b = lin(ks[0], feat_dim + NPOSE + 13, 1024)
    fc2_w, fc2_b = lin(ks[1], 1024, 1024)
    dp_w, dp_b = lin(ks[2], 1024, NPOSE, gain=0.01)
    ds_w, ds_b = lin(ks[3], 1024, 10, gain=0.01)
    dc_w, dc_b = lin(ks[4], 1024, 3, gain=0.01)
    # mean params default: identity-ish pose in 6D, zero shape, unit cam
    mean_pose = jnp.tile(jnp.array([1., 0, 0, 1, 0, 0]), (24,))
    return {
        "fc1_w": fc1_w, "fc1_b": fc1_b, "fc2_w": fc2_w, "fc2_b": fc2_b,
        "decpose_w": dp_w, "decpose_b": dp_b,
        "decshape_w": ds_w, "decshape_b": ds_b,
        "deccam_w": dc_w, "deccam_b": dc_b,
        "init_pose": mean_pose[None], "init_shape": jnp.zeros((1, 10)),
        "init_cam": jnp.array([[0.9, 0.0, 0.0]]),
    }


def hmr_head(p: Params, features: jnp.ndarray, n_iter: int = 3
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Iterative refinement (hmr_model.py:166-180). Dropout = identity."""
    B = features.shape[0]
    pose = jnp.broadcast_to(p["init_pose"], (B, NPOSE))
    shape = jnp.broadcast_to(p["init_shape"], (B, 10))
    cam = jnp.broadcast_to(p["init_cam"], (B, 3))
    for _ in range(n_iter):
        xc = jnp.concatenate([features, pose, shape, cam], axis=1)
        xc = xc @ p["fc1_w"] + p["fc1_b"]
        xc = xc @ p["fc2_w"] + p["fc2_b"]
        pose = xc @ p["decpose_w"] + p["decpose_b"] + pose
        shape = xc @ p["decshape_w"] + p["decshape_b"] + shape
        cam = xc @ p["deccam_w"] + p["deccam_b"] + cam
    return pose, shape, cam


def weak_perspective_projection(joints: jnp.ndarray, cam: jnp.ndarray
                                ) -> jnp.ndarray:
    """VIBE-style weak perspective: s * (x, y) + t (normalized coords)."""
    s = cam[:, 0:1, None]
    t = cam[:, None, 1:3]
    return s * joints[..., :2] + t


def spin_projection(joints: jnp.ndarray, cam: jnp.ndarray,
                    focal_length: float = 5000.0,
                    img_res: float = 224.0) -> jnp.ndarray:
    """SPIN's kp_2d: weak-persp cam -> perspective projection, normalized.

    VIBE/lib/models/spin.py:309-322: the (s, tx, ty) camera becomes a
    translation t = (tx, ty, 2f / (res * s + 1e-9)); joints project through
    an identity-rotation perspective camera centered at 0 and are divided by
    res/2, landing in [-1, 1] crop coordinates. This is the exact transform
    behind the joints2d in reference vibe_output.pkl files.
    """
    tz = 2.0 * focal_length / (img_res * cam[:, 0] + 1e-9)
    t = jnp.stack([cam[:, 1], cam[:, 2], tz], axis=-1)       # (B, 3)
    pts = joints + t[:, None, :]
    xy = pts[..., :2] / pts[..., 2:3]
    return focal_length * xy / (img_res / 2.0)


def hmr_forward(backbone: Params, head: Params, smpl: SMPLModel,
                images_nhwc: jnp.ndarray, n_iter: int = 3
                ) -> Dict[str, jnp.ndarray]:
    """Full HMR: image -> theta dict (hmr_model.py:145-207).

    Returns {'theta': (B, 85) = [cam3, pose72(aa), shape10], 'verts',
    'kp_3d' (49 joints), 'kp_2d' (weak-perspective)}.
    """
    feats = resnet50_features(backbone, images_nhwc)
    pose6d, shape, cam = hmr_head(head, feats, n_iter)
    rotmat = rot6d_to_rotmat(pose6d.reshape(-1, 24, 6))       # (B, 24, 3, 3)
    verts, joints = smpl_forward(smpl, shape, rotmat[:, 1:], rotmat[:, :1])
    pose_aa = rotmat_to_aa(rotmat).reshape(-1, 72)
    theta = jnp.concatenate([cam, pose_aa, shape], axis=1)
    return {
        "theta": theta,
        "verts": verts,
        "kp_3d": joints,
        "kp_2d": weak_perspective_projection(joints, cam),
    }


def convert_torch_hmr(sd: dict) -> Tuple[Params, Params]:
    """SPIN checkpoint ('model' state dict) -> (backbone, head) pytrees."""
    def get(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    backbone = convert_torch_resnet50(sd)
    head = {
        "fc1_w": jnp.asarray(get("fc1.weight").T),
        "fc1_b": jnp.asarray(get("fc1.bias")),
        "fc2_w": jnp.asarray(get("fc2.weight").T),
        "fc2_b": jnp.asarray(get("fc2.bias")),
        "decpose_w": jnp.asarray(get("decpose.weight").T),
        "decpose_b": jnp.asarray(get("decpose.bias")),
        "decshape_w": jnp.asarray(get("decshape.weight").T),
        "decshape_b": jnp.asarray(get("decshape.bias")),
        "deccam_w": jnp.asarray(get("deccam.weight").T),
        "deccam_b": jnp.asarray(get("deccam.bias")),
        "init_pose": jnp.asarray(get("init_pose")),
        "init_shape": jnp.asarray(get("init_shape")),
        "init_cam": jnp.asarray(get("init_cam")),
    }
    return backbone, head


def imagenet_normalize(images_uint8_nhwc: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB -> normalized float (hmr/img_utils.py crop pipeline)."""
    mean = jnp.array([0.485, 0.456, 0.406])
    std = jnp.array([0.229, 0.224, 0.225])
    return (images_uint8_nhwc.astype(jnp.float32) / 255.0 - mean) / std
