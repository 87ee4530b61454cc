"""VIBE video SMPL regressor: per-frame features -> GRU -> SPIN regressor.

Behavioral reference: VIBE/lib/models/vibe.py:27-179 — a 1-layer GRU
(hidden 2048, residual connection) over per-frame ResNet-50 features,
followed by the SPIN iterative Regressor on each frame. Frozen inference
component used to produce the `vibe_output.pkl` initialization NeMo consumes.

TPU-first: the GRU is a `lax.scan` over time with (B, 2048) matmul cells;
feature extraction and the regressor are batched over (batch x time).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..body.smpl import SMPLModel
from .hmr import (hmr_head, hmr_forward, spin_projection,
                  weak_perspective_projection, NPOSE)
from .resnet import Params, resnet50_features


def init_gru(key, input_size: int = 2048, hidden_size: int = 2048) -> Params:
    """torch.nn.GRU-layout parameters: gates ordered (r, z, n)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(hidden_size)

    def u(k, shape):
        return jax.random.uniform(k, shape, minval=-s, maxval=s)

    return {
        "w_ih": u(k1, (input_size, 3 * hidden_size)),
        "w_hh": u(k2, (hidden_size, 3 * hidden_size)),
        "b_ih": u(k3, (3 * hidden_size,)),
        "b_hh": u(k4, (3 * hidden_size,)),
    }


def gru_cell(p: Params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """torch GRU cell semantics: n = tanh(W_in x + b_in + r * (W_hn h + b_hn))."""
    H = h.shape[-1]
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def temporal_encoder(p: Params, feats: jnp.ndarray,
                     use_residual: bool = True) -> jnp.ndarray:
    """(B, T, 2048) -> (B, T, 2048) via GRU scan (+residual, vibe.py:52-63)."""
    B, T, F = feats.shape
    h0 = jnp.zeros((B, p["w_hh"].shape[0]))

    def step(h, x_t):
        h = gru_cell(p, x_t, h)
        return h, h

    _, ys = jax.lax.scan(step, h0, jnp.swapaxes(feats, 0, 1))  # (T, B, H)
    y = jnp.swapaxes(ys, 0, 1)
    if use_residual and y.shape[-1] == F:
        y = y + feats
    return y


def vibe_forward(backbone: Params, gru: Params, head: Params,
                 smpl: SMPLModel, images_nthwc: jnp.ndarray,
                 n_iter: int = 3) -> Dict[str, jnp.ndarray]:
    """Full VIBE_Demo path (vibe.py:160-179): crops -> features -> GRU ->
    per-frame SPIN regressor -> SMPL.

    images_nthwc: (B, T, H, W, 3) normalized crops.
    Returns dict with (B, T, ...) leading axes.
    """
    B, T = images_nthwc.shape[:2]
    flat = images_nthwc.reshape((B * T,) + images_nthwc.shape[2:])
    feats = resnet50_features(backbone, flat).reshape(B, T, -1)
    feats = temporal_encoder(gru, feats)

    out = hmr_forward_from_features(head, smpl, feats.reshape(B * T, -1),
                                    n_iter)
    return {k: v.reshape((B, T) + v.shape[1:]) for k, v in out.items()}


def hmr_forward_from_features(head: Params, smpl: SMPLModel,
                              features: jnp.ndarray, n_iter: int = 3
                              ) -> Dict[str, jnp.ndarray]:
    """SPIN Regressor on precomputed features (VIBE/lib/models/spin.py)."""
    from ..geometry.rotations import rot6d_to_rotmat, rotmat_to_aa
    from ..body.smpl import smpl_forward

    pose6d, shape, cam = hmr_head(head, features, n_iter)
    rotmat = rot6d_to_rotmat(pose6d.reshape(-1, 24, 6))
    verts, joints = smpl_forward(smpl, shape, rotmat[:, 1:], rotmat[:, :1])
    pose_aa = rotmat_to_aa(rotmat).reshape(-1, 72)
    theta = jnp.concatenate([cam, pose_aa, shape], axis=1)
    # kp_2d through SPIN's weak-persp->perspective conversion
    # (spin.py:309-322), matching reference vibe_output joints2d exactly
    return {"theta": theta, "verts": verts, "kp_3d": joints,
            "kp_2d": spin_projection(joints, cam)}


def convert_torch_gru(sd: dict, prefix: str = "encoder.gru.") -> Params:
    """torch GRU state dict -> our layout (weights transposed)."""
    def get(k):
        v = sd[prefix + k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)
    return {
        "w_ih": jnp.asarray(get("weight_ih_l0").T),
        "w_hh": jnp.asarray(get("weight_hh_l0").T),
        "b_ih": jnp.asarray(get("bias_ih_l0")),
        "b_hh": jnp.asarray(get("bias_hh_l0")),
    }
