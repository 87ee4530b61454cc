"""Neural modules as explicit parameter pytrees + pure apply functions.

Behavioral reference: /root/reference/nemo/neural_motion_model.py:58-148
(FCNN, MotionNet), /root/reference/monotonic_network.py:7-39, and
/root/reference/nemo/rbf.py:11-139.

Modules are plain dicts of jnp arrays with ``init_*``/``apply_*`` pairs —
the idiomatic functional style for a system whose entire training loop lives
inside one ``lax.scan``. Per-view networks (phase warps) hold stacked
parameters and are applied with ``vmap``, eliminating the reference's
Python-loop-over-views (neural_motion_model.py:3652-3657).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..geometry.rotations import rot6d_to_rotmat, rotmat_to_aa

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# initializers matching torch defaults
# ---------------------------------------------------------------------------

def _kaiming_uniform_linear(key, fan_in: int, fan_out: int):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    # torch kaiming_uniform(a=sqrt(5)) gives bound sqrt(6/((1+5)fan_in)) =
    # 1/sqrt(fan_in) for the weight as well.
    W = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound)
    return W, b


def _xavier_uniform(key, fan_in: int, fan_out: int, gain: float):
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), minval=-a, maxval=a)


# ---------------------------------------------------------------------------
# FCNN: 3-layer ReLU MLP (neural_motion_model.py:58-71)
# ---------------------------------------------------------------------------

def init_fcnn(key, input_dim: int, h_dim: int, output_dim: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    W1, b1 = _kaiming_uniform_linear(k1, input_dim, h_dim)
    W2, b2 = _kaiming_uniform_linear(k2, h_dim, h_dim)
    W3, b3 = _kaiming_uniform_linear(k3, h_dim, output_dim)
    return {"W1": W1, "b1": b1, "W2": W2, "b2": b2, "W3": W3, "b3": b3}


def net_precision():
    """Matmul precision for the network MLPs (NEMO_TPU_NET_PRECISION:
    highest|high|default|bf16, default 'highest' = the package-global pin).
    'high' runs the TPU MXU in 3-pass bf16 (~1e-6 rel error) at ~2x the
    6-pass 'highest' rate; 'bf16' casts both operands to bf16 and runs a
    single MXU pass with f32 accumulation (~4e-3 rel error, fastest); the
    geometry/body math stays HIGHEST regardless (house convention —
    mm-level eval parity lives there, not here)."""
    import os
    name = os.environ.get("NEMO_TPU_NET_PRECISION", "highest").upper()
    if name == "BF16":
        return "BF16"
    return getattr(jax.lax.Precision, name)


def _dot(x, w):
    prec = net_precision()
    if prec == "BF16":
        return jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(x, w, precision=prec)


def apply_fcnn(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(_dot(x, p["W1"]) + p["b1"])
    h = jax.nn.relu(_dot(h, p["W2"]) + p["b2"])
    return _dot(h, p["W3"]) + p["b3"]


# ---------------------------------------------------------------------------
# MotionNet: trunk -> (per-joint 6D rotations, linear head)
# (neural_motion_model.py:106-148)
# ---------------------------------------------------------------------------

IDENTITY_6D = jnp.array([1.0, 0.0, 0.0, 1.0, 0.0, 0.0])


def init_motion_net(key, input_dim: int, h_dim: int, n_joints: int,
                    n_linear_out: int = 3,
                    init_last_layer_zero: bool = True) -> Params:
    """n_joints counts orient + body joints (NeMo uses 23 + 1 = 24).

    init_last_layer_zero replicates the reference's near-identity init:
    xavier gain 1e-5 on the rotation head weight and identity-6D bias
    (:120-126). Gain exactly 0 NaNs the reference's gradients; ours tolerates
    0 but we keep 1e-5 for behavioral parity.
    """
    k_tr, k_rot, k_lin = jax.random.split(key, 3)
    trunk = init_fcnn(k_tr, input_dim, h_dim, h_dim)
    if init_last_layer_zero:
        W_rot = _xavier_uniform(k_rot, h_dim, n_joints * 6, gain=1e-5)
        b_rot = jnp.tile(IDENTITY_6D, (n_joints,))
    else:
        W_rot = _xavier_uniform(k_rot, h_dim, n_joints * 6, gain=0.01)
        b_rot = jnp.zeros(n_joints * 6)
    W_lin, b_lin = _kaiming_uniform_linear(k_lin, h_dim, n_linear_out)
    return {"trunk": trunk, "W_rot": W_rot, "b_rot": b_rot,
            "W_lin": W_lin, "b_lin": b_lin}


def apply_motion_net(p: Params, x: jnp.ndarray, n_joints: int
                     ) -> Tuple[dict, dict, jnp.ndarray]:
    """Returns (pose_dict, orient_dict, trans) like the reference forward.

    pose_dict/orient_dict carry 'rot6d', 'rotmat', 'pose' (axis-angle); the
    first joint of the head is the global orientation, the remaining
    n_joints-1 are body joints (:138-147).
    """
    B = x.shape[0]
    from ..ops.mlp_pallas import mlp_pallas_available, motion_net_mlp
    if mlp_pallas_available():
        # fused Pallas trunk+heads (VMEM-resident weights, custom VJP;
        # NEMO_TPU_NET_FUSED=1) — same math/precision as the jnp path
        rot6d, trans = motion_net_mlp(p, x, n_joints,
                                      p["W_lin"].shape[1])
    else:
        z = jax.nn.relu(apply_fcnn(p["trunk"], x))
        rot6d = _dot(z, p["W_rot"]) + p["b_rot"]           # (B, n_joints*6)
        trans = _dot(z, p["W_lin"]) + p["b_lin"]
    rotmat = rot6d_to_rotmat(rot6d.reshape(B, n_joints, 6))  # (B, J, 3, 3)
    pose = rotmat_to_aa(rotmat).reshape(B, n_joints * 3)
    orient = {"rot6d": rot6d[:, :6], "rotmat": rotmat[:, :1],
              "pose": pose[:, :3]}
    pose_d = {"rot6d": rot6d[:, 6:], "rotmat": rotmat[:, 1:],
              "pose": pose[:, 3:]}
    return pose_d, orient, trans


# ---------------------------------------------------------------------------
# RotNet: trunk -> per-joint 6D rotations (neural_motion_model.py:74-103)
# ---------------------------------------------------------------------------

def init_rot_net(key, input_dim: int, h_dim: int, n_joints: int,
                 init_last_layer_zero: bool = True) -> Params:
    k_tr, k_rot = jax.random.split(key)
    trunk = init_fcnn(k_tr, input_dim, h_dim, h_dim)
    if init_last_layer_zero:
        W = _xavier_uniform(k_rot, h_dim, n_joints * 6, gain=1e-5)
        b = jnp.tile(IDENTITY_6D, (n_joints,))
    else:
        W = _xavier_uniform(k_rot, h_dim, n_joints * 6, gain=0.01)
        b = jnp.zeros(n_joints * 6)
    return {"trunk": trunk, "W_rot": W, "b_rot": b}


def apply_rot_net(p: Params, x: jnp.ndarray, n_joints: int) -> dict:
    """Returns {'rot6d', 'rotmat', 'pose'} like the reference RotNet."""
    B = x.shape[0]
    z = jax.nn.relu(apply_fcnn(p["trunk"], x))
    rot6d = _dot(z, p["W_rot"]) + p["b_rot"]
    rotmat = rot6d_to_rotmat(rot6d.reshape(B, n_joints, 6))
    pose = rotmat_to_aa(rotmat).reshape(B, n_joints * 3)
    return {"rot6d": rot6d, "rotmat": rotmat, "pose": pose}


# ---------------------------------------------------------------------------
# Monotonic phase-warp network (monotonic_network.py:7-39), stacked per view
# ---------------------------------------------------------------------------

def init_monotonic(key, num_views: int, n_nodes: int,
                   init: str = "rand") -> Params:
    """Stacked parameters for all views: shapes (num_views, n_nodes)."""
    if init == "linear":
        shifts = jnp.tile(jnp.linspace(0.0, 1.0, n_nodes), (num_views, 1))
    elif init == "rand":
        shifts = jax.random.uniform(key, (num_views, n_nodes))
    else:
        raise ValueError(f"unknown init {init!r}")
    shifts = jnp.clip(shifts, 0.0, 1.0)
    scales = jnp.full((num_views, n_nodes), 15.0)
    return {"shifts": shifts, "scales": scales}


def _monotonic_pass(shifts: jnp.ndarray, scales: jnp.ndarray,
                    x: jnp.ndarray) -> jnp.ndarray:
    """x: (..., 1) -> (..., 1); shifts/scales: (n_nodes,)."""
    sh = jax.nn.relu(shifts)
    sc = jax.nn.relu(scales)
    z = sc * (x - sh)  # broadcast (..., n_nodes)
    return jax.nn.sigmoid(z).mean(axis=-1, keepdims=True)


def apply_monotonic_single(shifts: jnp.ndarray, scales: jnp.ndarray,
                           x: jnp.ndarray) -> jnp.ndarray:
    """One view's warp: renormalized so f(0)=0, f(1)=1 (:32-39)."""
    y = _monotonic_pass(shifts, scales, x)
    y0 = _monotonic_pass(shifts, scales, jnp.zeros_like(x))
    y1 = _monotonic_pass(shifts, scales, jnp.ones_like(x))
    return (y - y0) / (y1 - y0 + 1e-6)


def apply_monotonic_all_views(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate every view's warp on the same inputs.

    x: (B, 1) -> (num_views, B, 1). Replaces the reference's Python loop
    (neural_motion_model.py:3652-3655) with a single vmap.
    """
    return jax.vmap(lambda sh, sc: apply_monotonic_single(sh, sc, x))(
        p["shifts"], p["scales"])


def apply_monotonic_gather(p: Params, view_idx: jnp.ndarray,
                           x: jnp.ndarray) -> jnp.ndarray:
    """Warp each sample through its own view's network.

    view_idx: (B,) int; x: (B, 1) -> (B, 1). Gathers per-sample parameters
    instead of computing all views x all samples (the reference computes the
    full (V, B) product then indexes :3656; for B=512, V=8 the gather is 8x
    less work).
    """
    sh = p["shifts"][view_idx]   # (B, n_nodes)
    sc = p["scales"][view_idx]
    return apply_monotonic_single(sh, sc, x)


# ---------------------------------------------------------------------------
# RBF phase embedding (nemo/rbf.py:11-139)
# ---------------------------------------------------------------------------

def _phi_gaussian(a):
    return jnp.exp(-(a ** 2))


def _phi_linear(a):
    return a


def _phi_quadratic(a):
    return a ** 2


def _phi_inverse_quadratic(a):
    return 1.0 / (1.0 + a ** 2)


def _phi_multiquadric(a):
    return jnp.sqrt(1.0 + a ** 2)


def _phi_inverse_multiquadric(a):
    return 1.0 / jnp.sqrt(1.0 + a ** 2)


def _phi_spline(a):
    return a ** 2 * jnp.log(a + 1.0)


def _phi_poisson_one(a):
    return (a - 1.0) * jnp.exp(-a)


def _phi_poisson_two(a):
    return ((a - 2.0) / 2.0) * a * jnp.exp(-a)


def _phi_matern32(a):
    s3 = math.sqrt(3.0)
    return (1.0 + s3 * a) * jnp.exp(-s3 * a)


def _phi_matern52(a):
    s5 = math.sqrt(5.0)
    return (1.0 + s5 * a + (5.0 / 3.0) * a ** 2) * jnp.exp(-s5 * a)


RBF_KERNELS: Dict[str, Callable] = {
    "gaussian": _phi_gaussian,
    "linear": _phi_linear,
    "quadratic": _phi_quadratic,
    "inverse quadratic": _phi_inverse_quadratic,
    "multiquadric": _phi_multiquadric,
    "inverse multiquadric": _phi_inverse_multiquadric,
    "spline": _phi_spline,
    "poisson one": _phi_poisson_one,
    "poisson two": _phi_poisson_two,
    "matern32": _phi_matern32,
    "matern52": _phi_matern52,
}


def init_rbf(out_features: int) -> Params:
    """Fixed centres linspace(0, 1, K); learned log_sigmas init 0 (:38-45)."""
    assert out_features > 2
    return {"log_sigmas": jnp.zeros(out_features)}


def rbf_centres(out_features: int) -> jnp.ndarray:
    return jnp.linspace(0.0, 1.0, out_features)


def apply_rbf(p: Params, x: jnp.ndarray, kernel: str = "linear"
              ) -> jnp.ndarray:
    """x: (B, 1) -> (B, K).

    Distances are *squared* (no sqrt), exactly like the reference's NaN-grad
    fix (nemo/rbf.py:51-54): d = (x - c)^2 / exp(log_sigma).
    """
    K = p["log_sigmas"].shape[0]
    c = rbf_centres(K)
    d = (x - c[None, :]) ** 2 / jnp.exp(p["log_sigmas"])[None, :]
    return RBF_KERNELS[kernel](d)
