"""Rotation representation conversions, pure jnp and fully vmappable.

Behavioral reference: /root/reference/hmr/geometry.py (rot6d_to_rotmat :47-61,
batch_rodrigues :9-23, rotation_matrix_to_angle_axis :181-210 with its NaN->0
patch at :209) and /root/reference/human_body_prior/body_model/lbs.py
(batch_rodrigues :303-334). All functions here are branchless — the
reference's NaN workarounds (identity rotations produce 0/0 in the quaternion
path) are replaced by `safe` epsilon-guarded formulations with the same
fixed-point behavior: identity rotation maps to the zero axis-angle vector and
gradients stay finite at that point.

Every function operates on the last axes only, so arbitrary leading batch
dimensions work and everything composes with vmap/jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = True,
               eps: float = _EPS) -> jnp.ndarray:
    """Norm with a non-NaN gradient at zero (sqrt of eps-shifted sumsq)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def _normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Matches torch.nn.functional.normalize: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> 3x3 rotation matrix (Zhou et al. 2019).

    Matches hmr/geometry.py:47-61: input is interpreted as a (3, 2) column
    pair [a1, a2]; output columns are the Gram-Schmidt frame.

    Args:
      x: (..., 6) — viewed as (..., 3, 2).
    Returns:
      (..., 3, 3)
    """
    x = x.reshape(x.shape[:-1] + (3, 2))
    a1 = x[..., 0]
    a2 = x[..., 1]
    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rot6d_to_rotmat up to Gram-Schmidt: first two columns."""
    return R[..., :2].reshape(R.shape[:-2] + (6,))


def batch_rodrigues(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> rotation matrix via the Rodrigues formula.

    Direct formulation (no quaternion detour, unlike hmr/geometry.py:9-23)
    but numerically equivalent; identical eps-shifted angle so outputs match
    the reference bit-for-bit in the small-angle regime it cares about
    (human_body_prior/body_model/lbs.py:303-334 uses angle=||aa + 1e-8||).

    Args:
      aa: (..., 3)
    Returns:
      (..., 3, 3)
    """
    # Reference adds 1e-8 to the vector before the norm; replicate exactly.
    angle = _safe_norm(aa + 1e-8, eps=0.0)  # (..., 1); never 0 due to shift
    axis = aa / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]

    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([
        zeros, -rz, ry,
        rz, zeros, -rx,
        -ry, rx, zeros,
    ], axis=-1).reshape(aa.shape[:-1] + (3, 3))
    ident = jnp.eye(3, dtype=aa.dtype)
    # K is skew(axis), so K@K == a a^T - (a.a) I in exact arithmetic.
    # The closed form avoids batched (3,3) matmuls, which XLA:TPU executes
    # one tile per matrix — the K@K dot_generals (fwd + VJP) plus their
    # layout copies were ~25% of the whole fit step (profile_step.py).
    outer = axis[..., :, None] * axis[..., None, :]
    sq = jnp.sum(axis * axis, axis=-1)[..., None, None]
    KK = outer - sq * ident
    return ident + sin * K + (1.0 - cos) * KK


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """(w, x, y, z) quaternion -> rotation matrix (hmr/geometry.py:25-45)."""
    q = quat / _safe_norm(quat, eps=1e-16)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    R = jnp.stack([
        ww + xx - yy - zz, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, ww - xx + yy - zz, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, ww - xx - yy + zz,
    ], axis=-1)
    return R.reshape(quat.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Rotation matrix -> (w, x, y, z) quaternion, branchless.

    Same four-case selection as the kornia-derived reference
    (hmr/geometry.py:266-346) but with jnp.where instead of boolean mask
    arithmetic; the denominators are guarded so gradients never see 0/0.
    """
    Rt = jnp.swapaxes(R, -1, -2)
    r00, r01, r02 = Rt[..., 0, 0], Rt[..., 0, 1], Rt[..., 0, 2]
    r10, r11, r12 = Rt[..., 1, 0], Rt[..., 1, 1], Rt[..., 1, 2]
    r20, r21, r22 = Rt[..., 2, 0], Rt[..., 2, 1], Rt[..., 2, 2]

    t0 = 1 + r00 - r11 - r22
    q0 = jnp.stack([r12 - r21, t0, r01 + r10, r20 + r02], axis=-1)
    t1 = 1 - r00 + r11 - r22
    q1 = jnp.stack([r20 - r02, r01 + r10, t1, r12 + r21], axis=-1)
    t2 = 1 - r00 - r11 + r22
    q2 = jnp.stack([r01 - r10, r20 + r02, r12 + r21, t2], axis=-1)
    t3 = 1 + r00 + r11 + r22
    q3 = jnp.stack([t3, r12 - r21, r20 - r02, r01 - r10], axis=-1)

    mask_d2 = (r22 < eps)[..., None]
    mask_d0_d1 = (r00 > r11)[..., None]
    mask_d0_nd1 = (r00 < -r11)[..., None]

    q = jnp.where(mask_d2 & mask_d0_d1, q0,
        jnp.where(mask_d2 & ~mask_d0_d1, q1,
        jnp.where(~mask_d2 & mask_d0_nd1, q2, q3)))
    t = jnp.where(mask_d2 & mask_d0_d1, t0[..., None],
        jnp.where(mask_d2 & ~mask_d0_d1, t1[..., None],
        jnp.where(~mask_d2 & mask_d0_nd1, t2[..., None], t3[..., None])))
    # t is >= 1 on the selected branch for any orthonormal R, so sqrt is safe.
    return q * (0.5 / jnp.sqrt(jnp.maximum(t, eps)))


def quat_to_aa(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> axis-angle (hmr/geometry.py:213-263), branchless.

    The reference computes k = 2θ/sinθ with a torch.where on sin²θ>0 — the
    untaken branch still NaNs the gradient; here both value and gradient are
    guarded with the double-where trick. Identity quaternion maps to 0.
    """
    q1, q2, q3 = quat[..., 1], quat[..., 2], quat[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    safe = sin_sq > 0.0
    # Double-where: keep the sqrt argument strictly positive on the dead branch
    # so the backward pass of sqrt never sees 0.
    sin_sq_safe = jnp.where(safe, sin_sq, 1.0)
    sin_theta = jnp.sqrt(sin_sq_safe)
    cos_theta = quat[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta))
    k = jnp.where(safe, two_theta / sin_theta, 2.0)
    return jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)


def rotmat_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle.

    Behavioral spec: hmr/geometry.py:181-210 (rotation_matrix_to_quaternion
    then quaternion_to_angle_axis with NaN->0 patch). Branchless; identity
    maps exactly to zero with finite gradients.
    """
    aa = quat_to_aa(rotmat_to_quat(R))
    # The reference zeroes NaNs (:209); ours shouldn't produce any, but keep
    # the same terminal guard for bit-safety on adversarial inputs.
    return jnp.where(jnp.isnan(aa), 0.0, aa)


def aa_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> (w, x, y, z) quaternion (hmr/geometry.py:9-22)."""
    angle = _safe_norm(aa + 1e-8, eps=0.0)
    normalized = aa / angle
    half = angle * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)


def euler_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """Euler (x, y, z) -> quaternion (hmr/geometry.py:372-391)."""
    x, y, z = r[..., 0] / 2, r[..., 1] / 2, r[..., 2] / 2
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    return jnp.stack([
        cx * cy * cz - sx * sy * sz,
        cx * sy * sz + cy * cz * sx,
        cx * cz * sy - sx * cy * sz,
        cx * cy * sz + sx * cz * sy,
    ], axis=-1)


def euler_to_rotmat(r: jnp.ndarray) -> jnp.ndarray:
    """Euler -> rotation matrix (hmr/geometry.py:394-395)."""
    return quat_to_rotmat(euler_to_quat(r))


def rot6d_to_aa(x: jnp.ndarray) -> jnp.ndarray:
    """Convenience: 6D -> axis-angle."""
    return rotmat_to_aa(rot6d_to_rotmat(x))


def rot6d_to_rotmat_np(x):
    """Numpy twin of rot6d_to_rotmat for HOST-SIDE prep code.

    Tiny eager jnp dispatches in data-prep loops each pay a device
    round-trip on the TPU tunnel; callers outside jit should use this.
    Same semantics: (..., 6) viewed as (..., 3, 2) columns, Gram-Schmidt,
    output columns [b1, b2, b1 x b2] (hmr/geometry.py:47-61).
    """
    import numpy as np
    x = np.asarray(x, np.float32).reshape(np.shape(x)[:-1] + (3, 2))
    a1, a2 = x[..., 0], x[..., 1]
    b1 = a1 / np.maximum(np.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    b2 = a2 - np.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / np.maximum(np.linalg.norm(b2, axis=-1, keepdims=True), 1e-12)
    return np.stack([b1, b2, np.cross(b1, b2)], axis=-1)
