"""Procrustes / rigid alignment and reconstruction-error math, pure jnp.

Behavioral reference: /root/reference/nemo/utils/pose_utils.py
(compute_similarity_transform :86-137, rigid_transform_3D :30-84,
reconstruction_error :148-159). The reference is host-side numpy with a
Python loop over the batch; here everything is batched jnp (vmap over SVD),
so PA-MPJPE over a whole (views x frames) grid is one device call.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def similarity_transform(S1: jnp.ndarray, S2: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Solve the orthogonal Procrustes problem: find (s, R, t) mapping S1->S2.

    Args:
      S1, S2: (..., N, 3) point sets (row-major points; the reference works
        in (3, N) — we keep the natural batched layout and transpose inside).
    Returns:
      (S1_hat, (scale, R, t)) where S1_hat = s * S1 @ R^T + t.
    """
    # Work in (..., 3, N) like the reference.
    X1 = jnp.swapaxes(S1, -1, -2)
    X2 = jnp.swapaxes(S2, -1, -2)

    mu1 = X1.mean(axis=-1, keepdims=True)
    mu2 = X2.mean(axis=-1, keepdims=True)
    X1c = X1 - mu1
    X2c = X2 - mu2

    var1 = jnp.sum(X1c ** 2, axis=(-1, -2))

    K = _mm(X1c, jnp.swapaxes(X2c, -1, -2))  # (..., 3, 3)
    U, s, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)

    # Fix reflection so det(R) = 1 (pose_utils.py:117-120).
    det = jnp.linalg.det(_mm(U, jnp.swapaxes(V, -1, -2)))
    Z = jnp.broadcast_to(jnp.eye(3), K.shape).copy()
    Z = Z.at[..., 2, 2].set(jnp.sign(det))
    R = _mm(_mm(V, Z), jnp.swapaxes(U, -1, -2))

    scale = jnp.trace(_mm(R, K), axis1=-2, axis2=-1) / var1
    t = mu2 - scale[..., None, None] * _mm(R, mu1)

    S1_hat = scale[..., None, None] * _mm(R, X1) + t
    return (jnp.swapaxes(S1_hat, -1, -2),
            (scale, R, jnp.squeeze(t, axis=-1)))


def rigid_transform(A: jnp.ndarray, B: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kabsch: rigid (R, t) aligning point set A to B, no scale.

    Args:
      A, B: (..., N, 3).
    Returns:
      R: (..., 3, 3), t: (..., 3) with B ≈ A @ R^T + t.
    Reference: pose_utils.py:30-84 (rigid_transform_3D on (3, N)).
    """
    Am = A - A.mean(axis=-2, keepdims=True)
    Bm = B - B.mean(axis=-2, keepdims=True)
    H = _mm(jnp.swapaxes(Am, -1, -2), Bm)  # (..., 3, 3)
    U, s, Vh = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vh, -1, -2)
    det = jnp.linalg.det(_mm(V, jnp.swapaxes(U, -1, -2)))
    # Reflection fix: flip the last row of Vh (pose_utils.py:76-80),
    # branchlessly.
    D = jnp.broadcast_to(jnp.eye(3), H.shape).copy()
    D = D.at[..., 2, 2].set(jnp.sign(det))
    R = _mm(_mm(V, D), jnp.swapaxes(U, -1, -2))
    t = B.mean(axis=-2) - jnp.einsum('...ij,...j->...i', R, A.mean(axis=-2))
    return R, t


def apply_rigid_transform(points: jnp.ndarray, R: jnp.ndarray,
                          t: jnp.ndarray) -> jnp.ndarray:
    """Apply (R, t) to (..., N, 3) points (pose_utils.py:9-27)."""
    return jnp.einsum('...ij,...nj->...ni', R, points) + t[..., None, :]


def reconstruction_error(S1: jnp.ndarray, S2: jnp.ndarray, pa: bool = True,
                         reduction: str = 'mean') -> jnp.ndarray:
    """Mean per-joint position error, optionally Procrustes-aligned.

    Matches pose_utils.py:148-159: per-sample mean Euclidean distance, then a
    reduction over the batch. Input is (..., N, 3).
    """
    S1_hat = similarity_transform(S1, S2)[0] if pa else S1
    re = jnp.sqrt(jnp.sum((S1_hat - S2) ** 2, axis=-1)).mean(axis=-1)
    if reduction == 'mean':
        return re.mean()
    if reduction == 'sum':
        return re.sum()
    return re


# ---------------------------------------------------------------------------
# float64 numpy twins for the eval path.
#
# jax runs float32 by default and f32 SVD is only ~1e-2 accurate; the
# reference computes its eval CSVs in host float64 numpy. Metric parity
# (<1 mm MPJPE delta) therefore uses these host-side versions; the jnp
# versions above are for anything inside jit.
# ---------------------------------------------------------------------------

import numpy as _np


def similarity_transform_np(S1: _np.ndarray, S2: _np.ndarray):
    """float64 batched Procrustes; same semantics as similarity_transform."""
    S1 = _np.asarray(S1, dtype=_np.float64)
    S2 = _np.asarray(S2, dtype=_np.float64)
    X1 = _np.swapaxes(S1, -1, -2)
    X2 = _np.swapaxes(S2, -1, -2)
    mu1 = X1.mean(axis=-1, keepdims=True)
    mu2 = X2.mean(axis=-1, keepdims=True)
    X1c, X2c = X1 - mu1, X2 - mu2
    var1 = _np.sum(X1c ** 2, axis=(-1, -2))
    K = X1c @ _np.swapaxes(X2c, -1, -2)
    U, s, Vh = _np.linalg.svd(K)
    V = _np.swapaxes(Vh, -1, -2)
    det = _np.linalg.det(U @ _np.swapaxes(V, -1, -2))
    Z = _np.broadcast_to(_np.eye(3), K.shape).copy()
    Z[..., 2, 2] = _np.sign(det)
    R = V @ Z @ _np.swapaxes(U, -1, -2)
    scale = _np.trace(R @ K, axis1=-2, axis2=-1) / var1
    t = mu2 - scale[..., None, None] * (R @ mu1)
    S1_hat = scale[..., None, None] * (R @ X1) + t
    return _np.swapaxes(S1_hat, -1, -2), (scale, R, _np.squeeze(t, axis=-1))


def rigid_transform_np(A: _np.ndarray, B: _np.ndarray):
    """float64 Kabsch rigid (R, t) aligning point set A to B, NO scale.

    Exact twin of pose_utils.py:30-84 (rigid_transform_3D): centroids,
    H = Am Bm^T, SVD, reflection fix by flipping the last row of Vt, then
    R = V U^T and t = -R c_A + c_B. Inputs are (N, 3) row-major points;
    returns (R (3, 3), t (3,)) with B ~= A @ R.T + t.
    """
    A = _np.asarray(A, dtype=_np.float64).T   # work (3, N) like the reference
    B = _np.asarray(B, dtype=_np.float64).T
    cA = A.mean(axis=1, keepdims=True)
    cB = B.mean(axis=1, keepdims=True)
    H = (A - cA) @ (B - cB).T
    U, _s, Vt = _np.linalg.svd(H)
    R = Vt.T @ U.T
    if _np.linalg.det(R) < 0:                 # reflection case (:76-80)
        Vt = Vt.copy()
        Vt[2, :] *= -1
        R = Vt.T @ U.T
    t = (-R @ cA + cB)[:, 0]
    return R, t


def reconstruction_error_np(S1: _np.ndarray, S2: _np.ndarray, pa: bool = True,
                            reduction: str = 'mean') -> _np.ndarray:
    """float64 reconstruction error, exact twin of pose_utils.py:148-159."""
    S1 = _np.asarray(S1, dtype=_np.float64)
    S2 = _np.asarray(S2, dtype=_np.float64)
    S1_hat = similarity_transform_np(S1, S2)[0] if pa else S1
    re = _np.sqrt(((S1_hat - S2) ** 2).sum(axis=-1)).mean(axis=-1)
    if reduction == 'mean':
        return re.mean()
    if reduction == 'sum':
        return re.sum()
    return re
