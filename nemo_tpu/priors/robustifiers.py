"""Robust error functions.

Behavioral reference: /root/reference/nemo/utils/misc_utils.py:91-105 (GMoF
module, rho=100) and /root/reference/hmr/smplify/losses.py:11-17 (gmof).
"""

from __future__ import annotations

import jax.numpy as jnp


def gmof(residual: jnp.ndarray, rho: float = 100.0,
         sqrt: bool = False) -> jnp.ndarray:
    """Geman-McClure robustifier: rho^2 * r^2 / (r^2 + rho^2).

    With sqrt=True, r^2 is first replaced by the per-point Euclidean norm
    over the last axis (misc_utils.py:102-103), keeping a trailing dim of 1.
    """
    sq = residual ** 2
    if sqrt:
        # The reference's torch.sqrt here is unguarded and NaNs the gradient
        # at zero residual; the 1e-12 shift is value-neutral but grad-safe.
        sq = jnp.sqrt(sq.sum(axis=-1, keepdims=True) + 1e-12)
    return rho ** 2 * sq / (sq + rho ** 2)


def angle_prior(pose: jnp.ndarray) -> jnp.ndarray:
    """Unnatural knee/elbow bending penalty (hmr/smplify/losses.py:19-24).

    pose: (B, 69) body pose (global rotation excluded).
    Returns (B, 4).
    """
    idx = jnp.array([55 - 3, 58 - 3, 12 - 3, 15 - 3])
    sign = jnp.array([1.0, -1.0, -1.0, -1.0])
    return jnp.exp(pose[:, idx] * sign) ** 2
