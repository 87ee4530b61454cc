"""Loss functions for the NeMo fit, pure jnp.

Behavioral reference: nemo/neural_motion_model.py — keypoint_loss :2806-2843
(six variants, confidence-gated at 0.5), per-view loss averaging :3839-3846,
camera_fitting_loss :2845-2867, vposer_loss :2775-2804, gmm_prior_loss
:2758-2773, warmup 3D loss :3489-3491.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..priors.robustifiers import gmof

KEYPOINT_LOSS_TYPES = ("rmse", "rmse_resized", "mse", "rmse_robust",
                       "mse_robust", "mse_robust_resized")


def keypoint_loss(pred: jnp.ndarray, gt: jnp.ndarray, gt_weight: jnp.ndarray,
                  gt_size: Optional[jnp.ndarray] = None,
                  loss_type: str = "mse_robust",
                  rho: float = 100.0) -> jnp.ndarray:
    """Per-element 2D keypoint loss, confidence-gated at > 0.5.

    Args:
      pred: (..., K, D) predictions.
      gt: (..., K, D) targets.
      gt_weight: (..., K, 1) confidences.
      gt_size: (...,) bbox diagonal, required for *_resized variants.
      loss_type: one of KEYPOINT_LOSS_TYPES.
    Returns:
      elementwise loss; (..., K, 1) for rmse/rmse_robust variants, else
      (..., K, D).
    """
    gate = (gt_weight > 0.5).astype(pred.dtype)
    if loss_type == "rmse":
        sq = ((pred - gt) ** 2).sum(-1, keepdims=True)
        return gate * jnp.sqrt(1e-6 + sq)
    if loss_type == "rmse_resized":
        s = gt_size[..., None, None]
        sq = (((pred - gt) / s) ** 2).sum(-1, keepdims=True)
        return gate * jnp.sqrt(1e-6 + sq)
    if loss_type == "mse":
        return gate * (pred - gt) ** 2
    if loss_type == "rmse_robust":
        return gate * gmof(pred - gt, rho=rho, sqrt=True)
    if loss_type == "mse_robust":
        return gate * gmof(pred - gt, rho=rho, sqrt=False)
    if loss_type == "mse_robust_resized":
        s = gt_size[..., None, None]
        return gate * gmof((pred - gt) / s * 1000.0, rho=rho, sqrt=False)
    raise ValueError(f"unknown loss type {loss_type!r}")


def per_view_average(loss_all: jnp.ndarray, conf: jnp.ndarray,
                     view_idx: jnp.ndarray, num_views: int) -> jnp.ndarray:
    """Average loss per view, then across views present in the batch.

    Replicates :3839-3846: for each distinct view v in the batch,
    mean(loss[view==v] * conf[view==v]) over ALL elements of that subset,
    then sum over present views / number of present views. Fixed-shape via a
    one-hot (B, V) matmul — no boolean indexing.

    Args:
      loss_all: (B, K, D) elementwise loss.
      conf: (B, K, 1) raw confidences (NOT thresholded — the reference
        multiplies the already-gated loss by the raw mask again).
      view_idx: (B,) int.
    """
    onehot = jax.nn.one_hot(view_idx, num_views, dtype=loss_all.dtype)  # (B,V)
    weighted = loss_all * conf                                  # (B, K, D)
    per_item = weighted.reshape(weighted.shape[0], -1).sum(-1)  # (B,)
    denom_per_item = weighted.shape[1] * weighted.shape[2]
    sums = onehot.T @ per_item                                  # (V,)
    counts = onehot.sum(axis=0)                                 # (V,)
    present = counts > 0
    avg = sums / (jnp.maximum(counts, 1) * denom_per_item)
    n_present = jnp.maximum(present.sum(), 1)
    return jnp.where(present, avg, 0.0).sum() / n_present


def camera_fitting_loss(points2d: jnp.ndarray, points2d_gt: jnp.ndarray,
                        gt_size: jnp.ndarray,
                        loss_type: str = "mse_robust") -> jnp.ndarray:
    """Camera-stage loss (:2845-2867): plain mean of the keypoint loss."""
    loss = keypoint_loss(points2d, points2d_gt[..., :2],
                         points2d_gt[..., 2:], gt_size, loss_type)
    return loss.mean()
