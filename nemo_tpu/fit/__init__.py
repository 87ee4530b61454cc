"""Fit core: model forward/losses, per-group optimizers, scan-based loops."""

from .losses import (KEYPOINT_LOSS_TYPES, camera_fitting_loss, keypoint_loss,
                     per_view_average)
from .model import (NemoAssets, NemoConfig, Params, camera_stage_loss,
                    fit_loss, frame_idx_to_raw_phase, init_params, predict,
                    project_to_views, vposer_losses, warmup_loss)
from .optimizer import (GroupOptimizer, PlateauState, group_lrs,
                        make_camera_stage_optimizer, make_optimizer,
                        plateau_init, plateau_init_all, plateau_update,
                        plateau_update_all)
from .assemble import build_assets
from .loop import FitState, NemoFitter

__all__ = [
    "KEYPOINT_LOSS_TYPES", "camera_fitting_loss", "keypoint_loss",
    "per_view_average", "NemoAssets", "NemoConfig", "Params",
    "camera_stage_loss", "fit_loss", "frame_idx_to_raw_phase", "init_params",
    "predict", "project_to_views", "vposer_losses", "warmup_loss",
    "GroupOptimizer", "PlateauState", "group_lrs",
    "make_camera_stage_optimizer", "make_optimizer", "plateau_init",
    "plateau_init_all", "plateau_update", "plateau_update_all",
    "FitState", "NemoFitter", "build_assets",
]
