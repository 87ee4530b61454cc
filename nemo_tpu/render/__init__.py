"""Host-side rendering/visualization."""

from .keypoints import (OP25_EDGES, draw_skeleton, render_keypoint_rollout,
                        render_loss_curves, render_phase_plot)

__all__ = ["OP25_EDGES", "draw_skeleton", "render_keypoint_rollout",
           "render_loss_curves", "render_phase_plot"]
