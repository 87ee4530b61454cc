"""Custom ops: Pallas TPU kernels with XLA fallbacks."""

from .chamfer import chamfer_distance, chamfer_loss, nn_one_way

__all__ = ["chamfer_distance", "chamfer_loss", "nn_one_way"]
