"""Custom ops: Pallas TPU kernels with XLA fallbacks + CPU-native kernels."""

from .chamfer import chamfer_distance, chamfer_loss, nn_one_way
from .native import (build_native, chamfer_forward_native, get_native,
                     parse_openpose_batch_native)

__all__ = ["chamfer_distance", "chamfer_loss", "nn_one_way",
           "build_native", "chamfer_forward_native", "get_native",
           "parse_openpose_batch_native"]
