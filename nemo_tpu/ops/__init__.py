"""Custom ops: Pallas TPU kernels with XLA fallbacks + CPU-native kernels."""

from .chamfer import chamfer_distance, chamfer_loss, nn_one_way
from .lbs_pallas import skin_verts_t, tile_tables
from .native import (build_native, chamfer_forward_native, get_native,
                     parse_openpose_batch_native)
from .raster_pallas import raster_pallas_available, rasterize_triangles_pallas

__all__ = ["chamfer_distance", "chamfer_loss", "nn_one_way",
           "skin_verts_t", "tile_tables",
           "build_native", "chamfer_forward_native", "get_native",
           "parse_openpose_batch_native",
           "raster_pallas_available", "rasterize_triangles_pallas"]
