"""Initializer model families: ResNet-50, HMR/SPIN, VIBE (frozen inference)."""

from .resnet import (convert_torch_resnet50, init_resnet50, resnet50_features)
from .hmr import (convert_torch_hmr, hmr_forward, hmr_head, imagenet_normalize,
                  init_hmr_head, weak_perspective_projection)
from .vibe import (convert_torch_gru, gru_cell, hmr_forward_from_features,
                   init_gru, temporal_encoder, vibe_forward)

__all__ = [
    "convert_torch_resnet50", "init_resnet50", "resnet50_features",
    "convert_torch_hmr", "hmr_forward", "hmr_head", "imagenet_normalize",
    "init_hmr_head", "weak_perspective_projection",
    "convert_torch_gru", "gru_cell", "hmr_forward_from_features", "init_gru",
    "temporal_encoder", "vibe_forward",
]
