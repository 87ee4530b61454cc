"""Data layer: packed bundles, synthetic problems, ingestion adapters."""

from .bundle import MultiViewBundle, resample_to_common_frames
from .openpose import flip_horizontal, load_openpose_dir, parse_openpose_json
from .penn_action import load_penn_sequence, penn_gt_to_op
from .synthetic import (make_cameras, monotone_warp, smooth_motion,
                        synthetic_problem)
from .vibe import (densify_person, load_vibe_pickle, select_person_near_gt,
                   vibe_to_theta)

__all__ = [
    "MultiViewBundle", "resample_to_common_frames", "make_cameras",
    "monotone_warp", "smooth_motion", "synthetic_problem",
    "flip_horizontal", "load_openpose_dir", "parse_openpose_json",
    "load_penn_sequence", "penn_gt_to_op", "densify_person",
    "load_vibe_pickle", "select_person_near_gt", "vibe_to_theta",
]
