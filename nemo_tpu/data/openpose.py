"""OpenPose BODY_25 JSON ingestion.

Behavioral reference: nemo/multi_view_sequence.py's per-frame JSON loading
(`..._openpose/NNNNNN_keypoints.json` with `people[0].pose_keypoints_2d`),
including the empty-frame handling (:422-425: no detected people -> zeros
with confidence 0).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np


def parse_openpose_json(path: str, person: int = 0) -> np.ndarray:
    """One frame's keypoints: (25, 3) [x, y, confidence]; zeros if empty."""
    with open(path) as f:
        data = json.load(f)
    people = data.get("people", [])
    if not people:
        return np.zeros((25, 3), np.float32)
    kp = np.asarray(people[person]["pose_keypoints_2d"], np.float32)
    return kp.reshape(-1, 3)[:25]


def load_openpose_dir(dirpath: str, num_frames: Optional[int] = None,
                      use_native: bool = True) -> np.ndarray:
    """All frames of one view: (F, 25, 3), sorted by filename.

    Uses the C++ batch parser (nemo_tpu.ops.native) when available — ~20x
    the json-module path on thousand-frame sequences — with a pure-Python
    fallback.
    """
    names = sorted(n for n in os.listdir(dirpath) if n.endswith(".json"))
    if num_frames is not None:
        names = names[:num_frames]
    paths = [os.path.join(dirpath, n) for n in names]
    if use_native:
        try:
            from ..ops.native import parse_openpose_batch_native
            return parse_openpose_batch_native(paths)
        except (RuntimeError, OSError):
            pass
    return np.stack([parse_openpose_json(p) for p in paths])


def flip_horizontal(pose2d: np.ndarray, width: float) -> np.ndarray:
    """Mirror keypoints left-right incl. the L/R joint permutation
    (nemo/utils/misc_utils.py:60-88)."""
    from ..body.constants import OP25_FLIP_PERM
    out = pose2d.copy()
    out[..., 0] = width / 2 + (width / 2 - out[..., 0])
    return out[..., OP25_FLIP_PERM, :]
