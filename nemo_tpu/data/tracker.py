"""Multi-person bbox tracking + the VIBE demo pipeline driver.

Behavioral reference: VIBE/demo2.py / custom_video/VIBE_custom/demo.py —
video -> person tracker -> per-tracklet crops -> VIBE -> vibe_output.pkl.
The reference's tracker is MPT (YOLO + SORT); detection is an external model
there too, so this module takes per-frame detections (bboxes or keypoints)
from any source and provides the IoU association + the pipeline driver that
emits the same {person_id: {pose, betas, frame_ids, joints2d, bboxes}} dict
the data layer consumes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of [x0, y0, x1, y1] boxes."""
    x0 = max(a[0], b[0])
    y0 = max(a[1], b[1])
    x1 = min(a[2], b[2])
    y1 = min(a[3], b[3])
    inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-9)


def track_bboxes(detections: Sequence[np.ndarray], iou_threshold: float = 0.3,
                 max_age: int = 10) -> Dict[int, Dict[str, np.ndarray]]:
    """Greedy IoU tracker over per-frame detections.

    detections: list over frames of (N_f, 4) [x0, y0, x1, y1] boxes.
    Returns {track_id: {'bboxes': (T, 4), 'frame_ids': (T,)}}.
    """
    next_id = 0
    active: Dict[int, dict] = {}   # id -> {'last_box', 'age'}
    tracks: Dict[int, dict] = {}
    for f, boxes in enumerate(detections):
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        unmatched = list(range(len(boxes)))
        # match active tracks greedily by IoU
        for tid in list(active):
            best_j, best_iou = -1, iou_threshold
            for j in unmatched:
                v = iou(active[tid]["last_box"], boxes[j])
                if v > best_iou:
                    best_j, best_iou = j, v
            if best_j >= 0:
                unmatched.remove(best_j)
                active[tid]["last_box"] = boxes[best_j]
                active[tid]["age"] = 0
                tracks[tid]["bboxes"].append(boxes[best_j])
                tracks[tid]["frame_ids"].append(f)
            else:
                active[tid]["age"] += 1
                if active[tid]["age"] > max_age:
                    del active[tid]
        # new tracks for unmatched detections
        for j in unmatched:
            active[next_id] = {"last_box": boxes[j], "age": 0}
            tracks[next_id] = {"bboxes": [boxes[j]], "frame_ids": [f]}
            next_id += 1
    return {tid: {"bboxes": np.stack(t["bboxes"]),
                  "frame_ids": np.asarray(t["frame_ids"])}
            for tid, t in tracks.items()}


def bbox_to_cs(bbox: np.ndarray, rescale: float = 1.1) -> np.ndarray:
    """[x0,y0,x1,y1] -> [cx, cy, size] square crop spec."""
    cx = (bbox[0] + bbox[2]) / 2
    cy = (bbox[1] + bbox[3]) / 2
    size = max(bbox[2] - bbox[0], bbox[3] - bbox[1]) * rescale
    return np.array([cx, cy, size], np.float32)


def run_vibe_on_tracks(frames: Sequence[np.ndarray],
                       tracks: Dict[int, Dict[str, np.ndarray]],
                       backbone, gru, head, smpl,
                       min_track_len: int = 25,
                       batch_time: int = 64,
                       out_res: int = 224) -> Dict[int, dict]:
    """Per-tracklet VIBE inference -> vibe_output-format dict.

    frames: list of (H, W, 3) uint8 images. Mirrors demo2.py's structure:
    crop each tracked frame, run features+GRU+regressor, pack results.
    """
    import jax.numpy as jnp
    from ..models.vibe import vibe_forward
    from .crops import get_single_image_crop

    out: Dict[int, dict] = {}
    for tid, tr in tracks.items():
        if len(tr["frame_ids"]) < min_track_len:
            continue
        crops = np.stack([
            get_single_image_crop(frames[f], bbox_to_cs(b), out_res=out_res)
            for f, b in zip(tr["frame_ids"], tr["bboxes"])])
        results = {"theta": [], "kp_2d": []}
        for s in range(0, len(crops), batch_time):
            chunk = jnp.asarray(crops[s:s + batch_time])[None]
            res = vibe_forward(backbone, gru, head, smpl, chunk)
            results["theta"].append(np.asarray(res["theta"][0]))
            results["kp_2d"].append(np.asarray(res["kp_2d"][0]))
        theta = np.concatenate(results["theta"])
        out[tid] = {
            "pose": theta[:, 3:75],
            "betas": theta[:, 75:],
            "orig_cam": theta[:, :3],
            "joints2d_img_coord": np.concatenate(results["kp_2d"]),
            "frame_ids": tr["frame_ids"],
            "bboxes": tr["bboxes"],
        }
    return out
