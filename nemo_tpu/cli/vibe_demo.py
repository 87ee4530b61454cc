"""CLI: VIBE demo pipeline — frames + detections -> vibe_output.pkl.

Equivalent surface to VIBE/demo2.py and custom_video/VIBE_custom/demo.py:
track people across frames, crop each tracklet, run the VIBE model
(features -> GRU -> SPIN regressor -> SMPL), and dump the per-person dict
the NeMo data layer consumes. Person DETECTION is an external model in the
reference too (YOLO inside MPT); here detections come from a .npy/.json
file or from OpenPose keypoints.

Usage:
  python -m nemo_tpu.cli.vibe_demo --frames_dir vid.frames \
      --openpose_dir vid.frames.op --spin_ckpt spin_model.pth.tar \
      --out vibe_output.pkl
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--openpose_dir", type=str, default="",
                   help="derive person detections from OpenPose JSONs")
    p.add_argument("--detections", type=str, default="",
                   help=".npy (F, N, 4) bbox detections per frame")
    p.add_argument("--spin_ckpt", type=str, default="",
                   help="SPIN/VIBE torch checkpoint to convert; random "
                        "weights if omitted (pipeline smoke mode)")
    p.add_argument("--smpl_path", type=str, default="")
    p.add_argument("--min_track_len", type=int, default=25)
    p.add_argument("--max_frames", type=int, default=-1)
    return p


def load_frames(frames_dir: str, max_frames: int):
    names = sorted(n for n in os.listdir(frames_dir)
                   if n.lower().endswith((".png", ".jpg", ".jpeg")))
    if max_frames > 0:
        names = names[:max_frames]
    try:
        from PIL import Image
        return [np.asarray(Image.open(osp.join(frames_dir, n)).convert("RGB"))
                for n in names]
    except ImportError:
        import matplotlib.image as mpimg
        out = []
        for n in names:
            img = mpimg.imread(osp.join(frames_dir, n))
            if img.dtype != np.uint8:
                img = (img * 255).astype(np.uint8)
            out.append(img[..., :3])
        return out


def detections_from_openpose(op_dir: str, num_frames: int):
    from ..data import load_openpose_dir
    from ..data.crops import bbox_from_keypoints
    kps = load_openpose_dir(op_dir, num_frames)
    dets = []
    for f in range(kps.shape[0]):
        if kps[f, :, 2].sum() == 0:
            dets.append(np.zeros((0, 4), np.float32))
            continue
        cx, cy, size = bbox_from_keypoints(kps[f])
        dets.append(np.array([[cx - size / 2, cy - size / 2,
                               cx + size / 2, cy + size / 2]], np.float32))
    return dets


def main(argv=None) -> int:
    import jax
    import joblib
    from ..data.tracker import run_vibe_on_tracks, track_bboxes
    from ..models import (convert_torch_gru, convert_torch_hmr, init_gru,
                          init_hmr_head, init_resnet50)

    args = build_parser().parse_args(argv)
    frames = load_frames(args.frames_dir, args.max_frames)
    print(f"[vibe_demo] {len(frames)} frames")

    if args.detections:
        raw = np.load(args.detections, allow_pickle=True)
        dets = [np.asarray(d).reshape(-1, 4) for d in raw]
    elif args.openpose_dir:
        dets = detections_from_openpose(args.openpose_dir, len(frames))
    else:
        raise SystemExit("need --detections or --openpose_dir")

    tracks = track_bboxes(dets)
    print(f"[vibe_demo] {len(tracks)} tracks")

    if args.smpl_path:
        from ..body import load_smpl
        smpl = load_smpl(args.smpl_path)
    else:
        from ..body import synthetic_smpl_model
        smpl = synthetic_smpl_model()

    if args.spin_ckpt:
        import torch
        ckpt = torch.load(args.spin_ckpt, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model", ckpt.get("gen_state_dict", ckpt))
        backbone, head = convert_torch_hmr(sd)
        try:
            gru = convert_torch_gru(sd)
        except KeyError:
            gru = init_gru(jax.random.PRNGKey(0))
    else:
        print("[vibe_demo] no checkpoint: random weights (smoke mode)")
        backbone = init_resnet50(jax.random.PRNGKey(0))
        head = init_hmr_head(jax.random.PRNGKey(1))
        gru = init_gru(jax.random.PRNGKey(2))

    out = run_vibe_on_tracks(frames, tracks, backbone, gru, head, smpl,
                             min_track_len=args.min_track_len)
    joblib.dump(out, args.out)
    print(f"[vibe_demo] wrote {args.out} "
          f"({len(out)} people, keys: pose/betas/orig_cam/"
          f"joints2d_img_coord/frame_ids/bboxes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
