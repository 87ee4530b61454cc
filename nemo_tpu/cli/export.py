"""CLI: export a fitted motion to a portable npz/JSON payload.

The reference's only motion-export path is the Blender FBX script
(/root/reference/VIBE/lib/utils/fbx_output.py:92-340), which keys per-frame
SMPL rotations + a pelvis translation onto an armature. bpy is out of scope
here; this is the bpy-free equivalent of that payload — everything a
downstream animation/retarget tool needs to reconstruct the motion:

  pose      (V, F, 72) float32 — axis-angle per frame: global orient [:3]
            (the rotation fbx_output keys on the Pelvis bone) + 23 body
            joints [3:] in SMPL order (bone_name_from_index,
            fbx_output.py:37-64)
  trans     (V, F, 3)  float32 — root translation per frame (the Pelvis
            `location` channel, fbx_output.py:126-131; phase-0-anchored
            like the fit's trans head)
  betas     (10,)      float32 — the shared learned shape
  cameras   (V, 9)     float32 — raw learned camera params
  cam_rotation (V, 3, 3), cam_translation (V, 3), cam_focal (V,),
  cam_center (V, 2)    — the decomposed per-view perspective cameras
  fps       ()         float32 — playback rate (fbx_output's fps_target)
  framerate_multiplier (V,) — raw-frames-per-resampled-frame, when known
  joints15  (V, F, 15, 3) float32 — reconstruction check: SMPL joints with
            betas/orient/trans applied (lets a consumer verify its own
            SMPL forward against ours)

The (V, F) leading axes are the fit's per-view phase-warped sequences: NeMo
learns one canonical motion but each view renders it through its own
monotonic phase warp, so per-view pose grids are the faithful export.

Reconstruction recipe (round-tripped by tests/test_export.py):
  verts, joints = smpl_forward(model, betas[None], pose[..., 3:],
                               pose[..., :3], pose2rot=True, transl=trans)

Usage:
  python -m nemo_tpu.cli.export --load_ckpt_path out/.../ckpt/sd_000500 \
      --synthetic_assets --out motion.npz [--json] [--fps 30]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import os.path as osp
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_ckpt_path", type=str, required=True,
                   help="fit checkpoint dir (out/.../ckpt/sd_NNNNNN)")
    p.add_argument("--bundle", type=str, default="",
                   help="packed .npz action bundle; a synthetic problem "
                        "matching the checkpoint is generated if omitted")
    p.add_argument("--out", type=str, default="motion.npz")
    p.add_argument("--json", action="store_true", default=False,
                   help="also write a .json sidecar with the same payload")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--smpl_path", type=str, default="")
    p.add_argument("--j_regressor_extra", type=str, default="")
    p.add_argument("--vposer_path", type=str, default="")
    p.add_argument("--gmm_path", type=str, default="")
    p.add_argument("--humor_ckpt", type=str, default="")
    p.add_argument("--synthetic_assets", action="store_true", default=False)
    p.add_argument("--num_views", type=int, default=4,
                   help="synthetic-problem topology when no --bundle")
    p.add_argument("--num_frames", type=int, default=60)
    return p


def export_motion(params, cfg, assets, fps: float = 30.0,
                  framerate_multiplier=None) -> dict:
    """Assemble the portable motion payload from fitted params.

    Runs the full (view, frame) prediction grid once (predict(),
    fit/model.py) and decomposes the learned cameras
    (geometry/camera.py:camera_from_params_np)."""
    import jax.numpy as jnp

    from ..fit.model import predict
    from ..geometry.camera import camera_from_params_np

    V, F = assets.num_views, assets.num_frames
    vi = jnp.repeat(jnp.arange(V), F)
    fi = jnp.tile(jnp.arange(F), V)
    pr = predict(params, cfg, assets, vi, fi)

    pose = np.concatenate(
        [np.asarray(pr["orient_aa"]), np.asarray(pr["poses"])],
        axis=-1).reshape(V, F, 72).astype(np.float32)
    trans = np.asarray(pr["trans"]).reshape(V, F, 3).astype(np.float32)
    j15 = np.asarray(pr["j49"][:, :15]).reshape(V, F, 15, 3)

    cam9 = np.asarray(params["cameras"], np.float32)
    cam = camera_from_params_np(cam9, assets.img_d0, assets.img_d1,
                                cfg.focal_length)
    payload = {
        "pose": pose,
        "trans": trans,
        "betas": np.asarray(params["betas"], np.float32).reshape(-1)[:10],
        "cameras": cam9,
        "cam_rotation": np.asarray(cam.rotation, np.float32),
        "cam_translation": np.asarray(cam.translation, np.float32),
        "cam_focal": np.asarray(cam.focal_length, np.float32),
        "cam_center": np.asarray(cam.center, np.float32),
        "fps": np.float32(fps),
        "joints15": j15.astype(np.float32),
    }
    if framerate_multiplier is not None:
        payload["framerate_multiplier"] = np.asarray(
            framerate_multiplier, np.float32)
    return payload


def save_motion(path: str, payload: dict, also_json: bool = False) -> None:
    d = osp.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez_compressed(path, **payload)
    if also_json:
        with open(osp.splitext(path)[0] + ".json", "w") as f:
            json.dump({k: np.asarray(v).tolist() for k, v in payload.items()},
                      f)


def load_motion(path: str) -> dict:
    """Reload an exported motion (npz or json) as numpy arrays."""
    if path.endswith(".json"):
        with open(path) as f:
            return {k: np.asarray(v, np.float32)
                    for k, v in json.load(f).items()}
    return dict(np.load(path))


def main(argv=None) -> int:
    from ..data import MultiViewBundle, synthetic_problem
    from ..fit import NemoConfig, NemoFitter
    from ..utils import load_fit_state, load_saved_config
    from .fit import load_assets

    args = build_parser().parse_args(argv)

    cfg = NemoConfig()
    saved = load_saved_config(args.load_ckpt_path)
    if saved:
        fields = NemoConfig.__dataclass_fields__
        cfg = NemoConfig(**{**dataclasses.asdict(cfg),
                            **{k: v for k, v in saved.items() if k in fields}})
        print("[export] restored model config from checkpoint")

    if args.bundle:
        bundle = MultiViewBundle.load(args.bundle)
    else:
        from ..body import synthetic_smpl_model
        bundle, _ = synthetic_problem(synthetic_smpl_model(),
                                      num_views=args.num_views,
                                      num_frames=args.num_frames)

    assets = load_assets(args, bundle, cfg)
    fitter = NemoFitter(cfg, assets, seed=0)
    fitter.state = load_fit_state(args.load_ckpt_path, fitter.state)
    print(f"[export] loaded step-{fitter.state.step} checkpoint")

    payload = export_motion(fitter.state.params, cfg, assets, fps=args.fps,
                            framerate_multiplier=bundle.framerate_multiplier)
    save_motion(args.out, payload, also_json=args.json)
    print(f"[export] wrote {args.out}"
          + (f" (+ {osp.splitext(args.out)[0]}.json)" if args.json else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
