"""Overlay video assembly: per-frame keypoint/mesh overlays -> mp4.

Behavioral reference: nemo/utils/render_utils.py:90-145 (render_video:
per-frame figures, horizontal concat across views, ffmpeg libx264).
"""

from __future__ import annotations

import os
import os.path as osp
import tempfile
from typing import Optional

import numpy as np

from .keypoints import OP25_EDGES, draw_skeleton


def render_overlay_video(out_path: str, pts2d_pred: np.ndarray, bundle,
                         label_type: str = "gt", fps: float = 30.0,
                         max_views: int = 4, dpi: int = 60) -> str:
    """Write an mp4 comparing predicted vs labeled 2D keypoints per frame.

    pts2d_pred: (V, F, 25, 2). Views are concatenated horizontally per
    frame, like the reference's hconcat (render_utils.py:110-120).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.video import frames_to_video  # noqa: F401  (kept surface)

    V = min(bundle.num_views, max_views)
    F = bundle.num_frames
    labels = bundle.label(label_type)
    d0, d1 = bundle.img_d0, bundle.img_d1

    with tempfile.TemporaryDirectory() as tmp:
        for f in range(F):
            fig, axs = plt.subplots(1, V, figsize=(4 * V, 4))
            axs = np.atleast_1d(axs)
            for v in range(V):
                ax = axs[v]
                ax.set_xlim(0, d1), ax.set_ylim(d0, 0)
                ax.set_xticks([]), ax.set_yticks([])
                draw_skeleton(ax, labels[v, f, :, :2], "C0",
                              labels[v, f, :, 2:])
                draw_skeleton(ax, pts2d_pred[v, f], "C3")
                ax.set_title(f"view {v} frame {f}", fontsize=8)
            fig.savefig(osp.join(tmp, f"{f:06d}.png"), dpi=dpi,
                        bbox_inches="tight")
            plt.close(fig)
        os.makedirs(osp.dirname(osp.abspath(out_path)), exist_ok=True)
        # bbox_inches can produce odd sizes; let ffmpeg pad to even dims
        import subprocess
        cmd = ["ffmpeg", "-y", "-framerate", str(fps), "-i",
               osp.join(tmp, "%06d.png"), "-vf",
               "pad=ceil(iw/2)*2:ceil(ih/2)*2", "-c:v", "libx264",
               "-pix_fmt", "yuv420p", out_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            # no ffmpeg: leave the frames where the caller can find them
            fallback = out_path + ".frames"
            os.makedirs(fallback, exist_ok=True)
            import shutil
            for name in os.listdir(tmp):
                shutil.copy(osp.join(tmp, name), fallback)
            return fallback
    return out_path


def _write_png(path: str, img: np.ndarray) -> None:
    """Fast float[0,1]->PNG writer: PIL from uint8 at low compression is
    several times faster than plt.imsave for the wide hconcat strips the
    mesh videos produce (the reference's renderer writes through
    matplotlib figures, render_utils.py:90-145 — offline cost only)."""
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    try:
        from PIL import Image
        Image.fromarray(arr).save(path, compress_level=1)
    except Exception:                                    # pragma: no cover
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.imsave(path, arr)


def _load_frame(path: str, img_hw) -> Optional[np.ndarray]:
    """Read one video frame as float [0,1] (H, W, 3), resized by crop/pad to
    the bundle's (D0, D1) if needed; None when unreadable."""
    try:
        import matplotlib.pyplot as plt
        img = plt.imread(path)
    except Exception:
        return None
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = np.asarray(img, np.float32)[..., :3]
    H, W = int(img_hw[0]), int(img_hw[1])
    out = np.ones((H, W, 3), np.float32)
    h, w = min(H, img.shape[0]), min(W, img.shape[1])
    out[:h, :w] = img[:h, :w]
    return out


def render_mesh_video(out_path: str, verts: np.ndarray, faces: np.ndarray,
                      cameras, bundle, fps: float = 30.0,
                      max_views: int = 4, every: int = 1,
                      method: str = "auto") -> str:
    """SMPL-mesh rollout video: the reference's render_video('end') surface
    (render_utils.py:90-145 driving hmr/renderer.py:88-181).

    Per frame, each view's predicted mesh is rendered through its LEARNED
    camera over the real video frame (bundle.frame_paths) or a white
    background, views are horizontally concatenated, and the frames are
    assembled with ffmpeg libx264 (or left as a .frames dir without ffmpeg).

    Args:
      verts: (V, F, N, 3) world-frame predicted vertices.
      faces: (Nf, 3) triangle indices.
      cameras: per-view Camera namedtuples (batch dims stripped).
      every: render every k-th frame (render_video's num_frames subsampling).
    """
    from ..data.video import frames_to_video

    V = min(bundle.num_views, max_views)
    F = verts.shape[1]
    H, W = int(bundle.img_d0), int(bundle.img_d1)
    frame_paths = getattr(bundle, "frame_paths", None)

    from .mesh import composite_panel, make_mesh_panel_fn
    import jax.numpy as jnp

    # one compiled program renders all V views of a frame per dispatch
    # (per-panel calls pay the host->device round trip V x F times)
    panel_fn = make_mesh_panel_fn(faces, cameras[:V], (H, W),
                                  method=method)
    R_stack = jnp.stack([cameras[v].rotation for v in range(V)])
    t_stack = jnp.stack([cameras[v].translation for v in range(V)])

    os.makedirs(osp.dirname(osp.abspath(out_path)), exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        out_idx = 0
        for f in range(0, F, max(every, 1)):
            imgs, masks = panel_fn(jnp.asarray(verts[:V, f]), R_stack,
                                   t_stack)
            imgs, masks = np.asarray(imgs), np.asarray(masks)
            panels = []
            for v in range(V):
                image = None
                if frame_paths is not None:
                    image = _load_frame(str(frame_paths[v][f]), (H, W))
                panels.append(composite_panel(imgs[v], masks[v], image,
                                              (H, W)))
            strip = np.concatenate(panels, axis=1)   # hconcat views
            _write_png(osp.join(tmp, f"{out_idx:06d}.png"), strip)
            out_idx += 1
        try:
            frames_to_video(tmp, out_path, fps=fps)
            if not osp.exists(out_path):
                raise OSError("ffmpeg produced no output")
        except Exception:
            fallback = out_path + ".frames"
            os.makedirs(fallback, exist_ok=True)
            import shutil
            for name in os.listdir(tmp):
                shutil.copy(osp.join(tmp, name), fallback)
            return fallback
    return out_path
