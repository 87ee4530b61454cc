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

    from ..data.video import frames_to_video

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
