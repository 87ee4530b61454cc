"""Host-side visualization: keypoint overlays and phase-warp plots.

Behavioral reference: the reference's matplotlib figure surface —
render_rollout_keypoint_figure, phase plots (entry script :316-328), loss
curves (:271-281). Mesh rendering (pyrender) is intentionally separate (the
reference pins it to OSMesa GL); keypoint/skeleton overlays cover the
quantitative debugging loop and run anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

# BODY_25 skeleton edges (OpenPose convention)
OP25_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7), (1, 8),
    (8, 9), (9, 10), (10, 11), (8, 12), (12, 13), (13, 14), (0, 15),
    (15, 17), (0, 16), (16, 18), (14, 21), (14, 19), (19, 20), (11, 24),
    (11, 22), (22, 23),
]


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def draw_skeleton(ax, pts25: np.ndarray, color: str = "C0",
                  conf: Optional[np.ndarray] = None) -> None:
    ok = np.ones(len(pts25), bool) if conf is None else (conf[..., 0] > 0.5)
    for a, b in OP25_EDGES:
        if ok[a] and ok[b]:
            ax.plot([pts25[a, 0], pts25[b, 0]], [pts25[a, 1], pts25[b, 1]],
                    c=color, lw=1)
    ax.scatter(pts25[ok, 0], pts25[ok, 1], c=color, s=4)


def render_keypoint_rollout(path: str, pts2d_pred: np.ndarray, bundle,
                            num_frames: int = 5, num_views: int = 3) -> None:
    """Grid of [GT, OP, pred] skeleton overlays (render :282-…)."""
    plt = _plt()
    Fidx = np.linspace(0, bundle.num_frames - 1, num_frames).astype(int)
    gt = bundle.labels.get("gt")
    op = bundle.labels.get("op")
    fig, axs = plt.subplots(3, num_frames, figsize=(3 * num_frames, 9))
    v = 0
    for col, f in enumerate(Fidx):
        rows = [("gt", gt), ("op", op), ("pred", None)]
        for row, (name, data) in enumerate(rows):
            ax = axs[row, col] if num_frames > 1 else axs[row]
            ax.set_xticks([]), ax.set_yticks([])
            ax.invert_yaxis()
            if name == "pred":
                draw_skeleton(ax, pts2d_pred[v, f], "C2")
            elif data is not None:
                draw_skeleton(ax, data[v, f, :, :2], "C0",
                              data[v, f, :, 2:])
            if col == 0:
                ax.set_ylabel(name)
    fig.savefig(path, bbox_inches="tight", dpi=80)
    plt.close(fig)


def render_eval_grid(path: str, pts2d_pred: np.ndarray, bundle,
                     label_type: str = "gt", num_frames: int = 6,
                     max_views: int = 4) -> None:
    """views x frames grid of pred-vs-label skeletons over the video frames.

    The reference's eval-time image overlays (figures drawn onto the actual
    frames). Frames come from bundle.frame_paths when the preprocessor found
    an extracted-frames dir; otherwise skeletons draw on a blank canvas at
    the bundle's image size, so the figure always renders.
    """
    plt = _plt()
    V = min(bundle.num_views, max_views)
    Fidx = np.linspace(0, bundle.num_frames - 1, num_frames).astype(int)
    try:
        label = bundle.label(label_type)
    except KeyError:
        label = next(iter(bundle.labels.values()))
    H, W = int(bundle.img_hw[0]), int(bundle.img_hw[1])

    fig, axs = plt.subplots(V, num_frames,
                            figsize=(2.2 * num_frames, 2.2 * V),
                            squeeze=False)
    for v in range(V):
        for col, f in enumerate(Fidx):
            ax = axs[v, col]
            ax.set_xticks([]), ax.set_yticks([])
            img = None
            if bundle.frame_paths is not None:
                try:
                    img = plt.imread(str(bundle.frame_paths[v, f]))
                except Exception:
                    img = None
            if img is not None:
                ax.imshow(img)
            else:
                ax.imshow(np.ones((H, W, 3), np.float32))
            draw_skeleton(ax, label[v, f, :, :2], "C0", label[v, f, :, 2:])
            draw_skeleton(ax, pts2d_pred[v, f], "C2")
            ax.set_xlim(0, W), ax.set_ylim(H, 0)
            if col == 0:
                ax.set_ylabel(f"view {v}")
    fig.savefig(path, bbox_inches="tight", dpi=80)
    plt.close(fig)


def render_phase_plot(path: str, phase_params: dict, num_views: int) -> None:
    """Learned monotonic warps over [0, 1] (entry script :316-328)."""
    import jax.numpy as jnp
    from ..modules import apply_monotonic_all_views
    plt = _plt()
    x = jnp.linspace(0, 1, 100)[:, None]
    ys = np.asarray(apply_monotonic_all_views(phase_params, x))
    fig = plt.figure()
    for v in range(num_views):
        plt.plot(np.asarray(x)[:, 0], ys[v, :, 0], label=str(v))
    plt.legend(), plt.xlim(0, 1), plt.ylim(0, 1)
    plt.xlabel("raw phase"), plt.ylabel("warped phase")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def render_per_joint_keypoint_frames(cache_dir: str, pts2d: np.ndarray,
                                     bundle, num_frames: int = 4,
                                     num_views: int = -1,
                                     conf_threshold: float = 0.5) -> int:
    """Per-joint keypoint inspection frames — the reference's
    render_rollout_keypoint_per_joint_figure (neural_motion_model.py:
    355-421): for each sampled (view, frame) and each joint with
    confidence > 0.5, writes ``{ridx:03d}_{cidx:03d}_{joint}.png`` — the
    frame with ONE colored dot (color C{joint_idx % 10}) at that joint —
    into a cache dir. Returns the number of images written.

    pts2d: (V, F, 25, 3) keypoints + confidence (the GT collation layout).
    """
    import os
    from ..body.constants import JOINT_NAMES
    from ..eval.metrics import eval_frame_indices
    plt = _plt()
    from matplotlib import colors as mcolors
    V, F = pts2d.shape[:2]
    nrow = V if num_views < 0 else min(V, num_views)
    fidx = eval_frame_indices(F, num_frames)
    H, W = int(bundle.img_d0), int(bundle.img_d1)
    os.makedirs(cache_dir, exist_ok=True)
    n = 0
    for ridx in range(nrow):
        for cidx, f in enumerate(fidx):
            from .figures import _bundle_frame
            im = _bundle_frame(bundle, ridx, int(f))
            if im is None:
                im = np.ones((H, W, 3), np.float32)
            for j in range(pts2d.shape[2]):
                kp = pts2d[ridx, int(f), j]
                if kp[-1] <= conf_threshold:
                    continue
                out = np.asarray(im, np.float32).copy()
                rgb = np.asarray(mcolors.to_rgb(f"C{j % 10}"), np.float32)
                y0, x0 = int(round(kp[1])), int(round(kp[0]))
                r = max(2, min(H, W) // 60)
                ys = slice(max(y0 - r, 0), min(y0 + r + 1, H))
                xs = slice(max(x0 - r, 0), min(x0 + r + 1, W))
                out[ys, xs] = rgb
                name = JOINT_NAMES[j] if j < len(JOINT_NAMES) else str(j)
                plt.imsave(os.path.join(
                    cache_dir, f"{ridx:03d}_{cidx:03d}_{name}.png"),
                    np.clip(out, 0, 1))
                n += 1
    return n


def render_dynamic_velocity_plots(out_dir: str, gt_joints15: np.ndarray,
                                  framerate_multiplier=None,
                                  fps: float = 30.0) -> None:
    """Per-view GT joint-speed curves — the reference's plot_3d_dynamic
    (neural_motion_model.py:712-782): v{v}_vel.png with all 15 joints'
    speeds over frames, v{v}_vel_stats.png with max/mean/RWrist, speeds
    scaled by 30 * framerate_multiplier like the dynamic-frame mask.

    gt_joints15: (V, F, 15, 3) GT world joints (the dynamic mask's input).
    """
    import os
    from ..body.constants import JOINT_NAMES
    plt = _plt()
    V, F = gt_joints15.shape[:2]
    fm = (np.ones(V) if framerate_multiplier is None
          else np.asarray(framerate_multiplier, np.float64).reshape(-1))
    os.makedirs(out_dir, exist_ok=True)
    for v in range(V):
        diff = gt_joints15[v, 1:] - gt_joints15[v, :-1]
        vel = np.sqrt((diff ** 2).sum(-1)) * (fps * fm[v])   # (F-1, 15)
        x = np.arange(vel.shape[0])
        fig = plt.figure()
        for j in range(15):
            plt.plot(x, vel[:, j], label=JOINT_NAMES[j])
        plt.xlabel("Frame"), plt.ylabel("Vel"), plt.legend()
        fig.savefig(os.path.join(out_dir, f"v{v}_vel.png"))
        plt.close(fig)
        fig = plt.figure()
        rwrist = JOINT_NAMES.index("OP RWrist")
        for y, label in ((vel.max(1), "max"), (vel.mean(1), "mean"),
                         (vel[:, rwrist], "rwrist")):
            plt.plot(x, y, label=label)
        plt.xlabel("Frame"), plt.ylabel("Vel"), plt.legend()
        fig.savefig(os.path.join(out_dir, f"v{v}_vel_stats.png"))
        plt.close(fig)


def render_vibe_debug_panel(path: str, pred_kp2d: np.ndarray,
                            gt_kp2d: np.ndarray, max_frames: int = 8,
                            crop_size: int = 224) -> None:
    """Pred-vs-GT skeleton panel for VIBE training debug mode.

    Behavioral spec: VIBE/lib/utils/vis.py:324 batch_visualize_vid_preds +
    draw_skeleton (:378-407) — the reference draws pred (blue/red lines) and
    GT skeletons on the video frames; feature-based training here has no
    frames, so each panel plots both skeletons in crop coordinates
    (normalize_2d_kp inverse: kp * size/2 + size/2, vis.py:381).

    pred_kp2d: (T, 49, 2) normalized SPIN keypoints; gt_kp2d: (T, 49, 3)
    with confidence. Only the OP25 subset is drawn (the reference's spin
    skeleton, kp_utils.py:317, is the OP25 edge set + one face link).
    """
    import os
    plt = _plt()
    T = min(max_frames, pred_kp2d.shape[0])

    def unnorm(kp):
        return kp * (crop_size / 2.0) + crop_size / 2.0

    fig, axes = plt.subplots(1, T, figsize=(2.2 * T, 2.6), squeeze=False)
    for t in range(T):
        ax = axes[0, t]
        gt = gt_kp2d[t]
        draw_skeleton(ax, unnorm(gt[:25, :2]), color="C2",
                      conf=gt[:25, 2:3])
        draw_skeleton(ax, unnorm(pred_kp2d[t, :25, :2]), color="C3")
        ax.set_xlim(0, crop_size), ax.set_ylim(crop_size, 0)
        ax.set_xticks([]), ax.set_yticks([])
        ax.set_title(f"t={t}", fontsize=8)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=80)
    plt.close(fig)


def render_loss_curves(out_dir: str, losses: dict) -> None:
    """One PNG per loss channel (entry :271-281)."""
    import os
    plt = _plt()
    for name, values in losses.items():
        fig = plt.figure()
        plt.plot(np.arange(len(values)), np.asarray(values))
        plt.xlabel("step"), plt.ylabel(name)
        fig.savefig(os.path.join(out_dir, f"{name}.png"),
                    bbox_inches="tight")
        plt.close(fig)
