"""Composed multi-panel figure renderers.

Behavioral reference: the MultiViewModel render-figure family —
render_rollout_figure (nemo/neural_motion_model.py:2214-2325),
render_comparison_figure (:2325-2407), the global-trajectory overlay plot
(plot_3d_dynamic's aligned scatter + legend, :940-991) and the GT /
pred-in-GT world rollouts (:1826-2035).

TPU-first: the meshes arrive pre-batched from one predict() call per view
(not the reference's per-frame pyrender loop); panels are composed with
numpy hconcat/vconcat + nearest-neighbor resize (no cv2 dependency).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional, Sequence

import numpy as np

MAX_SIZE = 2000


def _resize_nearest(img: np.ndarray, max_size: int = MAX_SIZE) -> np.ndarray:
    """Cap the longer image side at max_size (the reference's cv2.resize at
    :2312-2322), nearest-neighbor via index striding."""
    H, W = img.shape[:2]
    long_side = max(H, W)
    if long_side <= max_size:
        return img
    scale = max_size / long_side
    yi = np.clip((np.arange(int(H * scale)) / scale).astype(int), 0, H - 1)
    xi = np.clip((np.arange(int(W * scale)) / scale).astype(int), 0, W - 1)
    return img[yi][:, xi]


def _compose_grid(rows: Sequence[Sequence[np.ndarray]],
                  max_size: int = MAX_SIZE) -> np.ndarray:
    """hconcat panels per row, vconcat rows (:2305-2311), then resize."""
    row_imgs = [np.concatenate(list(r), axis=1) for r in rows]
    grid = row_imgs[0] if len(row_imgs) == 1 \
        else np.concatenate(row_imgs, axis=0)
    return _resize_nearest(grid, max_size)


def _frame_indices(num_frames: int, ncol: int,
                   start_phase: float = 0.0) -> list:
    """The reference's sampling: frame = round(phase * num_frames), phase =
    start_phase + (1 - start_phase) * cidx / ncol (:2369-2370, :2258)."""
    out = []
    for cidx in range(ncol):
        phase = start_phase + (1 - start_phase) * (cidx / ncol)
        out.append(min(int(np.round(phase * num_frames)), num_frames - 1))
    return out


def _mesh_panel(verts_world, faces, camera, image, img_hw):
    from .mesh import render_mesh_overlay
    import jax.numpy as jnp
    return np.asarray(render_mesh_overlay(jnp.asarray(verts_world), faces,
                                          camera, image, img_hw))


def _bundle_frame(bundle, view: int, frame: int) -> Optional[np.ndarray]:
    paths = getattr(bundle, "frame_paths", None)
    if paths is None:
        return None
    from .video import _load_frame
    return _load_frame(str(paths[view][frame]),
                       (bundle.img_d0, bundle.img_d1))


def render_rollout_figure(path: str, verts: np.ndarray, faces: np.ndarray,
                          cameras, bundle, num_frames: int = 10,
                          num_views: int = -1, no_bg: bool = False,
                          max_size: int = MAX_SIZE) -> np.ndarray:
    """(views x sampled frames) grid of mesh-over-frame renders
    (render_rollout_figure :2214-2325).

    verts: (V, F, N, 3) world vertices; cameras: per-view Camera.
    Returns the composed grid and writes it to path.
    """
    from ..eval.metrics import eval_frame_indices
    V, F = verts.shape[:2]
    nrow = V if num_views < 0 else min(V, num_views)
    hw = (int(bundle.img_d0), int(bundle.img_d1))
    fidx = eval_frame_indices(F, num_frames).tolist()

    rows = []
    for v in range(nrow):
        row = []
        for f in fidx:
            image = None if no_bg else _bundle_frame(bundle, v, f)
            row.append(_mesh_panel(verts[v, f], faces, cameras[v],
                                   image, hw))
        rows.append(row)
    grid = _compose_grid(rows, max_size)
    _imsave(path, grid)
    return grid


def baseline_persons_from_bundle(bundle):
    """Rebuild load_vibe_pickle-layout person dicts from a packed bundle's
    vibe_orient/vibe_betas/vibe_cam slots + hmr_theta (the body pose the
    packer kept) so render_baseline_rollout runs from the product path —
    the reference renders from the sequence dicts' vibe slots the same way
    (neural_motion_model.py:1457-1462). None when the slots aren't packed.
    """
    if bundle.vibe_cam is None or bundle.vibe_orient is None:
        return None
    persons = []
    for v in range(bundle.num_views):
        pose = np.concatenate([np.asarray(bundle.vibe_orient[v], np.float32),
                               np.asarray(bundle.hmr_theta[v], np.float32)],
                              axis=-1)                      # (F, 72)
        betas = (np.asarray(bundle.vibe_betas[v], np.float32)
                 if bundle.vibe_betas is not None
                 else np.zeros(10, np.float32))
        persons.append({"pose": pose, "betas": betas,
                        "orig_cam": np.asarray(bundle.vibe_cam[v],
                                               np.float32)})
    return persons


def render_baseline_rollout(path: str, model, persons, bundle,
                            num_frames: int = 8, num_views: int = -1,
                            max_size: int = MAX_SIZE) -> np.ndarray:
    """Baseline-initializer rollout grid — the reference's
    render_vibe_rollout / render_pare_rollout (neural_motion_model.py:1415,
    :1340): per view, the baseline's OWN SMPL prediction rendered over the
    frames through its weak-perspective camera, views stacked as rows.

    persons: one dict per view with 'pose' (F, 72) axis-angle (orient
    first), 'betas' (10,) or (F, 10) (averaged — the baselines predict
    near-constant shape), and 'orig_cam' (F, 4) VIBE image-space weak-persp
    cameras — exactly the load_vibe_pickle / densify_person layout, so a
    vibe_output.pkl drives this directly. Frames sampled like the
    reference's eval loops; masked-out frames render the zero pose.
    """
    import jax.numpy as jnp

    from ..body.smpl import smpl_forward
    from ..eval.metrics import eval_frame_indices
    from ..geometry.camera import camera_from_weak_persp
    from ..geometry.rotations import batch_rodrigues

    nrow = len(persons) if num_views < 0 else min(len(persons), num_views)
    hw = (int(bundle.img_d0), int(bundle.img_d1))
    rows = []
    for v in range(nrow):
        p = persons[v]
        F = int(np.asarray(p["pose"]).shape[0])
        fidx = eval_frame_indices(F, num_frames)
        pose = np.asarray(p["pose"], np.float32)[fidx]        # (n, 72)
        rot = batch_rodrigues(jnp.asarray(pose).reshape(-1, 3))
        rot = rot.reshape(len(fidx), 24, 3, 3)
        betas = np.asarray(p["betas"], np.float32).reshape(-1, 10)
        verts, _ = smpl_forward(model, jnp.asarray(betas.mean(0)[None]),
                                rot[:, 1:], rot[:, :1], want_vertices=True)
        verts = np.asarray(verts)
        cams = camera_from_weak_persp(
            np.asarray(p["orig_cam"], np.float32)[fidx], *hw)
        row = []
        for i, f in enumerate(fidx):
            image = _bundle_frame(bundle, v, int(f))
            cam_i = type(cams)(*(np.asarray(a)[i] for a in cams))
            row.append(_mesh_panel(verts[i], model.faces, cam_i, image, hw))
        rows.append(row)
    grid = _compose_grid(rows, max_size)
    _imsave(path, grid)
    return grid


def render_input_figure(path: str, bundle, num_frames: int = 8,
                        num_views: int = -1,
                        max_size: int = MAX_SIZE) -> np.ndarray:
    """The raw input frames as a (views x frames) grid — the reference's
    render_input_figure (neural_motion_model.py:2143-2212): no overlay,
    just the sampled source images hconcat per view, rows vconcat, resized
    to MAX_SIZE. Views without frame paths render white panels."""
    from ..eval.metrics import eval_frame_indices
    V, F = bundle.num_views, bundle.num_frames
    nrow = V if num_views < 0 else min(V, num_views)
    fidx = eval_frame_indices(F, num_frames)
    hw = (int(bundle.img_d0), int(bundle.img_d1))
    blank = np.ones(hw + (3,), np.float32)
    rows = []
    for v in range(nrow):
        row = []
        for f in fidx:
            im = _bundle_frame(bundle, v, int(f))
            row.append(blank if im is None else np.asarray(im, np.float32))
        rows.append(row)
    grid = _compose_grid(rows, max_size)
    _imsave(path, grid)
    return grid


def render_rollout_mv_figure(path: str, motion_idx: int, verts: np.ndarray,
                             faces: np.ndarray, cameras, bundle,
                             num_frames: int = 8, num_views: int = -1,
                             max_size: int = MAX_SIZE) -> np.ndarray:
    """ONE view's motion rendered through every view's camera, no
    background — the reference's render_rollout_mv_figure
    (neural_motion_model.py:2036-2143, no_bg asserted there too): row =
    camera view, column = sampled frame, mesh = verts[motion_idx]."""
    from ..eval.metrics import eval_frame_indices
    V, F = verts.shape[:2]
    nrow = V if num_views < 0 else min(V, num_views)
    fidx = eval_frame_indices(F, num_frames)
    hw = (int(bundle.img_d0), int(bundle.img_d1))
    rows = []
    for v in range(nrow):
        row = [_mesh_panel(verts[motion_idx, int(f)], faces, cameras[v],
                           None, hw) for f in fidx]
        rows.append(row)
    grid = _compose_grid(rows, max_size)
    _imsave(path, grid)
    return grid


def render_pretty_rollout_figure(path: str, verts: np.ndarray,
                                 faces: np.ndarray, cameras, bundle,
                                 num_frames: int = 6, num_views: int = -1,
                                 spread_people: bool = True,
                                 frame_idxs: Optional[Sequence[int]] = None,
                                 color: Optional[Sequence[float]] = None,
                                 max_size: int = MAX_SIZE) -> np.ndarray:
    """Per view, ALL sampled frames rendered as blue-spectrum people in one
    checkerboard-ground scene, rows stacked — the reference's
    render_pretty_rollout_figure (neural_motion_model.py:2499-2573) on its
    multiperson pretty renderer (pretty_renderer.py:61-137): each frame's
    vertices rotated by the view's learned camera rotation, centered,
    spread evenly on x in [-1, 1], viewed by a fixed camera at depth 10
    with the reference's 5x focal-to-image ratio.

    frame_idxs selects explicit frames instead of the even phase sample —
    the reference's render_pretty_rollout_figure_frame_list variant
    (:2642-2681); color overrides the per-person spectrum with one flat
    base color (its `color=` / `renderer.set_color` path, :2530-2533)."""
    from ..eval.metrics import eval_frame_indices
    from ..geometry.camera import Camera
    from .mesh import render_pretty
    V, F = verts.shape[:2]
    nrow = V if num_views < 0 else min(V, num_views)
    fidx = (list(frame_idxs) if frame_idxs is not None
            else eval_frame_indices(F, num_frames))
    n = max(len(fidx), 1)
    hw = (int(bundle.img_d0), int(bundle.img_d1))
    H, W = hw
    cam = Camera(rotation=np.eye(3, dtype=np.float32),
                 translation=np.zeros(3, np.float32),
                 focal_length=np.float32(5.0 * min(H, W)),
                 center=np.array([W / 2.0, H / 2.0], np.float32))
    rows = []
    for v in range(nrow):
        R = np.asarray(cameras[v].rotation, np.float32)
        if R.ndim == 3:
            R = R[0]
        people = []
        for i, f in enumerate(fidx):
            p = np.asarray(verts[v, int(f)], np.float32) @ R.T
            p = p - p.mean(0, keepdims=True)
            if spread_people:
                p[:, 0] += -1.0 + (2.0 * i + 1.0) / n
            p[:, 2] += 10.0
            people.append(p)
        rows.append([np.asarray(render_pretty(
            people, faces, cam, hw,
            person_colors=None if color is None else np.asarray(color)))])
    grid = _compose_grid(rows, max_size)
    _imsave(path, grid)
    return grid


def render_pretty_individual_figure(dirname: str, verts: np.ndarray,
                                    faces: np.ndarray, camera, bundle,
                                    max_size: int = MAX_SIZE) -> list:
    """Each phase-sampled body rendered ALONE to dirname/{i}.png — the
    reference's render_pretty_individual_figure (neural_motion_model.py:
    2611-2641, multiperson_renderer.render_separate): N bodies from
    get_preds_given_phases(linspace(0,1,N)) through one view's learned
    camera rotation, no ground plane, no spreading.

    verts: (N, V, 3) world vertices (one per sampled phase)."""
    from ..geometry.camera import Camera
    from .mesh import render_pretty
    os.makedirs(dirname, exist_ok=True)
    hw = (int(bundle.img_d0), int(bundle.img_d1))
    H, W = hw
    R = np.asarray(camera.rotation, np.float32)
    if R.ndim == 3:
        R = R[0]
    cam = Camera(rotation=np.eye(3, dtype=np.float32),
                 translation=np.zeros(3, np.float32),
                 focal_length=np.float32(5.0 * min(H, W)),
                 center=np.array([W / 2.0, H / 2.0], np.float32))
    paths = []
    for i in range(verts.shape[0]):
        p = np.asarray(verts[i], np.float32) @ R.T
        p = p - p.mean(0, keepdims=True)
        p[:, 2] += 10.0
        im = np.asarray(render_pretty([p], faces, cam, hw, add_ground=False))
        fpath = osp.join(dirname, f"{i}.png")
        _imsave(fpath, _resize_nearest(im, max_size))
        paths.append(fpath)
    return paths


def render_3d_rollout_figure(path: str, verts: np.ndarray,
                             faces: np.ndarray, bundle,
                             init_orient_rotmat: Optional[np.ndarray] = None,
                             num_frames: int = 10,
                             max_size: int = MAX_SIZE) -> np.ndarray:
    """Free-viewpoint 3D rollout — the reference's render_3d_rollout_figure
    (neural_motion_model.py:2682-2758): two rows of FIXED synthetic
    cameras (euler rotations pi/2 * [2.5,.5,.5] and pi/2 * [1.5,.5,.5],
    translation 100*[0,0,1]), each composed with the INVERSE of the
    motion's initial global orient so the figure is canonicalized to the
    subject's starting heading; no background frames."""
    from scipy.spatial.transform import Rotation as sRot
    from ..eval.metrics import eval_frame_indices
    from ..geometry.camera import Camera
    F = verts.shape[1]
    fidx = eval_frame_indices(F, num_frames)
    hw = (int(bundle.img_d0), int(bundle.img_d1))
    H, W = hw
    inv0 = (np.eye(3, dtype=np.float32) if init_orient_rotmat is None
            else np.asarray(init_orient_rotmat, np.float32).T)
    # focal sized so ~1.2 m half-extent fills the frame at the reference's
    # z=100 viewing distance (its fixed renderer focal left the person tiny)
    cam = Camera(rotation=np.eye(3, dtype=np.float32),
                 translation=np.zeros(3, np.float32),
                 focal_length=np.float32(min(H, W) * 100.0 / 2.4),
                 center=np.array([W / 2.0, H / 2.0], np.float32))
    off = np.array([0.0, 0.0, 100.0], np.float32)
    rows = []
    for r in ([2.5, 0.5, 0.5], [1.5, 0.5, 0.5]):
        R = sRot.from_euler(
            "xyz", np.pi / 2 * np.asarray(r)).as_matrix().astype(np.float32)
        R = (R @ inv0).astype(np.float32)
        # row r uses view r's motion like the reference (view_idx = ridx)
        v = min(len(rows), verts.shape[0] - 1)
        rows.append([_mesh_panel(
            (np.asarray(verts[v, int(f)], np.float32)
             - np.asarray(verts[v, int(f)], np.float32).mean(0)) @ R.T + off,
            faces, cam, None, hw) for f in fidx])
    grid = _compose_grid(rows, max_size)
    _imsave(path, grid)
    return grid


def render_comparison_figure(path: str, view_idx: int, verts: np.ndarray,
                             faces: np.ndarray, camera, bundle,
                             init_verts: Optional[np.ndarray] = None,
                             init_cameras=None, num_frames: int = 6,
                             start_phase: float = 0.0,
                             crop: Optional[Sequence[int]] = None,
                             max_size: int = MAX_SIZE) -> np.ndarray:
    """One view's comparison strip (render_comparison_figure :2325-2407):
    row 0 = raw frames (white when no frame_paths), optional middle row =
    the initializer's mesh (the reference's SPIN/HMR panel, shown when
    init_verts is given), last row = NeMo's mesh over the frame.

    verts: (F, N, 3) world vertices for this view; init_verts same layout.
    crop=(r0, r1) row-slices the data and NeMo panels — the reference's
    render_comparison_figure_pretty padding-removal variant (:2407-2497).
    """
    F = verts.shape[0]
    ncol = min(F, num_frames) if num_frames > 0 else F
    hw = (int(bundle.img_d0), int(bundle.img_d1))
    fidx = _frame_indices(F, ncol, start_phase)

    def _crop(im):
        return im if crop is None else im[int(crop[0]):int(crop[1])]

    data_row, init_row, pred_row = [], [], []
    for f in fidx:
        image = _bundle_frame(bundle, view_idx, f)
        blank = np.ones(hw + (3,), np.float32)
        data_row.append(_crop(image if image is not None else blank))
        if init_verts is not None:
            cam = init_cameras if init_cameras is not None else camera
            init_row.append(_crop(_mesh_panel(init_verts[f], faces, cam,
                                              image, hw)))
        pred_row.append(_crop(_mesh_panel(verts[f], faces, camera,
                                          image, hw)))

    rows = [data_row] + ([init_row] if init_row else []) + [pred_row]
    grid = _compose_grid(rows, max_size)
    _imsave(path, grid)
    return grid


def render_global_root_trajectories(out_dir: str, gt_trans: np.ndarray,
                                    pred_trans: np.ndarray,
                                    glamr_trans: Optional[np.ndarray] = None,
                                    ) -> dict:
    """Per-trajectory 3D root panels — the reference's render_3d_global_root
    (neural_motion_model.py:825-911): one gray 3D line + Greens time-ramp
    scatter per trajectory, SHARED axis limits across GT/GLAMR/pred, the
    GLAMR and NeMo panels titled with their mean euclidean distance to GT
    in meters; written as gt.png / glamr.png / pred.png in out_dir.

    Inputs are (F, 3) world root translations AFTER rigid alignment.
    Returns {name: mean-distance-to-GT} for the non-GT trajectories."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    sets = [("gt", "GT", np.asarray(gt_trans, np.float64))]
    if glamr_trans is not None:
        sets.append(("glamr", "GLAMR", np.asarray(glamr_trans, np.float64)))
    sets.append(("pred", "NeMo", np.asarray(pred_trans, np.float64)))

    allpts = np.concatenate([s[2] for s in sets], axis=0)
    mins, maxs = allpts.min(0), allpts.max(0)
    errs = {}
    for fname, label, pts in sets:
        if fname == "gt":
            title = "GT"
        else:
            err = float(np.sqrt(((pts - sets[0][2]) ** 2).sum(-1)).mean())
            errs[fname] = err
            title = f"{label} - Dist: {err:.2f} meter"
        fig = plt.figure()
        ax = plt.axes(projection="3d")
        ax.plot3D(pts[:, 0], pts[:, 1], pts[:, 2], "gray")
        ax.scatter3D(pts[:, 0], pts[:, 1], pts[:, 2],
                     c=np.linspace(0.3, 1, len(pts)), cmap="Greens")
        ax.set_xlim([mins[0], maxs[0]])
        ax.set_ylim([mins[1], maxs[1]])
        ax.set_zlim([mins[2], maxs[2]])
        ax.set_xticks(np.linspace(mins[0], maxs[0], 5))
        ax.set_yticks(np.linspace(mins[1], maxs[1], 5))
        ax.set_zticks(np.linspace(mins[2], maxs[2], 5))
        ax.set_title(title, fontsize=20)
        fig.savefig(osp.join(out_dir, f"{fname}.png"), bbox_inches="tight")
        plt.close(fig)
    return errs


def render_global_overlay(path: str, gt_trans: np.ndarray,
                          pred_trans: np.ndarray,
                          glamr_trans: Optional[np.ndarray] = None) -> None:
    """Aligned root-trajectory 3D scatter with the reference's exact color
    coding — GT Greens, GLAMR Reds, NeMo Blues, 0.3->1 colormap ramp over
    time, Line2D legend (plot_3d_dynamic tail, :940-991 -> overlay.png).

    Inputs are (F, 3) world root translations AFTER rigid alignment (the
    eval_3d_global transform).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.lines import Line2D

    sets = [("GT", gt_trans, "Greens", "g"),
            ("NeMo", pred_trans, "Blues", "b")]
    if glamr_trans is not None:
        sets.insert(1, ("GLAMR", glamr_trans, "Reds", "r"))

    allpts = np.concatenate([s[1] for s in sets], axis=0)
    mins, maxs = allpts.min(0), allpts.max(0)

    fig = plt.figure()
    ax = plt.axes(projection="3d")
    ax.set_xlim([mins[0], maxs[0]])
    ax.set_ylim([mins[1], maxs[1]])
    ax.set_zlim([mins[2], maxs[2]])
    for name, pts, cmap, _c in sets:
        ax.scatter3D(pts[:, 0], pts[:, 1], pts[:, 2],
                     c=np.linspace(0.3, 1, len(pts)), cmap=cmap)
    ax.legend([Line2D([0], [0], color=s[3], lw=4) for s in sets],
              [s[0] for s in sets])
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def _imsave(path: str, img: np.ndarray) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    from .video import _write_png
    _write_png(path, img)


# ---------------------------------------------------------------------------
# world-frame rollouts through the GT-fit cameras
# (render_gt_rollout :1924-2035, render_pred_in_gt_rollout :1826-1923,
#  render_glamr_rollout :1652-1825)
# ---------------------------------------------------------------------------

def gt_cameras_for_render(gt_cameras9: np.ndarray, img_hw,
                          focal_length: float = 5000.0):
    """Per-view Camera list from the packed opt_cam 9-vectors.

    Mirrors the reference's GT-rollout intrinsics quirk: camera_center is
    (IMG_D0, IMG_D1) — the FULL image dims, not the halved projection
    convention (:1980-1983).

    Pure numpy on purpose: host-side prep must not issue tiny eager jax
    dispatches (each pays a device round-trip on the TPU tunnel)."""
    from ..geometry.camera import Camera
    from ..geometry.rotations import rot6d_to_rotmat_np

    cams = []
    for cam9 in np.asarray(gt_cameras9, np.float32):
        cams.append(Camera(
            rotation=rot6d_to_rotmat_np(cam9[3:]),
            translation=cam9[:3],
            focal_length=np.float32(focal_length),
            center=np.asarray([float(img_hw[0]), float(img_hw[1])],
                              np.float32)))
    return cams


def _gt_world(model, bundle, n_joints=15):
    from ..eval.metrics import world_grid_forward
    return world_grid_forward(model, bundle.gt3d_pose, bundle.gt3d_trans,
                              n_joints=n_joints)


def render_gt_rollout(path: str, model, bundle, num_frames: int = 8,
                      focal_length: float = 5000.0) -> np.ndarray:
    """GT world motion through the GT-fit cameras (:1924-2035)."""
    v_gt, _ = _gt_world(model, bundle)
    cams = gt_cameras_for_render(bundle.gt_cameras, bundle.img_hw,
                                 focal_length)
    return render_rollout_figure(path, v_gt, model.faces, cams, bundle,
                                 num_frames=num_frames)


def render_pred_in_gt_rollout(path: str, model, pred_v: np.ndarray,
                              bundle, num_frames: int = 8,
                              focal_length: float = 5000.0) -> np.ndarray:
    """Predicted world meshes rigid-aligned into the GT world, rendered
    through the GT cameras (:1826-1923; alignment = rigid_transform_to_gt).

    pred_v: (V, F, N, 3) pred world vertices (get_preds 'v' + trans).
    """
    from ..geometry.procrustes import rigid_transform_np

    v_gt, _ = _gt_world(model, bundle)
    aligned = np.empty_like(pred_v)
    for v in range(pred_v.shape[0]):
        R, t = rigid_transform_np(pred_v[v].reshape(-1, 3),
                                  v_gt[v].reshape(-1, 3))
        aligned[v] = (pred_v[v].reshape(-1, 3) @ R.T + t).reshape(
            pred_v[v].shape)
    cams = gt_cameras_for_render(bundle.gt_cameras, bundle.img_hw,
                                 focal_length)
    return render_rollout_figure(path, aligned, model.faces, cams, bundle,
                                 num_frames=num_frames)


def render_glamr_rollout(path: str, model, bundle, num_frames: int = 8,
                         focal_length: float = 5000.0) -> np.ndarray:
    """GLAMR world baseline rigid-aligned into the GT world (:1652-1825);
    needs the bundle's glamr pose/orient/trans slots."""
    from ..eval.metrics import world_grid_forward
    from ..geometry.procrustes import rigid_transform_np

    if bundle.glamr_orient is None or bundle.glamr_trans is None or \
            "glamr" not in (bundle.baseline_poses or {}):
        raise ValueError("bundle carries no GLAMR world baseline")
    g_pose = np.concatenate([bundle.glamr_orient,
                             bundle.baseline_poses["glamr"][..., :69]], -1)
    v_gl, _ = world_grid_forward(model, g_pose, bundle.glamr_trans)
    v_gt, _ = _gt_world(model, bundle)
    aligned = np.empty_like(v_gl)
    for v in range(v_gl.shape[0]):
        R, t = rigid_transform_np(v_gl[v].reshape(-1, 3),
                                  v_gt[v].reshape(-1, 3))
        aligned[v] = (v_gl[v].reshape(-1, 3) @ R.T + t).reshape(
            v_gl[v].shape)
    cams = gt_cameras_for_render(bundle.gt_cameras, bundle.img_hw,
                                 focal_length)
    return render_rollout_figure(path, aligned, model.faces, cams, bundle,
                                 num_frames=num_frames)
