"""HuMoR RGB / PROX observation-data layer tests.

The data layer is pinned against the direct-imported reference
datasets/rgb_dataset.py + datasets/prox_dataset.py + fitting/fitting_utils.py
(smplx stubbed, sys.modules snapshot/restored); the Kinect back-projection
is pinned against the reference's own cv2-based Projection methods.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import pickle
import sys
import types

import numpy as np
import pytest

from nemo_tpu.data.humor_rgb import (DEFAULT_GROUND, OP_FLIP_MAP,
                                     create_scan, load_planercnn_res,
                                     load_prox_calibration,
                                     load_prox_observations,
                                     load_rgb_video_observations,
                                     mask_joints2d, prox_data_paths_from_img,
                                     prox_gender, prox_subsequences,
                                     read_fitting_seq, read_keypoints,
                                     resize_points,
                                     split_overlapping_intervals,
                                     unproject_depth_image)

HUMOR_ROOT = "/root/reference/humor/humor"
REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref(request):
    touched = ["smplx", "smplx.vertex_ids", "smplx.utils", "body_model",
               "body_model.utils", "body_model.body_model", "utils",
               "utils.transforms", "utils.logging", "datasets",
               "datasets.rgb_dataset", "datasets.prox_dataset",
               "datasets.amass_utils", "fitting", "fitting.fitting_utils",
               "humor", "humor.humor", "humor.humor.utils",
               "humor.humor.utils.transforms", "humor.humor.utils.logging",
               "configer"]
    saved = {n: sys.modules.get(n) for n in touched}
    saved_path = list(sys.path)

    def restore():
        sys.path[:] = saved_path
        for n in touched:
            if saved[n] is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = saved[n]

    request.addfinalizer(restore)

    # the reference uses the np.float alias removed in numpy>=1.24
    had_float = hasattr(np, "float")
    if not had_float:
        np.float = float
        request.addfinalizer(lambda: delattr(np, "float"))

    smplx = types.ModuleType("smplx")
    smplx.SMPL = smplx.SMPLH = smplx.SMPLX = object
    vid = types.ModuleType("smplx.vertex_ids")
    vid.vertex_ids = {}
    su = types.ModuleType("smplx.utils")
    su.Struct = object
    smplx.vertex_ids, smplx.utils = vid, su
    sys.modules["smplx"] = smplx
    sys.modules["smplx.vertex_ids"] = vid
    sys.modules["smplx.utils"] = su

    sys.path.insert(0, REF_ROOT)
    sys.path.insert(0, HUMOR_ROOT)
    import datasets.prox_dataset as px
    import datasets.rgb_dataset as rd
    import fitting.fitting_utils as fu
    sys.path.remove(HUMOR_ROOT)
    sys.path.remove(REF_ROOT)
    return types.SimpleNamespace(rd=rd, px=px, fu=fu)


def _write_op_json(path, kp):
    with open(path, "w") as f:
        json.dump({"people": [{"pose_keypoints_2d":
                               np.asarray(kp).reshape(-1).tolist()}]}, f)


def _make_keypoint_dir(tmp_path, num_frames, rng, width=64., height=48.):
    kp_dir = tmp_path / "keypoints"
    kp_dir.mkdir(exist_ok=True)
    all_kp = rng.uniform(0, 1, size=(num_frames, 25, 3)).astype(np.float64)
    all_kp[..., 0] *= width
    all_kp[..., 1] *= height
    for t in range(num_frames):
        _write_op_json(kp_dir / ("frame%06d_keypoints.json" % t), all_kp[t])
    return str(kp_dir), all_kp


class TestRGBVideoOracle:
    @pytest.mark.parametrize("num_frames,seq_len,overlap",
                             [(25, 10, 3), (40, 12, 2), (30, 10, 5)])
    def test_subsequences_match_reference(self, ref, tmp_path, num_frames,
                                          seq_len, overlap):
        rng = np.random.default_rng(0)
        kp_dir, _ = _make_keypoint_dir(tmp_path, num_frames, rng)
        cam = np.array([[500., 0, 32], [0, 500., 24], [0, 0, 1]])

        theirs = ref.rd.RGBVideoDataset(kp_dir, cam, seq_len=seq_len,
                                        overlap_len=overlap,
                                        video_name="vid")
        ours = load_rgb_video_observations(kp_dir, cam, seq_len=seq_len,
                                           overlap_len=overlap,
                                           video_name="vid")
        assert len(ours) == len(theirs)
        assert [o["seq_interval"] for o in ours] == \
            [tuple(i) for i in theirs.seq_intervals]
        for idx in range(len(theirs)):
            obs, gt = theirs[idx]
            np.testing.assert_allclose(ours[idx]["joints2d"],
                                       obs["joints2d"].numpy(), rtol=1e-6)
            np.testing.assert_allclose(ours[idx]["floor_plane"],
                                       obs["floor_plane"])
            np.testing.assert_allclose(ours[idx]["cam_matx"],
                                       gt["cam_matx"].numpy())
            assert ours[idx]["name"] == gt["name"]

    def test_whole_video_mode(self, ref, tmp_path):
        rng = np.random.default_rng(1)
        kp_dir, all_kp = _make_keypoint_dir(tmp_path, 7, rng)
        cam = np.eye(3)
        ours = load_rgb_video_observations(kp_dir, cam)
        assert len(ours) == 1 and ours[0]["seq_interval"] == (0, 7)
        np.testing.assert_allclose(ours[0]["joints2d"],
                                   all_kp.astype(np.float32), rtol=1e-6)
        np.testing.assert_allclose(ours[0]["floor_plane"], DEFAULT_GROUND)

    def test_intervals_cover_all_frames(self):
        for num_frames in (20, 33, 57, 100):
            for seq_len in (8, 13):
                for overlap in (2, 4):
                    if seq_len >= num_frames:
                        continue
                    ivs, _ = split_overlapping_intervals(num_frames,
                                                         seq_len, overlap)
                    assert all(e - s == seq_len for s, e in ivs)
                    assert ivs[0][0] == 0 and ivs[-1][1] == num_frames
                    covered = set()
                    for s, e in ivs:
                        covered.update(range(s, e))
                    assert covered == set(range(num_frames))

    def test_mask_joints_matches_reference(self, ref, tmp_path):
        from PIL import Image
        rng = np.random.default_rng(2)
        H, W = 48, 64
        kp_dir, _ = _make_keypoint_dir(tmp_path, 6, rng, width=W, height=H)
        mask_dir = tmp_path / "masks"
        mask_dir.mkdir()
        for t in range(6):
            mask = (rng.uniform(size=(H, W)) < 0.4).astype(np.uint8) * 255
            Image.fromarray(mask, mode="L").save(
                mask_dir / ("frame%06d.png" % t))
        cam = np.eye(3)

        theirs = ref.rd.RGBVideoDataset(kp_dir, cam, seq_len=3,
                                        overlap_len=1,
                                        masks_path=str(mask_dir),
                                        mask_joints=True)
        imread = lambda p: np.asarray(Image.open(p).convert("L"))
        ours = load_rgb_video_observations(kp_dir, cam, seq_len=3,
                                           overlap_len=1,
                                           masks_path=str(mask_dir),
                                           mask_joints=True, imread=imread)
        for idx in range(len(theirs)):
            # reference order bug: rgb_dataset.py:171 copies joints2d into
            # the returned tensor BEFORE the masking loop mutates the
            # stored array (:178-187), so the FIRST access returns unmasked
            # joints (prox_dataset.py:283-292 masks before assigning — the
            # intent). Pin our masked output against the second access.
            first, _ = theirs[idx]
            assert ours[idx]["mask_paths"] == first["mask_paths"]
            obs, _ = theirs[idx]
            np.testing.assert_allclose(ours[idx]["joints2d"],
                                       obs["joints2d"].numpy(), rtol=1e-6)


class TestPlaneRCNNOracle:
    def test_floor_heuristic(self, ref, tmp_path):
        rng = np.random.default_rng(3)
        # plane 0: wall (x-dominant normal) owning the bottom rows; plane 1:
        # true floor; plane 2: noise. The heuristic must skip plane 0.
        params = np.stack([
            np.array([2.0, 0.3, 0.1]),      # -> cam frame x-dominant
            np.array([0.05, 0.1, -1.4]),    # -> cam frame y-dominant (up)
            rng.standard_normal(3),
        ])
        masks = np.zeros((3, 16, 20), np.uint8)
        masks[0, -10:, :] = 1
        masks[1, -10:, :12] = 1
        np.save(tmp_path / "000_plane_parameters_0.npy", params)
        np.save(tmp_path / "000_plane_masks_0.npy", masks)

        theirs = ref.fu.load_planercnn_res(str(tmp_path))
        ours = load_planercnn_res(str(tmp_path))
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def _calib(rng):
    def cam(fx, fy, cx, cy, k, view_R, view_t, R, T):
        return {"camera_mtx": [[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                "k": list(k),
                "view_mtx": np.concatenate(
                    [view_R, np.asarray(view_t).reshape(3, 1)],
                    axis=1).tolist(),
                "R": R, "T": T}
    depth = cam(360., 362., 256., 212., [0.09, -0.27, 1e-4, -2e-4, 0.09],
                np.eye(3), [0., 0., 0.], np.eye(3).tolist(), [0., 0., 0.])
    ang = 0.03
    Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                   [np.sin(ang), np.cos(ang), 0], [0, 0, 1.]])
    color = cam(1060., 1061., 960., 540., [0.04, -0.1, 5e-5, -1e-4, 0.02],
                Rz, [0.05, -0.002, 0.01], Rz.tolist(), [0.052, 0.0, 0.011])
    return {"depth_cam": depth, "color_cam": color}


class TestProjectionOracle:
    def test_unproject_depth_image(self, ref, tmp_path):
        rng = np.random.default_rng(4)
        calib = _calib(rng)
        (tmp_path / "calib").mkdir()
        for name, c in (("IR", calib["depth_cam"]),
                        ("Color", calib["color_cam"])):
            with open(tmp_path / "calib" / (name + ".json"), "w") as f:
                json.dump(c, f)
        proj = ref.px.Projection(str(tmp_path / "calib"))
        ours_calib = load_prox_calibration(str(tmp_path / "calib"))

        depth = rng.uniform(1.0, 4.0, size=(12, 16))
        theirs = proj.unproject_depth_image(depth, proj.depth_cam)
        ours = unproject_depth_image(depth, ours_calib["depth_cam"])
        np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=1e-6)

    def test_create_scan(self, ref, tmp_path):
        rng = np.random.default_rng(5)
        calib = _calib(rng)
        (tmp_path / "calib").mkdir()
        for name, c in (("IR", calib["depth_cam"]),
                        ("Color", calib["color_cam"])):
            with open(tmp_path / "calib" / (name + ".json"), "w") as f:
                json.dump(c, f)
        proj = ref.px.Projection(str(tmp_path / "calib"))
        ours_calib = load_prox_calibration(str(tmp_path / "calib"))

        depth = rng.uniform(1.0, 4.0, size=(10, 14))
        # the person mask lives in the color frame: 1080x1920 expected by
        # both sides' bounds checks; downsample trick: use a full-size mask
        mask = (rng.uniform(size=(1080, 1920)) < 0.5).astype(np.uint8)
        theirs = proj.create_scan(mask, depth.copy(), mask_on_color=True,
                                  coord="color")["points"]
        ours = create_scan(mask, depth, ours_calib, mask_on_color=True,
                           coord="color")
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=1e-6)

    def test_resize_points_pads_deterministically(self):
        pts = np.arange(12, dtype=np.float64).reshape(4, 3)
        out = resize_points(pts, 10, np.random.default_rng(0))
        assert out.shape == (10, 3)
        np.testing.assert_allclose(out[4:8], pts)
        np.testing.assert_allclose(out[8:10], pts[:2])
        sub = resize_points(pts, 2, np.random.default_rng(0))
        assert sub.shape == (2, 3)


def _make_prox_tree(tmp_path, rng, n_frames=12):
    """Minimal quantitative PROX layout (one vicon recording)."""
    from PIL import Image
    root = tmp_path / "prox"
    data = root / "quantitative"
    rec = data / "recordings" / "vicon_03301_01"
    (rec / "Color").mkdir(parents=True)
    (rec / "BodyIndexColor").mkdir()
    (data / "keypoints" / "vicon_03301_01").mkdir(parents=True)
    (data / "calibration").mkdir()
    (data / "cam2world").mkdir()
    calib = _calib(rng)
    for name, c in (("IR", calib["depth_cam"]),
                    ("Color", calib["color_cam"])):
        with open(data / "calibration" / (name + ".json"), "w") as f:
            json.dump(c, f)
    cam2world = np.eye(4)
    cam2world[:3, 3] = [0.3, -0.2, 1.0]
    with open(data / "cam2world" / "vicon.json", "w") as f:
        json.dump(cam2world.tolist(), f)
    with open(data / "vicon2scene.json", "w") as f:
        json.dump(np.eye(4).tolist(), f)

    all_kp = rng.uniform(0, 1, size=(n_frames, 25, 3))
    all_kp[..., 0] *= 1920
    all_kp[..., 1] *= 1080
    fit_root = data / "fittings" / "mosh" / "vicon_03301_01" / "results"
    img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    mask = Image.fromarray(np.zeros((8, 8), np.uint8), mode="L")
    fits = []
    for t in range(n_frames):
        name = "s%03d_frame_%05d" % (0, t)
        img.save(rec / "Color" / (name + ".jpg"))
        mask.save(rec / "BodyIndexColor" / (name + ".png"))
        _write_op_json(data / "keypoints" / "vicon_03301_01" /
                       (name + "_keypoints.json"), all_kp[t])
        fit = {"transl": rng.standard_normal((1, 3)).astype(np.float32),
               "betas": rng.standard_normal((1, 10)).astype(np.float32),
               "body_pose": rng.standard_normal((1, 63)).astype(np.float32),
               "global_orient":
                   rng.standard_normal((1, 3)).astype(np.float32)}
        fits.append(fit)
        if t == 3:
            continue  # missing fit -> dummy zeros
        if t == 5:
            fit = dict(fit)
            fit["transl"] = np.array([[np.nan, 0, 0]], np.float32)
        d = fit_root / name
        d.mkdir(parents=True)
        with open(d / "000.pkl", "wb") as f:
            pickle.dump(fit, f)
    return str(root), all_kp, fits


class TestProxOracle:
    def test_quant_subsequences_match_reference(self, ref, tmp_path):
        rng = np.random.default_rng(6)
        root, all_kp, _ = _make_prox_tree(tmp_path, rng, n_frames=12)
        theirs = ref.px.ProxDataset(root, quant=True, split="train",
                                    seq_len=5, return_fitting=False,
                                    flip=True)
        ours = load_prox_observations(root, quant=True, split="train",
                                      seq_len=5, return_fitting=False,
                                      flip=True)
        assert len(ours) == len(theirs) == 2
        for idx in range(len(theirs)):
            obs, gt = theirs[idx]
            np.testing.assert_allclose(ours[idx]["joints2d"],
                                       obs["joints2d"].numpy(), rtol=1e-6)
            assert ours[idx]["img_paths"] == obs["img_paths"]
            assert ours[idx]["name"] == gt["name"]
            assert ours[idx]["gender"] == gt["gender"]
            np.testing.assert_allclose(ours[idx]["cam2world"],
                                       gt["cam2world"].numpy())
            np.testing.assert_allclose(ours[idx]["cam_matx"],
                                       gt["cam_matx"].numpy())

    def test_fitting_seq_matches_reference(self, ref, tmp_path):
        rng = np.random.default_rng(7)
        root, _, _ = _make_prox_tree(tmp_path, rng, n_frames=12)
        seqs, _ = prox_subsequences(root, quant=True, seq_len=5)
        paths = prox_data_paths_from_img(seqs[0], root, quant=True)

        theirs, valid = ref.px.read_fitting_seq(paths["fitting"],
                                                return_valid=True)
        ours, ours_valid = read_fitting_seq(paths["fitting"],
                                            return_valid=True)
        assert ours_valid == valid
        assert valid[3] is False  # missing file -> dummy
        for k in theirs:
            np.testing.assert_allclose(ours[k], theirs[k].numpy(),
                                       rtol=1e-6)

    def test_flip_convention(self, ref, tmp_path):
        rng = np.random.default_rng(8)
        root, all_kp, _ = _make_prox_tree(tmp_path, rng, n_frames=12)
        # quant + flip=False applies OP_FLIP_MAP + x reflection
        theirs = ref.px.ProxDataset(root, quant=True, split="train",
                                    seq_len=5, return_fitting=False,
                                    flip=False)
        ours = load_prox_observations(root, quant=True, split="train",
                                      seq_len=5, return_fitting=False,
                                      flip=False)
        obs, _ = theirs[0]
        # atol: the reference reflects x in float64 before the float32
        # tensor cast; we reflect in float32 (sub-1e-3-pixel difference)
        np.testing.assert_allclose(ours[0]["joints2d"],
                                   obs["joints2d"].numpy(),
                                   rtol=1e-6, atol=1e-3)
        flipped = all_kp[:5][:, OP_FLIP_MAP, :].copy()
        flipped[:, :, 0] = 1920 - flipped[:, :, 0]
        np.testing.assert_allclose(ours[0]["joints2d"],
                                   flipped.astype(np.float32),
                                   rtol=1e-6, atol=1e-3)

    def test_gender_map(self):
        assert prox_gender("vicon_03301_01") == "male"
        assert prox_gender("MPH16_00162_01") == "female"


class TestFittingMathOracles:
    """jax fitting-frame/robust-weighting twins vs the imported reference."""

    def test_parse_floor_plane(self, ref):
        import torch
        rng = np.random.default_rng(9)
        fp = rng.standard_normal((6, 3)).astype(np.float32)
        from nemo_tpu.models.humor_fit import parse_floor_plane
        theirs = ref.fu.parse_floor_plane(torch.tensor(fp)).numpy()
        ours = np.asarray(parse_floor_plane(fp))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_compute_plane_intersection(self, ref):
        import torch
        rng = np.random.default_rng(10)
        from nemo_tpu.models.humor_fit import compute_plane_intersection
        point = rng.standard_normal((5, 3)).astype(np.float32)
        direction = rng.standard_normal((5, 3)).astype(np.float32)
        plane = rng.standard_normal((5, 4)).astype(np.float32)
        t_pt, t_s = ref.fu.compute_plane_intersection(
            torch.tensor(point), torch.tensor(direction),
            torch.tensor(plane))
        o_pt, o_s = compute_plane_intersection(point, direction, plane)
        np.testing.assert_allclose(np.asarray(o_pt), t_pt.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(o_s), t_s.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_compute_cam2prior(self, ref):
        import torch
        rng = np.random.default_rng(11)
        from nemo_tpu.models.humor_fit import compute_cam2prior
        B = 4
        fp = rng.standard_normal((B, 3)).astype(np.float32)
        trans = rng.standard_normal((B, 3)).astype(np.float32)
        root_orient = (0.5 *
                       rng.standard_normal((B, 3))).astype(np.float32)
        joints = rng.standard_normal((B, 22, 3)).astype(np.float32)
        tR, tt, th = ref.fu.compute_cam2prior(
            torch.tensor(fp), torch.tensor(trans),
            torch.tensor(root_orient), torch.tensor(joints))
        oR, ot, oh = compute_cam2prior(fp, trans, root_orient, joints)
        np.testing.assert_allclose(np.asarray(oR), tR.numpy(),
                                   rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ot), tt.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(oh), th.numpy(),
                                   rtol=1e-4, atol=2e-5)

    @pytest.mark.parametrize("n", [40, 41])
    def test_robust_weighting(self, ref, n):
        import torch
        rng = np.random.default_rng(12)
        from nemo_tpu.models.humor_fit import (apply_robust_weighting,
                                               robust_std)
        res = np.abs(rng.standard_normal((3, n))).astype(np.float32)
        t_std = ref.fu.robust_std(torch.tensor(res)).numpy()
        np.testing.assert_allclose(np.asarray(robust_std(res)), t_std,
                                   rtol=1e-5)
        t_sqr, t_w = ref.fu.apply_robust_weighting(torch.tensor(res))
        o_sqr, o_w = apply_robust_weighting(res)
        np.testing.assert_allclose(np.asarray(o_w), t_w.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(o_sqr), t_sqr.numpy(),
                                   rtol=1e-4, atol=1e-6)


class TestMaskJoints2D:
    def test_occlusion_zeroing(self):
        joints = np.ones((1, 3, 3), np.float32)
        joints[0, 0, :2] = [1.0, 1.0]   # occluded pixel
        joints[0, 1, :2] = [3.0, 0.0]   # visible pixel
        joints[0, 2, :2] = [99.0, 99.0]  # out of bounds -> clipped corner
        mask = np.zeros((4, 5), np.uint8)
        mask[1, 1] = 255
        mask[3, 4] = 255
        out = mask_joints2d(joints, [mask])
        assert np.all(out[0, 0] == 0)
        assert np.all(out[0, 1] == joints[0, 1])
        assert np.all(out[0, 2] == 0)


class TestReadKeypoints:
    def test_empty_returns_zeros(self, tmp_path):
        p = tmp_path / "f_keypoints.json"
        with open(p, "w") as f:
            json.dump({"people": []}, f)
        out = read_keypoints(str(p))
        assert out.shape == (25, 3) and np.all(out == 0)
