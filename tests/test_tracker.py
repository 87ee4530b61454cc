"""Tracker + GT camera fitting tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from nemo_tpu.data import bbox_to_cs, fit_gt_camera, iou, track_bboxes


class TestIoUTracker:
    def test_single_person_one_track(self):
        dets = [np.array([[10 + f, 10, 50 + f, 90]], np.float32)
                for f in range(20)]
        tracks = track_bboxes(dets)
        assert len(tracks) == 1
        t = tracks[0]
        assert len(t["frame_ids"]) == 20
        np.testing.assert_array_equal(t["frame_ids"], np.arange(20))

    def test_two_people_two_tracks(self):
        dets = [np.array([[0, 0, 40, 80], [200, 0, 240, 80]], np.float32)
                for _ in range(10)]
        tracks = track_bboxes(dets)
        assert len(tracks) == 2
        assert all(len(t["frame_ids"]) == 10 for t in tracks.values())

    def test_gap_breaks_track_after_max_age(self):
        a = np.array([[0, 0, 40, 80]], np.float32)
        dets = [a] * 5 + [np.zeros((0, 4), np.float32)] * 15 + [a] * 5
        tracks = track_bboxes(dets, max_age=3)
        assert len(tracks) == 2

    def test_iou_and_cs(self):
        assert iou(np.array([0, 0, 10, 10]), np.array([0, 0, 10, 10])) == 1.0
        assert iou(np.array([0, 0, 10, 10]), np.array([20, 20, 30, 30])) == 0.0
        cs = bbox_to_cs(np.array([0, 0, 20, 40]), rescale=1.0)
        np.testing.assert_allclose(cs, [10, 20, 40])


class TestGTCameraFit:
    def test_recovers_projection(self, rng):
        from nemo_tpu.geometry import camera_from_params, project
        import jax
        # true camera with a small rotation
        true9 = jnp.asarray(np.array(
            [0.1, -0.05, 9.0, 1, 0.02, 0, 1, 0, 0.03], np.float32))
        d0, d1 = 720.0, 1280.0
        cam = camera_from_params(true9[None], d0, d1)
        j3 = jnp.asarray(rng.randn(30, 25, 3).astype(np.float32))
        j2 = project(j3, jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (30,) + a.shape[1:]), cam))
        kp = jnp.concatenate([j2, jnp.ones((30, 25, 1))], -1)

        out = fit_gt_camera(j3, kp, d0, d1, num_steps=800)
        assert float(out["loss"][-1]) < float(out["loss"][0]) * 1e-2
        # reprojection with the fitted camera matches
        cam_fit = camera_from_params(out["cam9"][None], d0, d1)
        j2_fit = project(j3, jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (30,) + a.shape[1:]), cam_fit))
        err = np.abs(np.asarray(j2_fit - j2)).mean()
        assert err < 30.0  # pixels; exact pose is ambiguous, projection isn't


class TestVibePipeline:
    def test_tracks_to_vibe_output(self, rng):
        """Full pipeline on tiny frames with random weights: structure of the
        vibe_output dict must match what the data layer consumes."""
        import jax
        from nemo_tpu.body import synthetic_smpl_model
        from nemo_tpu.data import run_vibe_on_tracks, track_bboxes
        from nemo_tpu.data.vibe import densify_person, vibe_to_theta
        from nemo_tpu.models import init_gru, init_hmr_head, init_resnet50

        frames = [(rng.rand(48, 64, 3) * 255).astype(np.uint8)
                  for _ in range(6)]
        dets = [np.array([[8, 4, 40, 44]], np.float32)] * 6
        tracks = track_bboxes(dets)
        out = run_vibe_on_tracks(
            frames, tracks,
            init_resnet50(jax.random.PRNGKey(0)),
            init_gru(jax.random.PRNGKey(1)),
            init_hmr_head(jax.random.PRNGKey(2)),
            synthetic_smpl_model(num_vertices=150, seed=0),
            min_track_len=3, out_res=64)
        assert len(out) == 1
        person = next(iter(out.values()))
        assert person["pose"].shape == (6, 72)
        assert person["betas"].shape == (6, 10)
        assert person["joints2d_img_coord"].shape == (6, 49, 2)
        # and it round-trips through the NeMo data layer
        dense = densify_person(person, 8)
        theta = vibe_to_theta(dense)
        assert theta.shape == (8, 70)
        np.testing.assert_allclose(theta[:6, -1], 1.0)


class TestSortTracker:
    def test_crossing_tracks_keep_identity(self):
        """Two boxes crossing paths: the Kalman motion model must carry each
        identity straight through the crossing (greedy IoU swaps them)."""
        from nemo_tpu.data import track_bboxes_sort
        F = 30
        dets = []
        for f in range(F):
            xa = 10.0 + 10.0 * f          # left -> right
            xb = 300.0 - 10.0 * f         # right -> left
            a = [xa, 100, xa + 40, 180]
            b = [xb, 100, xb + 40, 180]
            dets.append(np.array([a, b], np.float32))
        tracks = track_bboxes_sort(dets, iou_threshold=0.1)
        long_tracks = [t for t in tracks.values()
                       if len(t["frame_ids"]) >= F - 2]
        assert len(long_tracks) == 2
        for t in long_tracks:
            xs = t["bboxes"][:, 0]
            dx = np.diff(xs)
            # each track moves monotonically in one direction (no identity
            # swap at the crossing)
            assert (dx > 0).all() or (dx < 0).all()

    def test_occlusion_gap_reacquired(self):
        """A track that vanishes for a few frames is re-acquired by the
        predicted motion (max_age tolerance)."""
        from nemo_tpu.data import track_bboxes_sort
        dets = []
        for f in range(20):
            if 8 <= f < 11:
                dets.append(np.zeros((0, 4), np.float32))
            else:
                x = 10.0 + 5.0 * f
                dets.append(np.array([[x, 50, x + 30, 110]], np.float32))
        tracks = track_bboxes_sort(dets, iou_threshold=0.2, max_age=5)
        assert len(tracks) == 1
        (t,) = tracks.values()
        assert len(t["frame_ids"]) == 17


class TestSmoothing:
    def test_one_euro_reduces_jitter(self):
        from nemo_tpu.data import smooth_pose_sequence
        rng = np.random.RandomState(0)
        t = np.linspace(0, 2 * np.pi, 120)
        clean = np.sin(t)[:, None] * np.ones((1, 6))
        noisy = clean + 0.05 * rng.randn(120, 6)
        sm = smooth_pose_sequence(noisy.astype(np.float32))
        assert sm.shape == noisy.shape
        jitter = lambda x: np.abs(np.diff(x, axis=0)).mean()
        assert jitter(sm) < 0.7 * jitter(noisy)
        # and it still tracks the signal
        assert np.abs(sm - clean).mean() < 0.1

    def test_smooth_bbox_params(self):
        from nemo_tpu.data import smooth_bbox_params
        rng = np.random.RandomState(1)
        track = np.stack([np.linspace(0, 100, 60),
                          np.linspace(50, 60, 60),
                          np.full(60, 40.0)], axis=1)
        noisy = track + 3.0 * rng.randn(60, 3)
        sm = smooth_bbox_params(noisy.astype(np.float32))
        assert np.abs(np.diff(sm, axis=0)).mean() < \
            np.abs(np.diff(noisy, axis=0)).mean()

    def test_crop_to_image_coords(self):
        from nemo_tpu.data import crop_to_image_coords
        bbox_cs = np.array([[100.0, 200.0, 50.0]])      # cx, cy, size
        kp = np.zeros((1, 2, 2), np.float32)            # crop center
        out = crop_to_image_coords(bbox_cs, kp, crop_size=224)
        np.testing.assert_allclose(out[0, :, 0], 100.0)
        np.testing.assert_allclose(out[0, :, 1], 200.0)
        corner = np.full((1, 1, 2), -1.0, np.float32)   # crop top-left
        out = crop_to_image_coords(bbox_cs, corner, crop_size=224)
        np.testing.assert_allclose(out[0, 0], [75.0, 175.0])


def test_spin_projection_matches_torch_reference():
    """spin_projection must match a torch twin of spin.py:309-322."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from nemo_tpu.models.hmr import spin_projection

    rng = np.random.RandomState(0)
    joints = rng.randn(4, 49, 3).astype(np.float32)
    joints[..., 2] += 0.5
    cam = np.abs(rng.randn(4, 3).astype(np.float32)) + 0.5

    ours = np.asarray(spin_projection(jnp.asarray(joints), jnp.asarray(cam)))

    tj, tc = torch.tensor(joints), torch.tensor(cam)
    cam_t = torch.stack([tc[:, 1], tc[:, 2],
                         2 * 5000. / (224. * tc[:, 0] + 1e-9)], dim=-1)
    pts = tj + cam_t.unsqueeze(1)
    proj = pts / pts[:, :, -1].unsqueeze(-1)
    want = 5000.0 * proj[:, :, :2] / (224. / 2.)
    np.testing.assert_allclose(ours, want.numpy(), rtol=2e-5, atol=1e-4)


def test_render_demo_video(tmp_path, rng):
    """vibe_demo --render_out: the reference demo's default rendering
    (VIBE/demo2.py:262-315) — tracked SMPL composited over every covered
    frame, weak-persp cam via the perspective twin. Without ffmpeg the
    fallback is a .frames dir with one PNG per input frame."""
    import jax
    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.cli.vibe_demo import render_demo_video
    from nemo_tpu.data import run_vibe_on_tracks, track_bboxes
    from nemo_tpu.models import init_gru, init_hmr_head, init_resnet50

    frames = [(rng.rand(48, 64, 3) * 255).astype(np.uint8)
              for _ in range(5)]
    dets = [np.array([[8, 4, 40, 44]], np.float32)] * 5
    smpl = synthetic_smpl_model(num_vertices=150, seed=0)
    out = run_vibe_on_tracks(
        frames, track_bboxes(dets),
        init_resnet50(jax.random.PRNGKey(0)),
        init_gru(jax.random.PRNGKey(1)),
        init_hmr_head(jax.random.PRNGKey(2)),
        smpl, min_track_len=3, out_res=64)
    dst = render_demo_video(frames, out, smpl,
                            str(tmp_path / "demo.mp4"), chunk=4)
    import os
    if dst.endswith(".frames"):
        pngs = sorted(os.listdir(dst))
        assert len(pngs) == 5
        import matplotlib.pyplot as plt
        img = plt.imread(os.path.join(dst, pngs[0]))
        assert img.shape[:2] == (48, 64) and np.isfinite(img).all()
    else:
        assert os.path.exists(dst)


class TestPoseTracking:
    """The reference's STAF pose-tracking branch (VIBE/demo.py:83-146,
    lib/utils/pose_tracker.py:85-115, lib/utils/smooth_bbox.py:33-104)."""

    def _write_op_dir(self, d, frames_people):
        """frames_people: list over frames of [(person_id, kp(25,3)), ...]."""
        import json
        d.mkdir(parents=True, exist_ok=True)
        for f, people in enumerate(frames_people):
            rec = {"people": [
                {"person_id": [pid],
                 "pose_keypoints_2d": kp.ravel().tolist()}
                for pid, kp in people]}
            with open(d / f"{f:06d}_keypoints.json", "w") as fh:
                json.dump(rec, fh)

    def _kp(self, rng, cx, cy, half=10.0, conf=0.9):
        kp = np.zeros((25, 3), np.float32)
        kp[:, 0] = cx + half * (2 * rng.rand(25) - 1)
        kp[:, 1] = cy + half * (2 * rng.rand(25) - 1)
        kp[:, 2] = conf
        # pin the extent so the bbox is deterministic
        kp[0, :2] = [cx - half, cy - half]
        kp[1, :2] = [cx + half, cy + half]
        return kp

    def test_read_posetrack_groups_by_person_id(self, tmp_path, rng):
        """pose_tracker.py:97-109: detections group by person_id[0] across
        frames regardless of within-frame order."""
        from nemo_tpu.data.openpose import read_posetrack_keypoints
        a0, a1 = self._kp(rng, 30, 30), self._kp(rng, 32, 30)
        b0, b1 = self._kp(rng, 90, 40), self._kp(rng, 88, 40)
        self._write_op_dir(tmp_path / "op", [
            [(7, a0), (3, b0)],
            [(3, b1), (7, a1)],        # swapped order, same ids
        ])
        ppl = read_posetrack_keypoints(str(tmp_path / "op"))
        assert sorted(ppl) == [3, 7]
        assert ppl[7]["joints2d"].shape == (2, 25, 3)
        np.testing.assert_array_equal(ppl[7]["frames"], [0, 1])
        np.testing.assert_allclose(ppl[7]["joints2d"][1], a1)
        np.testing.assert_allclose(ppl[3]["joints2d"][0], b0)

    def test_read_posetrack_untracked_falls_back_to_index(self, tmp_path,
                                                          rng):
        """person_id [-1] (plain OpenPose, no STAF) keys by within-frame
        detection index so single-person dirs remain usable."""
        from nemo_tpu.data.openpose import read_posetrack_keypoints
        self._write_op_dir(tmp_path / "op", [
            [(-1, self._kp(rng, 30, 30))],
            [(-1, self._kp(rng, 31, 30))],
        ])
        ppl = read_posetrack_keypoints(str(tmp_path / "op"))
        assert list(ppl) == [0]
        assert len(ppl[0]["frames"]) == 2

    def test_tracks_from_posetrack_bbox_semantics(self, rng):
        """kp_to_bbox_param (smooth_bbox.py:33-59) via inference.py:45-53:
        center = visible-extent midpoint, side = extent diagonal."""
        from nemo_tpu.data.tracker import tracks_from_posetrack
        kp = self._kp(rng, 50, 60, half=12.0)
        # a low-confidence outlier must be ignored (vis_thresh 0.3)
        kp[2] = [500.0, 500.0, 0.1]
        ppl = {4: {"joints2d": kp[None], "frames": np.array([5])}}
        tr = tracks_from_posetrack(ppl)
        box = tr[4]["bboxes"][0]
        diag = np.sqrt(2.0) * 24.0
        np.testing.assert_allclose((box[0] + box[2]) / 2, 50.0, atol=1e-4)
        np.testing.assert_allclose((box[1] + box[3]) / 2, 60.0, atol=1e-4)
        np.testing.assert_allclose(box[2] - box[0], diag, rtol=1e-5)
        np.testing.assert_allclose(box[3] - box[1], diag, rtol=1e-5)
        np.testing.assert_array_equal(tr[4]["frame_ids"], [5])

    def test_tracks_from_posetrack_interpolates_gaps(self, rng):
        """get_all_bbox_params (smooth_bbox.py:62-104): interior frames
        with no usable detection get linearly interpolated bbox params;
        the track covers the dense first..last span; interpolated frames
        carry zero-confidence keypoints."""
        from nemo_tpu.data.tracker import tracks_from_posetrack
        k0 = self._kp(rng, 20, 20)
        k3 = self._kp(rng, 50, 20)
        ppl = {0: {"joints2d": np.stack([k0, k3]),
                   "frames": np.array([2, 5])}}
        tr = tracks_from_posetrack(ppl)[0]
        np.testing.assert_array_equal(tr["frame_ids"], [2, 3, 4, 5])
        cx = (tr["bboxes"][:, 0] + tr["bboxes"][:, 2]) / 2
        np.testing.assert_allclose(cx, [20, 30, 40, 50], atol=1e-4)
        assert tr["joints2d"].shape == (4, 25, 3)
        assert tr["joints2d"][1].sum() == 0.0       # hole: no detection
        assert tr["joints2d"][0, :, 2].max() > 0.0

    def test_tracks_from_posetrack_trims_invisible_ends(self, rng):
        """Leading/trailing frames whose keypoints are all below
        vis_thresh are trimmed, not extrapolated (inference.py:50-53
        time_pt1/time_pt2)."""
        from nemo_tpu.data.tracker import tracks_from_posetrack
        lo = self._kp(rng, 20, 20, conf=0.05)
        hi = self._kp(rng, 30, 20)
        ppl = {0: {"joints2d": np.stack([lo, hi, lo]),
                   "frames": np.array([0, 1, 2])}}
        tr = tracks_from_posetrack(ppl)[0]
        np.testing.assert_array_equal(tr["frame_ids"], [1])


def test_vibe_demo_pose_tracking_e2e(tmp_path, rng):
    """vibe_demo --tracking_method pose: STAF-id tracklets drive the
    pipeline end-to-end and the pkl carries the reference's 'joints2d'
    slot (VIBE/demo.py:83-86,131-132,252)."""
    import json

    import joblib
    from nemo_tpu.cli.vibe_demo import main as demo_main
    from nemo_tpu.render.video import _write_png

    T, H, W = 8, 64, 64
    frames_dir = tmp_path / "vid.frames"
    op_dir = tmp_path / "vid.frames.op"
    frames_dir.mkdir()
    op_dir.mkdir()
    for f in range(T):
        img = rng.rand(H, W, 3).astype(np.float32) * 0.2
        _write_png(str(frames_dir / f"{f:06d}.png"), img)
        x0 = 12 + f
        kp = np.zeros((25, 3), np.float32)
        kp[:, 0] = x0 + 24 * rng.rand(25)
        kp[:, 1] = 18 + 32 * rng.rand(25)
        kp[:, 2] = 0.9
        rec = {"people": [{"person_id": [11],
                           "pose_keypoints_2d": kp.ravel().tolist()}]}
        with open(op_dir / f"{f:06d}_keypoints.json", "w") as fh:
            json.dump(rec, fh)

    out_pkl = tmp_path / "vibe_output.pkl"
    rc = demo_main(["--frames_dir", str(frames_dir),
                    "--openpose_dir", str(op_dir),
                    "--tracking_method", "pose",
                    "--out", str(out_pkl), "--min_track_len", "6",
                    "--out_res", "64"])
    assert rc == 0
    out = joblib.load(out_pkl)
    assert list(out) == [11]                     # the STAF person_id
    p = out[11]
    assert p["pose"].shape == (T, 72)
    assert p["joints2d"].shape == (T, 25, 3)     # detections ride along
    assert p["orig_cam"].shape == (T, 4)
