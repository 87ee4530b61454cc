"""Eval metric tests: MPJPE tables, PCK, dynamic masking, CSV output."""

import os

import numpy as np
import pytest

from nemo_tpu.body import synthetic_smpl_model
from nemo_tpu.eval import (dynamic_frame_mask, eval_2d, eval_3d, eval_3d_pa,
                           pck_2d, rmse_2d, smpl_grid_forward, write_csv)


@pytest.fixture(scope="module")
def model():
    return synthetic_smpl_model(num_vertices=300, seed=0)


class TestEval3D:
    def test_zero_error_for_identical_poses(self, model, rng):
        V, F = 2, 6
        pose = (0.2 * rng.randn(V, F, 72)).astype(np.float32)
        stats = eval_3d(model, pose[..., 3:], pose)
        assert stats["mpjpe-ours"] == [pytest.approx(0.0, abs=1e-3)] * V
        assert stats["mpvpe-ours"] == [pytest.approx(0.0, abs=1e-3)] * V

    def test_nonzero_for_different_poses(self, model, rng):
        V, F = 1, 4
        gt = (0.2 * rng.randn(V, F, 72)).astype(np.float32)
        pred = gt[..., 3:] + 0.3
        stats = eval_3d(model, pred, gt)
        assert stats["mpjpe-ours"][0] > 1.0  # mm

    def test_baseline_columns(self, model, rng):
        V, F = 1, 3
        gt = (0.1 * rng.randn(V, F, 72)).astype(np.float32)
        base = {"vibe": gt[..., 3:] + 0.05}
        stats = eval_3d(model, gt[..., 3:], gt, baselines=base)
        assert "mpjpe-vibe" in stats and "mpvpe-vibe" in stats
        assert stats["mpjpe-vibe"][0] > stats["mpjpe-ours"][0]

    def test_pa_mpjpe(self, model, rng):
        V, F = 1, 4
        gt = (0.2 * rng.randn(V, F, 72)).astype(np.float32)
        stats = eval_3d_pa(model, gt[..., 3:], gt)
        assert stats["pa_mpjpe-ours"][0] == pytest.approx(0.0, abs=1e-3)


class TestDynamicMask:
    def test_contiguous_span(self):
        F = 20
        j = np.zeros((F, 15, 3), np.float32)
        # frames 5-10 move fast (>2 m/s at 30 fps => >6.7cm per frame)
        j[5:11, 0, 0] = np.arange(6) * 0.1
        mask = dynamic_frame_mask(j)
        inds = np.nonzero(mask)[0]
        assert len(inds) > 0
        # contiguous
        assert (np.diff(inds) == 1).all()

    def test_static_sequence_empty(self):
        j = np.zeros((10, 15, 3), np.float32)
        assert dynamic_frame_mask(j).sum() == 0


class TestEval2D:
    def test_perfect_prediction(self, rng):
        V, F = 2, 5
        gt = rng.rand(V, F, 25, 3).astype(np.float32) * 100
        gt[..., 2] = 1.0
        diag = np.full((V, F), 100.0, np.float32)
        stats = eval_2d(gt[..., :2], {}, gt, diag)
        for v in range(V):
            assert stats["recon_error_2d-ours"][v] < 0.01
            assert stats["pck-ours"][v] == pytest.approx(100.0)

    def test_pck_threshold(self):
        gt = np.zeros((4, 15, 3), np.float32)
        gt[..., 2] = 1.0
        pred = gt[..., :2] + 3.0  # offset 3*sqrt2 px
        # bbox diag 100 -> thresh 5px -> inside; diag 10 -> thresh 0.5 -> out
        assert pck_2d(pred, gt[..., :2], gt[..., 2:],
                      np.full((4,), 100.0)) == pytest.approx(100.0)
        assert pck_2d(pred, gt[..., :2], gt[..., 2:],
                      np.full((4,), 10.0)) == pytest.approx(0.0)

    def test_rmse_includes_gated_zeros_in_mean(self):
        # replicate the reference's mean-over-everything (:631-636)
        gt = np.zeros((1, 2, 3), np.float32)
        gt[0, 0, 2] = 1.0  # only first joint confident
        pred = gt[..., :2] + 4.0
        got = rmse_2d(pred, gt[..., :2], gt[..., 2:])
        want = (np.sqrt(1e-6 + 32.0) + 0.0) / 2
        assert got == pytest.approx(want, rel=1e-5)


class TestCSV:
    def test_write_csv(self, tmp_path):
        stats = {"mpjpe-ours": [1.0, 2.0], "mpvpe-ours": [3.0, 4.0]}
        p = str(tmp_path / "eval_3d.csv")
        write_csv(stats, p)
        lines = open(p).read().strip().splitlines()
        assert lines[0] == ",mpjpe-ours,mpvpe-ours"
        assert lines[1].startswith("0,1.0,3.0")


class TestEval3DGlobal:
    """eval_3d_global :992-1054 + rigid_transform_to_gt :1594-1651: an
    ALL-FRAMES rigid Kabsch (no scale) fit on vertices, reference column
    names mpjpe-ours/mpvpe-ours (+glamr)."""

    def _world(self, model, pose, trans):
        from nemo_tpu.eval.metrics import world_grid_forward
        return world_grid_forward(model, pose, trans, n_joints=25)

    def test_zero_error_for_identical_worlds(self, model, rng):
        from nemo_tpu.eval import eval_3d_global
        V, F = 1, 4
        pose = (0.2 * rng.randn(V, F, 72)).astype(np.float32)
        trans = (0.3 * rng.randn(V, F, 3)).astype(np.float32)
        v, j = self._world(model, pose, trans)
        stats = eval_3d_global(model, j, v, pose, trans)
        assert list(stats) == ["mpjpe-ours", "mpvpe-ours"]
        assert stats["mpjpe-ours"][0] == pytest.approx(0.0, abs=0.5)
        assert stats["mpvpe-ours"][0] == pytest.approx(0.0, abs=0.5)

    def test_rigid_offset_removed(self, model, rng):
        # a global rigid motion of the predicted world must be absorbed by
        # the all-frames Kabsch alignment
        from scipy.spatial.transform import Rotation as sRot
        from nemo_tpu.eval import eval_3d_global
        V, F = 1, 4
        pose = (0.2 * rng.randn(V, F, 72)).astype(np.float32)
        trans = (0.3 * rng.randn(V, F, 3)).astype(np.float32)
        v, j = self._world(model, pose, trans)
        R = sRot.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
        move = lambda X: X @ R.T + np.array([5.0, -2.0, 1.0])
        stats = eval_3d_global(model, move(j), move(v), pose, trans)
        assert stats["mpjpe-ours"][0] < 1.0  # mm

    def test_scale_not_absorbed(self, model, rng):
        # rigid_transform_3D has NO scale: a scaled pred world must NOT be
        # normalized away (this distinguishes Kabsch from the similarity
        # transform the reference reserves for find_pred2gt_transform)
        from nemo_tpu.eval import eval_3d_global
        V, F = 1, 4
        pose = (0.2 * rng.randn(V, F, 72)).astype(np.float32)
        trans = (0.3 * rng.randn(V, F, 3)).astype(np.float32)
        v, j = self._world(model, pose, trans)
        stats = eval_3d_global(model, 1.5 * j, 1.5 * v, pose, trans)
        assert stats["mpjpe-ours"][0] > 10.0  # mm

    def test_glamr_columns_exact_order(self, model, rng):
        from nemo_tpu.eval import eval_3d_global
        V, F = 2, 3
        pose = (0.2 * rng.randn(V, F, 72)).astype(np.float32)
        trans = (0.3 * rng.randn(V, F, 3)).astype(np.float32)
        g_pose = (0.2 * rng.randn(V, F, 72)).astype(np.float32)
        g_trans = trans + 0.1
        v, j = self._world(model, pose, trans)
        stats = eval_3d_global(model, j, v, pose, trans,
                               glamr_pose=g_pose, glamr_trans=g_trans)
        # the reference's exact CSV column set and insertion order
        # (neural_motion_model.py:1038-1052)
        assert list(stats) == ["mpjpe-ours", "mpvpe-ours",
                               "mpjpe-glamr", "mpvpe-glamr"]
        assert len(stats["mpjpe-glamr"]) == V
        assert stats["mpjpe-glamr"][0] > stats["mpjpe-ours"][0]


class TestEval3dPaColumns:
    def test_pa_columns_in_eval_3d(self, model, rng):
        """eval_3d now carries pa_mpjpe-* columns (BASELINE.md north star)."""
        gt = 0.2 * rng.randn(1, 3, 72).astype(np.float32)
        base = {"vibe": 0.2 * rng.randn(1, 3, 69).astype(np.float32)}
        stats = eval_3d(model, gt[..., 3:], gt, baselines=base)
        assert stats["pa_mpjpe-ours"][0] == pytest.approx(0.0, abs=1e-3)
        assert "pa_mpjpe-vibe" in stats
        # PA alignment can only reduce the error
        assert stats["pa_mpjpe-vibe"][0] <= stats["mpjpe-vibe"][0] + 1e-6


class TestBaselinePickles:
    def test_glamr_pickle(self, tmp_path, rng):
        import joblib
        from nemo_tpu.data import load_baseline_pickle
        pose = rng.randn(5, 69).astype(np.float32)
        joblib.dump({"person_data": [{"smpl_pose": pose}]},
                    str(tmp_path / "g.pkl"))
        out = load_baseline_pickle(str(tmp_path / "g.pkl"), 5, "glamr")
        assert out.shape == (5, 70)
        np.testing.assert_allclose(out[:, :69], pose)
        np.testing.assert_allclose(out[:, 69], 1.0)

    def test_vs_pickle_vibe_layout(self, tmp_path, rng):
        import joblib
        from nemo_tpu.data import load_baseline_pickle
        pose = rng.randn(4, 72).astype(np.float32)
        person = {"pose": pose, "frame_ids": np.arange(4)}
        joblib.dump({1: person}, str(tmp_path / "vs.pkl"))
        out = load_baseline_pickle(str(tmp_path / "vs.pkl"), 4, "vs")
        assert out.shape == (4, 70)
        np.testing.assert_allclose(out[:, :69], pose[:, 3:])

    def test_pare_rotmat_pickle(self, tmp_path, rng):
        import joblib
        from scipy.spatial.transform import Rotation as sRot
        from nemo_tpu.data import load_baseline_pickle
        aa = 0.3 * rng.randn(3, 24, 3).astype(np.float32)
        R = sRot.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
            3, 24, 3, 3).astype(np.float32)
        person = {"pose": R, "frame_ids": np.arange(3)}
        joblib.dump({0: person}, str(tmp_path / "pare.pkl"))
        out = load_baseline_pickle(str(tmp_path / "pare.pkl"), 3, "pare")
        assert out.shape == (3, 70)
        np.testing.assert_allclose(out[:, :69], aa[:, 1:].reshape(3, 69),
                                   atol=1e-4)

    def test_bundle_roundtrip_with_baselines(self, tmp_path, rng):
        from nemo_tpu.data import MultiViewBundle
        op = rng.rand(1, 2, 25, 3).astype(np.float32)
        b = MultiViewBundle(
            labels={"op": op},
            hmr_theta=np.zeros((1, 2, 69), np.float32),
            hmr_mask=np.ones((1, 2, 1), np.float32),
            img_hw=np.array([100., 100.], np.float32),
            framerate_multiplier=np.ones(1, np.float32),
            baseline_poses={"glamr": rng.randn(1, 2, 70).astype(np.float32)},
            name="t")
        path = str(tmp_path / "b.npz")
        b.save(path)
        b2 = MultiViewBundle.load(path)
        assert "glamr" in b2.baseline_poses
        np.testing.assert_allclose(b2.baseline_poses["glamr"],
                                   b.baseline_poses["glamr"])


class TestEvalSubsampling:
    """The reference eval methods' num_frames/num_views/view_idxs surface
    (:1060-1075; frame = round(cidx / ncol * F))."""

    def test_frame_indices_formula(self):
        from nemo_tpu.eval.metrics import eval_frame_indices
        F = 10
        got = eval_frame_indices(F, 4)
        want = [int(np.round(c / 4 * F)) for c in range(4)]
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(eval_frame_indices(F, -1), np.arange(F))
        # num_frames > F clamps to F
        assert len(eval_frame_indices(F, 99)) == F

    def test_eval_3d_subsampled_views_and_frames(self, model, rng):
        V, F = 3, 8
        gt = (0.2 * rng.randn(V, F, 72)).astype(np.float32)
        pred = gt[..., 3:] + 0.1
        full = eval_3d(model, pred, gt, pa=False)
        sub = eval_3d(model, pred, gt, pa=False, num_frames=4,
                      view_idxs=(0, 2))
        assert len(sub["mpjpe-ours"]) == 2
        # view 0 all-frames value differs from the 4-frame subsample in
        # general, but both are finite and the same order of magnitude
        assert np.isfinite(sub["mpjpe-ours"]).all()
        assert len(full["mpjpe-ours"]) == V

    def test_eval_2d_subsampled(self, rng):
        V, F = 2, 6
        gt = (100 * rng.rand(V, F, 25, 3)).astype(np.float32)
        gt[..., 2] = 1.0
        pred = gt[..., :2] + 1.0
        diag = np.full((V, F), 100.0, np.float32)
        sub = eval_2d(pred, {}, gt, diag, num_frames=3, num_views=1)
        assert len(sub["recon_error_2d-ours"]) == 1
        np.testing.assert_allclose(sub["recon_error_2d-ours"][0],
                                   np.sqrt(2.0 + 1e-6), rtol=1e-4)
