"""Eval-stack parity: the repo's CSV oracle vs the torch/numpy reference
twin (torch_twin_eval.py).

The fit loss is already pinned by test_reference_twin.py; these tests pin
the METRIC pipeline — reconstruction_error, the dynamic-frame mask,
eval_2d rmse/pck, eval_3d MPJPE/MPVPE and the eval_3d_global all-frames
rigid alignment — cell-by-cell on a shared synthetic action, so the
"<1 mm parity" claim covers the oracle end-to-end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nemo_tpu.body import synthetic_smpl_model
from nemo_tpu.eval import eval_2d, eval_3d, eval_3d_global
from nemo_tpu.eval.metrics import world_grid_forward

import torch_twin_eval as twin
from torch_twin import TorchSMPL


@pytest.fixture(scope="module")
def model():
    return synthetic_smpl_model(num_vertices=300, seed=0)


@pytest.fixture(scope="module")
def tsmpl(model):
    return TorchSMPL(model)


def _poses(rng, V, F, scale=0.3):
    return (scale * rng.randn(V, F, 72)).astype(np.float32)


def _assert_stats_match(ours, theirs, rtol=2e-4, atol=2e-3):
    shared = sorted(set(ours) & set(theirs))
    assert shared, "no shared columns"
    for col in shared:
        np.testing.assert_allclose(
            np.asarray(ours[col], np.float64),
            np.asarray(theirs[col], np.float64), rtol=rtol, atol=atol,
            err_msg=f"column {col} diverges from the reference twin")


class TestEval3DTwin:
    def test_eval_3d_cells_match(self, model, tsmpl, rng):
        V, F = 2, 5
        gt = _poses(rng, V, F)
        pred = gt[..., 3:] + 0.1 * rng.randn(V, F, 69).astype(np.float32)
        base = {"vibe": gt[..., 3:] +
                0.2 * rng.randn(V, F, 69).astype(np.float32)}
        ours = eval_3d(model, pred, gt, baselines=base, pa=False)
        ref = twin.eval_3d(tsmpl, pred, gt, baselines=base)
        assert set(ref) <= set(ours)    # repo columns are a superset
        _assert_stats_match(ours, ref)

    def test_eval_3d_dynamic_cells_match(self, model, tsmpl, rng):
        V, F = 2, 8
        gt = np.zeros((V, F, 72), np.float32)
        # a moving mid-span: large pose steps in frames 2..5
        gt[:, 2:6] = _poses(rng, V, 4, scale=1.0)
        pred = gt[..., 3:] + 0.05 * rng.randn(V, F, 69).astype(np.float32)
        fm = np.array([1.0, 1.4], np.float32)   # non-unit per-view ratios
        ours = eval_3d(model, pred, gt, dynamic_only=True,
                       framerate_multiplier=fm, pa=False)
        ref = twin.eval_3d(tsmpl, pred, gt, dynamic_only=True,
                           framerate_multiplier=fm)
        _assert_stats_match(ours, ref)

    def test_dynamic_mask_hand_computed(self, model):
        """The fm semantics: vel = per-frame diff * 30 * fm; the span runs
        inds.min()..inds.max() EXCLUSIVE of the last index (reference's
        mask[inds.min():inds.max()] = 1)."""
        from nemo_tpu.eval import dynamic_frame_mask
        F = 10
        j = np.zeros((F, 15, 3), np.float32)
        # joint 0 ramps 5 cm/frame across frames 3..6, then HOLDS (so the
        # only nonzero diffs are at indices 3, 4, 5)
        j[:, 0, 0] = 0.05 * np.clip(np.arange(F) - 3, 0, 3)
        # fm = 1: 0.05 * 30 = 1.5 m/s < 2  -> empty mask
        assert dynamic_frame_mask(j, framerate_multiplier=1.0).sum() == 0
        # fm = 1.5: 0.05 * 45 = 2.25 m/s >= 2 -> diff indices {3,4,5},
        # mask[3:5] = 1 (the reference's EXCLUSIVE inds.max() upper bound)
        mask = dynamic_frame_mask(j, framerate_multiplier=1.5)
        np.testing.assert_array_equal(np.nonzero(mask)[0], [3, 4])


class TestEval2DTwin:
    def test_eval_2d_cells_match(self, rng):
        V, F = 2, 6
        gt = (100 * rng.rand(V, F, 25, 3)).astype(np.float32)
        gt[..., 2] = (rng.rand(V, F, 25) > 0.3).astype(np.float32)
        pred = gt[..., :2] + 3.0 * rng.randn(V, F, 25, 2).astype(np.float32)
        labels = {"op": gt + 1.0, "vibe": gt - 2.0}
        diag = (80 + 40 * rng.rand(V, F)).astype(np.float32)
        ours = eval_2d(pred, labels, gt, diag)
        ref = twin.eval_2d(pred, labels, gt, diag)
        assert list(ours) == list(ref)  # identical column set AND order
        _assert_stats_match(ours, ref, rtol=1e-4, atol=1e-3)


class TestEval3DGlobalTwin:
    def test_eval_3d_global_cells_match(self, model, tsmpl, rng):
        V, F = 2, 4
        gt = _poses(rng, V, F)
        gt_trans = (0.5 * rng.randn(V, F, 3)).astype(np.float32)
        # pred world: perturbed pose placed by the repo's world forward
        pred_pose = gt + 0.1 * rng.randn(V, F, 72).astype(np.float32)
        pred_trans = gt_trans + 0.05 * rng.randn(V, F, 3).astype(np.float32)
        pred_v, pred_j = world_grid_forward(model, pred_pose, pred_trans,
                                            n_joints=25)
        g_pose = gt + 0.3 * rng.randn(V, F, 72).astype(np.float32)
        g_trans = gt_trans + 0.2
        ours = eval_3d_global(model, pred_j, pred_v, gt, gt_trans,
                              glamr_pose=g_pose, glamr_trans=g_trans)
        ref = twin.eval_3d_global(tsmpl, pred_j, pred_v, gt, gt_trans,
                                  glamr_pose=g_pose, glamr_trans=g_trans)
        assert set(ours) == set(ref) == {"mpjpe-ours", "mpvpe-ours",
                                         "mpjpe-glamr", "mpvpe-glamr"}
        _assert_stats_match(ours, ref)
