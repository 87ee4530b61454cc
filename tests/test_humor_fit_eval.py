"""HuMoR fitting-eval harness tests.

quant_eval_3d is pinned against the direct-imported reference
/root/reference/humor/humor/fitting/eval_utils.py (smplx stubbed); the
aggregation/CSV layer is pinned by hand-computed expectations since the
reference's aggregation lives inline in its eval_fitting_3d.py main.
"""

from __future__ import annotations

import csv
import sys
import types

import numpy as np
import pytest
import torch

from nemo_tpu.models.humor_fit_eval import (GRND_PEN_THRESH_LIST,
                                            aggregate_fitting_eval,
                                            compute_joint_accel,
                                            compute_toe_floor_pen,
                                            get_grnd_pen_key, per_seq_means,
                                            quant_eval_3d,
                                            write_fitting_eval_csvs)

HUMOR_ROOT = "/root/reference/humor/humor"
REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref(request):
    touched = ["smplx", "smplx.vertex_ids", "smplx.utils", "body_model",
               "body_model.utils", "body_model.body_model", "utils",
               "utils.transforms", "utils.logging", "datasets",
               "datasets.amass_utils", "fitting", "fitting.fitting_utils",
               "fitting.eval_utils", "humor", "humor.humor",
               "humor.humor.utils", "humor.humor.utils.transforms",
               "humor.humor.utils.logging"]
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

    # HUMOR_ROOT must precede REF_ROOT: /root/reference/utils would
    # otherwise shadow the humor-internal `utils` package.
    sys.path.insert(0, REF_ROOT)  # fitting_utils imports humor.humor.utils
    sys.path.insert(0, HUMOR_ROOT)
    import fitting.eval_utils as eu
    sys.path.remove(HUMOR_ROOT)
    sys.path.remove(REF_ROOT)
    return eu


def _seq(rng, T=8):
    joints = rng.standard_normal((T, 22, 3)).astype(np.float32)
    return {
        "joints3d": joints,
        "verts3d": rng.standard_normal((T, 43, 3)).astype(np.float32),
        "mesh3d": rng.standard_normal((T, 120, 3)).astype(np.float32),
        "contacts": (rng.uniform(size=(T, 22)) > 0.5).astype(np.float32),
    }


class TestQuantEval3dOracle:
    def test_parity(self, ref):
        rng = np.random.default_rng(0)
        pred, gt = _seq(rng), _seq(rng)
        obs_joints = gt["joints3d"].copy()
        occ = rng.uniform(size=obs_joints.shape[:2]) < 0.3
        obs_joints[occ] = np.inf
        obs = {"joints3d": obs_joints}

        theirs: dict = {
            "joints3d_all": [], "joints3d_ee": [], "joints3d_legs": [],
            "verts3d_all": [], "mesh3d_all": [], "contact_acc": [],
            "contact_acc_cnt": [], "accel_mag": [], "ground_pen_dist": [],
            "joints3d_vis": [], "joints3d_occ": [],
        }
        for t in GRND_PEN_THRESH_LIST:
            theirs[ref.get_grnd_pen_key(t)] = []
            theirs[ref.get_grnd_pen_key(t) + "_cnt"] = []
        # contacts stay numpy: the reference np.sum's them directly
        # (eval_utils.py:131), which this torch/numpy combo requires
        tt = lambda d: {k: (torch.tensor(v) if k != "contacts" else v)
                        for k, v in d.items()}
        ref.quant_eval_3d(theirs, tt(pred), tt(gt), tt(obs))

        ours = quant_eval_3d(pred, gt, obs)

        for k, v in theirs.items():
            assert k in ours, k
            ref_val = v[0]
            if torch.is_tensor(ref_val):
                ref_val = ref_val.numpy()
            ours_val = np.ravel(np.asarray(ours[k], dtype=np.float64))
            ref_flat = np.ravel(np.asarray(ref_val, dtype=np.float64))
            if k in ("joints3d_vis", "joints3d_occ", "ground_pen_dist"):
                # element sets; order matches construction
                np.testing.assert_allclose(np.sort(ours_val),
                                           np.sort(ref_flat), atol=1e-5,
                                           err_msg=k)
            else:
                np.testing.assert_allclose(ours_val, ref_flat, atol=1e-4,
                                           err_msg=k)

    def test_accel_and_pen_helpers(self, ref):
        rng = np.random.default_rng(1)
        joints = rng.standard_normal((10, 22, 3)).astype(np.float32)
        _, ref_mag = ref.compute_joint_accel(torch.tensor(joints))
        np.testing.assert_allclose(compute_joint_accel(joints),
                                   ref_mag.numpy(), rtol=1e-5)

        plane = torch.zeros(4)
        plane[2] = 1.0
        ref_pen, ref_tot, ref_dist = ref.compute_toe_floor_pen(
            torch.tensor(joints), plane,
            thresh_list=list(GRND_PEN_THRESH_LIST))
        pen, tot, dist = compute_toe_floor_pen(joints)
        assert pen == [int(x) for x in ref_pen]
        assert tot == ref_tot
        np.testing.assert_allclose(np.sort(dist),
                                   np.sort(np.ravel(ref_dist.numpy())),
                                   atol=1e-6)


class TestAggregation:
    def _results(self):
        rng = np.random.default_rng(2)
        per_seq = []
        for _ in range(3):
            pred, gt = _seq(rng), _seq(rng)
            per_seq.append(quant_eval_3d(pred, gt))
        return per_seq

    def test_agg_math(self):
        per_seq = self._results()
        agg = aggregate_fitting_eval(per_seq)
        pooled = np.concatenate([np.ravel(d["joints3d_all"])
                                 for d in per_seq])
        assert agg["joints3d_all"]["mean"] == pytest.approx(
            float(pooled.mean()))
        assert agg["joints3d_all"]["median"] == pytest.approx(
            float(np.median(pooled)))
        # ratio metric: pooled counts, sentinels elsewhere
        val = sum(float(d["contact_acc"]) for d in per_seq)
        cnt = sum(float(d["contact_acc_cnt"]) for d in per_seq)
        assert agg["contact_acc"]["mean"] == pytest.approx(val / cnt)
        assert agg["contact_acc"]["std"] == -1.0
        # supplemental values (eval_fitting_3d.py:438-452)
        pen0 = agg[get_grnd_pen_key(0.0)]["mean"]
        assert agg["ground_pen_dist_normalized"]["mean"] == pytest.approx(
            agg["ground_pen_dist"]["mean"] * pen0)
        fracs = [agg[get_grnd_pen_key(t)]["mean"]
                 for t in GRND_PEN_THRESH_LIST]
        assert agg["ground_pen_mean_agg_frac"]["mean"] == pytest.approx(
            float(np.mean(fracs)))

    def test_per_seq_rows(self):
        per_seq = self._results()
        rows = per_seq_means(per_seq)
        assert len(rows) == 3
        assert rows[0]["joints3d_all"] == pytest.approx(
            float(per_seq[0]["joints3d_all"].mean()))
        assert rows[1]["contact_acc"] == pytest.approx(
            float(per_seq[1]["contact_acc"])
            / float(per_seq[1]["contact_acc_cnt"]))

    def test_csv_family(self, tmp_path):
        per_seq = self._results()
        out = str(tmp_path / "eval_quant")
        write_fitting_eval_csvs(
            out, {"final_results": per_seq, "stage2_results": per_seq},
            [f"seq_{i}" for i in range(3)])
        import os
        expected = ["final_results_per_seq_mean.csv",
                    "final_results_agg_mean.csv",
                    "final_results_agg_std.csv",
                    "final_results_agg_median.csv",
                    "final_results_agg_max.csv",
                    "final_results_agg_min.csv",
                    "stage2_results_per_seq_mean.csv", "compare_mean.csv",
                    "compare_max.csv", "compare_median.csv"]
        for name in expected:
            assert os.path.exists(os.path.join(out, name)), name
        with open(os.path.join(out, "compare_mean.csv")) as f:
            rows = list(csv.reader(f))
        assert rows[0][0] == "method"
        assert {r[0] for r in rows[1:]} == {"final_results",
                                            "stage2_results"}
        agg = aggregate_fitting_eval(per_seq)
        col = rows[0].index("joints3d_all")
        assert float(rows[1][col]) == pytest.approx(
            agg["joints3d_all"]["mean"])


class TestQuantEval2dOracle:
    def test_parity_with_occlusion_split(self, ref):
        from nemo_tpu.models.humor_fit_eval import quant_eval_2d

        rng = np.random.default_rng(5)
        T = 9
        pred_smpl = rng.standard_normal((T, 22, 3)).astype(np.float32)
        # camera-frame comparison joints in front of the camera (z > 0)
        pred_comp = rng.standard_normal((T, 12, 3)).astype(np.float32)
        gt_comp = rng.standard_normal((T, 12, 3)).astype(np.float32)
        pred_comp[..., 2] += 4.0
        gt_comp[..., 2] += 4.0
        gt_comp[2] = np.inf  # one missing GT frame (valid-frame mask path)
        imw, imh = 64, 48
        cam = (40.0, 40.0, imw / 2.0, imh / 2.0)
        vis_mask = (rng.uniform(size=(T, imh, imw)) < 0.4).astype(np.uint8)
        floor = np.array([0.0, 0.0, 1.0, 0.0], np.float32)

        keys = ["joints3d_all", "joints3d_ee", "joints3d_legs",
                "joints3d_align_all", "joints3d_align_ee",
                "joints3d_align_legs", "joints3d_vis", "joints3d_occ",
                "joints3d_align_vis", "joints3d_align_occ", "accel_mag",
                "accel_mag_align", "ground_pen_dist"]
        theirs: dict = {k: [] for k in keys}
        for t in ref.GRND_PEN_THRESH_LIST:
            theirs[ref.get_grnd_pen_key(t)] = []
            theirs[ref.get_grnd_pen_key(t) + "_cnt"] = []
        # reference clips projected pixels to its global IMW/IMH; monkeypatch
        # them to the toy image so the occlusion lookup is in range
        old_w, old_h = ref.IMW, ref.IMH
        ref.IMW, ref.IMH = imw, imh
        try:
            ref.quant_eval_2d(theirs, torch.tensor(pred_smpl),
                              torch.tensor(floor),
                              pred_joints_comp=torch.tensor(pred_comp),
                              gt_joints_comp=torch.tensor(gt_comp),
                              vis_mask=vis_mask, cam_intrins=cam)
        finally:
            ref.IMW, ref.IMH = old_w, old_h

        ours = quant_eval_2d(pred_smpl, floor, pred_comp, gt_comp,
                             vis_mask, cam, imw=imw, imh=imh)

        for k, v in theirs.items():
            assert k in ours, k
            rv = v[0]
            if torch.is_tensor(rv):
                rv = rv.numpy()
            np.testing.assert_allclose(
                np.ravel(np.asarray(ours[k], np.float64)),
                np.ravel(np.asarray(rv, np.float64)), atol=1e-4,
                err_msg=k)

    def test_smpl2compare_map(self, ref):
        from nemo_tpu.models.humor_fit_eval import (COMP_EE_INDS,
                                                    COMP_LEGS_INDS,
                                                    COMP_ROOT_IDX,
                                                    IMAP2COMPARE,
                                                    SMPL2COMPARE)
        assert list(SMPL2COMPARE) == list(ref.SMPL2COMPARE)
        assert list(IMAP2COMPARE) == list(ref.IMAP2COMPARE)
        assert COMP_ROOT_IDX == ref.COMP_ROOT_IDX
        assert list(COMP_EE_INDS) == [ref.COMP_JOINTS[j] for j in
                                      ("RANK", "LANK", "RWRI", "LWRI")]
        assert list(COMP_LEGS_INDS) == [ref.COMP_JOINTS[j] for j in
                                        ("RANK", "LANK", "RKNE", "LKNE")]


class TestResultsDirs:
    def _toy_smpl(self, trans, orient, pose, betas):
        T = trans.shape[0]
        base = trans[:, None, :] + 0.1 * orient[:, None, :]
        joints = base + np.arange(24)[None, :, None] * 0.05
        verts = (base + np.arange(6890)[None, :, None] * 1e-4
                 + pose.reshape(T, 21, 3).mean(1, keepdims=True))
        return joints, verts

    def _payload(self, rng, T=6):
        return {"trans": rng.standard_normal((T, 3)).astype(np.float32),
                "root_orient": rng.standard_normal((T, 3))
                .astype(np.float32),
                "pose_body": rng.standard_normal((T, 63))
                .astype(np.float32),
                "betas": rng.standard_normal(16).astype(np.float32),
                "contacts": (rng.uniform(size=(T, 22)) > 0.5)
                .astype(np.float32)}

    def test_save_load_walk_eval(self, tmp_path):
        from nemo_tpu.models.humor_fit_eval import (
            GT_RES_NAME, PRED_RES_NAME, eval_fitting_results_dirs,
            load_fitting_results, save_fitting_results)
        import os
        rng = np.random.default_rng(7)
        root = str(tmp_path / "results")
        for i in range(2):
            gt = self._payload(rng)
            pred = self._payload(rng) if i == 0 else {
                k: v.copy() for k, v in gt.items()}  # seq 1: perfect fit
            save_fitting_results(os.path.join(root, f"seq_{i}_000"),
                                 pred, gt=gt)

        back = load_fitting_results(os.path.join(root, "seq_0_000"),
                                    PRED_RES_NAME)
        assert set(back) >= {"trans", "root_orient", "pose_body", "betas"}
        assert load_fitting_results(os.path.join(root, "seq_0_000"),
                                    "missing_name") is None

        out = str(tmp_path / "eval_quant")
        seqs = eval_fitting_results_dirs(root, out, self._toy_smpl)
        assert seqs == ["seq_0_000", "seq_1_000"]
        import csv as _csv
        with open(os.path.join(
                out, f"{PRED_RES_NAME}_per_seq_mean.csv")) as f:
            rows = list(_csv.reader(f))
        col = rows[0].index("joints3d_all")
        assert float(rows[1][col]) > 0.0        # seq_0: real error
        assert float(rows[2][col]) == pytest.approx(0.0, abs=1e-6)
        # perfect fit also has perfect contact accuracy
        ccol = rows[0].index("contact_acc")
        assert float(rows[2][ccol]) == pytest.approx(1.0)
        # meta.txt written in the reference's two-line format
        with open(os.path.join(root, "seq_0_000", "meta.txt")) as f:
            lines = f.read().splitlines()
        assert lines[0].startswith("optim_bm ") and \
            lines[1].startswith("gt_bm ")
