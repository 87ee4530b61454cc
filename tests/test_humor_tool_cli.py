"""Smoke tests for the HuMoR tool CLI (train / train-state-prior /
fit-eval), the repo's counterpart of train_humor.py,
train_state_prior.py, and eval_fitting_3d.py's quantitative path."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from nemo_tpu.cli.humor_tool import main


class TestStatePriorCli:
    def test_train_state_prior(self, tmp_path, capsys):
        out = str(tmp_path / "prior")
        rc = main(["train-state-prior", "--synthetic", "300",
                   "--gmm_comps", "3", "--iters", "15", "--out", out])
        assert rc == 0
        path = os.path.join(out, "prior_gmm.npz")
        assert os.path.exists(path)
        with np.load(path) as d:
            assert d["weights"].shape == (3,)
            assert d["means"].shape == (3, 138)
            assert d["covariances"].shape == (3, 138, 138)
        # loadable by the fitting-stage consumer
        from nemo_tpu.models.humor_fit import load_init_motion_prior
        prior = load_init_motion_prior(path)
        assert np.all(np.isfinite(np.asarray(prior["logdet"])))


class TestFitEvalCli:
    def test_fit_eval_synthetic_assets(self, tmp_path):
        from nemo_tpu.models.humor_fit_eval import (PRED_RES_NAME,
                                                    save_fitting_results)
        rng = np.random.default_rng(0)
        root = str(tmp_path / "results")
        T = 4
        for i in range(2):
            payload = {
                "trans": rng.standard_normal((T, 3)).astype(np.float32),
                "root_orient": (rng.standard_normal((T, 3)) * 0.2)
                .astype(np.float32),
                "pose_body": (rng.standard_normal((T, 63)) * 0.1)
                .astype(np.float32),
                "betas": np.zeros(16, np.float32),
                "contacts": np.zeros((T, 22), np.float32),
            }
            gt = {k: v.copy() for k, v in payload.items()}
            save_fitting_results(os.path.join(root, f"seq_{i}"),
                                 payload, gt=gt)
        out = str(tmp_path / "eval")
        rc = main(["fit-eval", "--results", root, "--out", out,
                   "--synthetic_assets"])
        assert rc == 0
        import csv
        with open(os.path.join(out,
                               f"{PRED_RES_NAME}_per_seq_mean.csv")) as f:
            rows = list(csv.reader(f))
        assert len(rows) == 3  # header + 2 seqs
        col = rows[0].index("joints3d_all")
        # pred == gt through the same body model -> zero error
        assert float(rows[1][col]) == pytest.approx(0.0, abs=1e-5)


@pytest.mark.slow
class TestTrainCli:
    def test_train_synthetic_scheduled(self, tmp_path):
        out = str(tmp_path / "run")
        rc = main(["train", "--synthetic", "32", "--seq_len", "3",
                   "--epochs", "2", "--batch_size", "16", "--out", out,
                   "--sched_samp_start", "0", "--sched_samp_end", "2",
                   "--sched_milestones", "1", "--sched_decay", "0.1"])
        assert rc == 0
        with open(os.path.join(out, "train_stats.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        assert len(rows) == 2
        assert all(np.isfinite(r["loss"]) for r in rows)
        assert rows[0]["update_skipped"] == 0.0
        # MultiStepLR kicked in at epoch 1
        assert rows[1]["lr"] == pytest.approx(rows[0]["lr"] * 0.1)
        with np.load(os.path.join(out, "humor_params.npz")) as d:
            assert any(k.startswith("encoder.") for k in d.files)


@pytest.mark.slow
class TestFitAmassCli:
    def test_process_then_fit_then_eval(self, tmp_path):
        """process-amass -> fit-amass (joints+verts+points obs) ->
        eval CSV family: the run_fitting.py data_type=AMASS loop."""
        raw = tmp_path / "raw" / "HumanEva" / "S1"
        raw.mkdir(parents=True)
        rng = np.random.default_rng(0)
        T = 150
        t = np.linspace(0, 4 * np.pi, T)[:, None]
        poses = np.zeros((T, 156))
        poses[:, :3] = 0.2 * np.stack(
            [np.sin(t[:, 0]), np.cos(t[:, 0]), 0 * t[:, 0]], 1)
        poses[:, 3:66] = 0.15 * np.sin(t + rng.uniform(0, np.pi, (1, 63)))
        trans = np.stack([0.3 * t[:, 0], 0.1 * np.sin(t[:, 0]),
                          np.zeros(T)], 1)
        np.savez(raw / "walk_poses.npz", poses=poses, trans=trans,
                 betas=rng.standard_normal(16) * 0.3, gender="neutral",
                 mocap_framerate=120.0)

        proc = str(tmp_path / "proc")
        assert main(["process-amass", "--amass_root",
                     str(tmp_path / "raw"), "--out", proc]) == 0

        out = str(tmp_path / "fit")
        rc = main(["fit-amass", "--amass", proc, "--out", out,
                   "--split", "test", "--seq_len", "8",
                   "--obs", "joints", "verts", "points",
                   "--num_samp_pts", "64", "--latent_size", "8",
                   "--steps", "3", "4", "3", "--noise_std", "0.005"])
        assert rc == 0
        res = os.listdir(os.path.join(out, "results_out"))
        assert len(res) == 1
        seq_dir = os.path.join(out, "results_out", res[0])
        for name in ("stage3_results.npz", "gt_results.npz",
                     "observations.npz", "meta.txt"):
            assert os.path.exists(os.path.join(seq_dir, name)), name
        with np.load(os.path.join(seq_dir, "observations.npz")) as d:
            assert d["points3d"].shape == (8, 64, 3)
        csvs = [f for f in os.listdir(os.path.join(out, "eval_out"))
                if f.endswith(".csv")]
        assert any("per_seq_mean" in c for c in csvs)
        assert any("agg_mean" in c for c in csvs)


@pytest.mark.slow
class TestFitProxCli:
    def test_fit_prox_rgbd(self, tmp_path):
        """PROX quantitative RGB-D: keypoints + depth point clouds ->
        3-stage fit with points3d chamfer + observed floor -> results +
        eval CSVs (run_fitting.py data_type=PROX-RGBD, fit_proxd.cfg)."""
        from PIL import Image

        from tests.test_humor_rgb import _make_prox_tree

        rng = np.random.default_rng(3)
        root, _, _ = _make_prox_tree(tmp_path, rng, n_frames=6)
        rec = os.path.join(root, "quantitative", "recordings",
                           "vicon_03301_01")
        os.makedirs(os.path.join(rec, "Depth"))
        # Kinect-sized 16-bit depth (~2 m plane) and full-size color masks
        depth = (16000 + 500 * rng.standard_normal((424, 512))).astype(
            np.uint16)
        mask = Image.fromarray(np.zeros((1080, 1920), np.uint8), mode="L")
        for t in range(6):
            name = "s%03d_frame_%05d" % (0, t)
            Image.fromarray(depth).save(
                os.path.join(rec, "Depth", name + ".png"))
            mask.save(os.path.join(rec, "BodyIndexColor", name + ".png"))

        out = str(tmp_path / "fit")
        rc = main(["fit-prox", "--prox", root, "--quant", "--out", out,
                   "--seq_len", "5", "--rgbd", "--max_pts", "32",
                   "--latent_size", "8", "--steps", "2", "3", "2",
                   "--max_seqs", "1"])
        assert rc == 0
        res = os.listdir(os.path.join(out, "results_out"))
        assert len(res) == 1
        seq_dir = os.path.join(out, "results_out", res[0])
        with np.load(os.path.join(seq_dir, "observations.npz")) as d:
            assert d["points3d"].shape == (5, 32, 3)
            assert np.isfinite(d["points3d"]).all()
        with np.load(os.path.join(seq_dir, "stage3_results.npz")) as d:
            assert np.isfinite(d["trans"]).all()
            assert "floor_plane" in d.files
        csvs = os.listdir(os.path.join(out, "eval_out"))
        assert any("per_seq_mean" in c for c in csvs)
