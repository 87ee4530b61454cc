"""CLI-level tests: preprocess packer and the fit CLI on a tiny problem."""

import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture
def raw_action(tmp_path, rng):
    """Two views of OpenPose JSONs with different lengths + Penn mats."""
    from scipy.io import savemat
    root = tmp_path / "data"
    mats = []
    for v in range(2):
        d = root / f"vid{v}.mp4.frames.op"
        d.mkdir(parents=True)
        T = 10 + 4 * v
        for f in range(T):
            kp = np.zeros((25, 3), np.float32)
            kp[:, 0] = 100 + 50 * rng.rand(25)
            kp[:, 1] = 80 + 90 * rng.rand(25)
            kp[:, 2] = 0.9
            with open(d / f"{f:06d}_keypoints.json", "w") as fh:
                json.dump({"people": [
                    {"pose_keypoints_2d": kp.ravel().tolist()}]}, fh)
        mat = tmp_path / f"penn{v}.mat"
        savemat(str(mat), {"x": rng.rand(T, 13) * 100,
                           "y": rng.rand(T, 13) * 100,
                           "visibility": np.ones((T, 13))})
        mats.append(str(mat))
    cfg = tmp_path / "action.yml"
    cfg.write_text(yaml.safe_dump(
        {"exp_dir": str(root),
         "videos": {"names": ["vid0.mp4", "vid1.mp4"]}}))
    return str(cfg), mats


class TestPreprocessCLI:
    def test_pack_with_penn_labels(self, raw_action, tmp_path):
        from nemo_tpu.cli.preprocess import main
        from nemo_tpu.data import MultiViewBundle
        cfg, mats = raw_action
        out = str(tmp_path / "bundle.npz")
        assert main(["--nemo_cfg_path", cfg, "--out", out,
                     "--penn_mats", ",".join(mats)]) == 0
        b = MultiViewBundle.load(out)
        assert b.num_views == 2
        assert b.num_frames == 10  # min over views
        assert sorted(b.labels) == ["gt", "op"]
        # framerate multiplier reflects per-view lengths
        np.testing.assert_allclose(b.framerate_multiplier,
                                   [10 / 10, 10 / 14], atol=1e-6)

    def test_pack_openpose_only(self, raw_action, tmp_path):
        from nemo_tpu.cli.preprocess import main
        from nemo_tpu.data import MultiViewBundle
        cfg, _ = raw_action
        out = str(tmp_path / "b2.npz")
        assert main(["--nemo_cfg_path", cfg, "--out", out,
                     "--n_frames", "6"]) == 0
        b = MultiViewBundle.load(out)
        assert b.num_frames == 6
        assert "gt" not in b.labels  # no GT source given


class TestFitCLIUnit:
    @pytest.mark.slow
    def test_end_to_end_tiny(self, raw_action, tmp_path):
        """preprocess -> fit -> outputs: the full user path at tiny scale."""
        from nemo_tpu.cli.preprocess import main as pre_main
        from nemo_tpu.cli.fit import main as fit_main
        cfg, mats = raw_action
        bundle = str(tmp_path / "b.npz")
        pre_main(["--nemo_cfg_path", cfg, "--out", bundle,
                  "--penn_mats", ",".join(mats)])
        out_dir = str(tmp_path / "out")
        rc = fit_main([
            "--bundle", bundle, "--synthetic_assets", "--label_type", "gt",
            "--model_version", "1", "--h_dim", "8",
            "--instance_code_size", "0", "--monotonic_network_n_nodes", "3",
            "--batch_size", "4", "--n_steps", "2", "--warmup_step", "2",
            "--opt_cam_step", "2", "--weight_gmm_loss", "0",
            "--save_every", "2", "--out_dir", out_dir])
        assert rc == 0
        run = os.path.join(out_dir, "000000")
        for f in ("config.json", "metrics.jsonl", "losses.npz",
                  "eval_2d.csv", "phases.png"):
            assert os.path.exists(os.path.join(run, f)), f


class TestFitSuiteCLI:
    @pytest.mark.slow
    def test_suite_over_two_bundles(self, raw_action, tmp_path):
        """fit_suite loops fit over bundles, one run dir per action
        (the reference's SLURM-array sweep surface)."""
        from nemo_tpu.cli.fit_suite import main as suite_main
        from nemo_tpu.cli.preprocess import main as pre_main

        cfg, mats = raw_action
        bundles = []
        for i in range(2):
            b = str(tmp_path / f"act{i}.npz")
            pre_main(["--nemo_cfg_path", cfg, "--out", b,
                      "--penn_mats", ",".join(mats)])
            bundles.append(b)
        out_dir = str(tmp_path / "suite")
        rc = suite_main(["--bundles"] + bundles + [
            "--out_dir", out_dir,
            "--synthetic_assets", "--label_type", "gt",
            "--model_version", "1", "--h_dim", "8",
            "--instance_code_size", "0", "--monotonic_network_n_nodes", "3",
            "--batch_size", "4", "--n_steps", "2", "--warmup_step", "2",
            "--opt_cam_step", "2", "--weight_gmm_loss", "0",
            "--save_every", "2"])
        assert rc == 0
        for i in range(2):
            run = os.path.join(out_dir, f"act{i}", "000000")
            assert os.path.exists(os.path.join(run, "metrics.jsonl")), i


class TestResumeProbe:
    @pytest.mark.slow
    def test_eval_only_resume_reproduces_final_loss(self, raw_action,
                                                    tmp_path, capsys):
        """--test --load_ckpt_path must reproduce the original run's final
        eval exactly (the reference's save/load round-trip :257-280)."""
        import json as _json

        from nemo_tpu.cli.fit import main as fit_main
        from nemo_tpu.cli.preprocess import main as pre_main

        cfg, mats = raw_action
        bundle = str(tmp_path / "b.npz")
        pre_main(["--nemo_cfg_path", cfg, "--out", bundle,
                  "--penn_mats", ",".join(mats)])
        out_dir = str(tmp_path / "out")
        flags = ["--bundle", bundle, "--synthetic_assets",
                 "--label_type", "gt", "--model_version", "2",
                 "--h_dim", "8", "--instance_code_size", "2",
                 "--phase_rbf_dim", "4", "--monotonic_network_n_nodes", "3",
                 "--batch_size", "4", "--n_steps", "4", "--warmup_step", "2",
                 "--opt_cam_step", "2", "--weight_gmm_loss", "0",
                 "--save_every", "4"]
        assert fit_main(flags + ["--out_dir", out_dir]) == 0
        run = os.path.join(out_dir, "000000")
        with open(os.path.join(run, "metrics.jsonl")) as f:
            final = _json.loads(f.readlines()[-1])
        assert final["phase"] == "final", final
        ckpt = os.path.join(run, "ckpt", "sd_000004")
        assert os.path.exists(ckpt), os.listdir(os.path.join(run, "ckpt"))
        capsys.readouterr()
        assert fit_main(flags + ["--out_dir", str(tmp_path / "out2"),
                                 "--test", "--load_ckpt_path", ckpt]) == 0
        text = capsys.readouterr().out
        # the eval-only run prints the same final kp_loss
        import re
        m = re.search(r"'kp_loss': ([0-9.]+)", text)
        assert m, text
        np.testing.assert_allclose(float(m.group(1)),
                                   final["kp_loss"], rtol=1e-4)
