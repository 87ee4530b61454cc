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
        # framerate multiplier is the reference's raw-frames-per-resampled-
        # frame n_seq_frames / num_frames (multi_view_sequence.py:300)
        np.testing.assert_allclose(b.framerate_multiplier,
                                   [10 / 10, 14 / 10], atol=1e-6)

    def test_pack_vibe_2d_labels_and_glamr_world(self, raw_action, tmp_path,
                                                 rng):
        """VIBE joints2d -> labels_vibe (the eval_2d vibe columns' source,
        neural_motion_model.py:558-560) and GLAMR orient/trans -> the
        eval_3d_global world baseline (:1557-1577)."""
        import joblib
        import os.path as osp
        from nemo_tpu.cli.preprocess import main
        from nemo_tpu.data import MultiViewBundle
        cfg, mats = raw_action
        root = osp.join(str(tmp_path), "data")
        glamr_paths = []
        for v, name in enumerate(["vid0.mp4", "vid1.mp4"]):
            T = 10 + 4 * v
            vd = osp.join(root, name + "_vibe")
            os.makedirs(vd)
            person = {
                "pose": rng.randn(T, 72).astype(np.float32),
                "betas": rng.randn(T, 10).astype(np.float32),
                "orig_cam": rng.rand(T, 4).astype(np.float32) + 0.5,
                "joints2d_img_coord":
                    (rng.rand(T, 49, 2) * 100).astype(np.float32),
                "frame_ids": np.arange(T),
            }
            joblib.dump({1: person}, osp.join(vd, "vibe_output.pkl"))
            gp = osp.join(str(tmp_path), f"glamr{v}.pkl")
            joblib.dump({"person_data": [{
                "smpl_pose": rng.randn(T, 69).astype(np.float32),
                "smpl_orient_cam": rng.randn(T, 3).astype(np.float32),
                "root_trans_cam": rng.randn(T, 3).astype(np.float32),
                "kp_2d": (rng.rand(T, 15, 3) * 100).astype(np.float32),
            }]}, gp)
            glamr_paths.append(gp)
        out = str(tmp_path / "bundle_vibe.npz")
        assert main(["--nemo_cfg_path", cfg, "--out", out,
                     "--penn_mats", ",".join(mats),
                     "--glamr_pkls", ",".join(glamr_paths)]) == 0
        b = MultiViewBundle.load(out)
        assert sorted(b.labels) == ["gt", "op", "vibe"]
        assert b.labels["vibe"].shape == (2, 10, 25, 3)
        # conf column = tracklet mask
        np.testing.assert_allclose(b.labels["vibe"][..., 2], 1.0)
        assert "glamr" in b.baseline_poses
        assert b.glamr_orient.shape == (2, 10, 3)
        assert b.glamr_trans.shape == (2, 10, 3)
        # VIBE's own render slots (render_vibe_rollout's vibe_cam source,
        # neural_motion_model.py:1457-1462): orient + mean betas + orig_cam
        assert b.vibe_orient.shape == (2, 10, 3)
        assert b.vibe_betas.shape == (2, 10)
        assert b.vibe_cam.shape == (2, 10, 4)
        from nemo_tpu.render import baseline_persons_from_bundle
        persons = baseline_persons_from_bundle(b)
        assert len(persons) == 2
        assert persons[0]["pose"].shape == (10, 72)
        np.testing.assert_allclose(persons[0]["pose"][:, :3],
                                   b.vibe_orient[0])
        np.testing.assert_allclose(persons[0]["pose"][:, 3:],
                                   b.hmr_theta[0])

    def test_pack_penn_seq_names_layout(self, tmp_path, rng):
        """seq_names-style YAML + --penn_root packs the reference's Penn
        Action layout (PennActionMultiViewSequence,
        multi_view_sequence.py:511-640), skipping VIBE-failed sequences and
        using min-frames - round(min*start) - 1 as the frame budget."""
        import joblib
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from scipy.io import savemat
        from nemo_tpu.cli.preprocess import main
        from nemo_tpu.data import MultiViewBundle

        root = tmp_path / "penn"
        seqs = {"0001": 12, "0002": 15, "0003": 9}  # 0003 will "fail"
        for sid, T in seqs.items():
            (root / "frames" / sid).mkdir(parents=True)
            (root / "openpose" / sid).mkdir(parents=True)
            (root / "labels").mkdir(parents=True, exist_ok=True)
            (root / "vibe_results" / sid).mkdir(parents=True)
            for f in range(T):
                plt.imsave(str(root / "frames" / sid / f"{f + 1:06d}.jpg"),
                           np.zeros((8, 8, 3), np.float32))
                kp = np.zeros((25, 3), np.float32)
                kp[:, 0] = 50 + 20 * rng.rand(25)
                kp[:, 1] = 40 + 30 * rng.rand(25)
                kp[:, 2] = 0.9
                with open(root / "openpose" / sid /
                          f"{f:06d}_keypoints.json", "w") as fh:
                    json.dump({"people": [
                        {"pose_keypoints_2d": kp.ravel().tolist()}]}, fh)
            savemat(str(root / "labels" / f"{sid}.mat"),
                    {"x": rng.rand(T, 13) * 100, "y": rng.rand(T, 13) * 100,
                     "visibility": np.ones((T, 13))})
            if sid == "0003":
                joblib.dump({}, str(root / "vibe_results" / sid /
                                    "vibe_output.pkl"))   # VIBE failed
            else:
                person = {"pose": rng.randn(T, 72).astype(np.float32),
                          "joints2d_img_coord":
                              (rng.rand(T, 49, 2) * 80).astype(np.float32),
                          "frame_ids": np.arange(T)}
                joblib.dump({1: person}, str(root / "vibe_results" / sid /
                                             "vibe_output.pkl"))
        cfg = tmp_path / "penn_action.yml"
        cfg.write_text(yaml.safe_dump(
            {"seq_names": ["0001", "0002", "0003"]}))
        out = str(tmp_path / "penn.npz")
        assert main(["--nemo_cfg_path", str(cfg), "--out", out,
                     "--penn_root", str(root)]) == 0
        b = MultiViewBundle.load(out)
        assert b.num_views == 2                  # 0003 skipped
        assert b.num_frames == 11                # min(12,15) - 0 - 1
        assert sorted(b.labels) == ["gt", "op", "vibe"]
        assert b.frame_paths.shape == (2, 11)
        np.testing.assert_allclose(b.framerate_multiplier,
                                   [12 / 11, 15 / 11], rtol=1e-6)

    def test_pack_spin_theta_slot(self, raw_action, tmp_path, rng):
        """--spin_npys packs the V0-warmup SPIN slot; widths 69/72/85 all
        normalize to (V, F, 69) (neural_motion_model.py:3216-3227)."""
        from nemo_tpu.cli.preprocess import main
        from nemo_tpu.data import MultiViewBundle
        cfg, mats = raw_action
        paths = []
        for v, width in enumerate((85, 72)):
            T = 10 + 4 * v
            p = str(tmp_path / f"spin{v}.npy")
            np.save(p, rng.randn(T, width).astype(np.float32))
            paths.append(p)
        out = str(tmp_path / "bundle_spin.npz")
        assert main(["--nemo_cfg_path", cfg, "--out", out,
                     "--penn_mats", ",".join(mats),
                     "--spin_npys", ",".join(paths)]) == 0
        b = MultiViewBundle.load(out)
        assert b.spin_theta.shape == (2, 10, 69)
        # width-85 input: body pose columns 6:75 survive
        src = np.load(paths[0])
        np.testing.assert_allclose(b.spin_theta[0, 0], src[0, 6:75])

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
            "--save_every", "2", "--out_dir", out_dir,
            # reference-surface compat flags (accepted no-ops) + the
            # standalone figure flag (entry :102)
            "--data_loader_type", "generic", "--sequence_ids", "0001,0002",
            "--use_adam", "--render_rollout_figure"])
        assert rc == 0
        run = os.path.join(out_dir, "000000")
        for f in ("config.json", "metrics.jsonl", "losses.npz",
                  "eval_2d.csv", "phases.png", "rollout_figure.png",
                  "comparison_view0.png"):
            assert os.path.exists(os.path.join(run, f)), f


class TestFitCLIDp:
    @pytest.mark.slow
    def test_fit_cli_dp8_on_virtual_mesh(self, raw_action, tmp_path):
        """--dp 8: the PRODUCT fit CLI over the 8-device virtual mesh
        (VERDICT r2 item 3's 'Done' criterion) — the losses must match a
        single-device run at the same seed to tolerance."""
        import json
        from nemo_tpu.cli.preprocess import main as pre_main
        from nemo_tpu.cli.fit import main as fit_main
        cfg, mats = raw_action
        bundle = str(tmp_path / "b.npz")
        pre_main(["--nemo_cfg_path", cfg, "--out", bundle,
                  "--penn_mats", ",".join(mats)])
        flags = [
            "--bundle", bundle, "--synthetic_assets", "--label_type", "gt",
            "--model_version", "1", "--h_dim", "8",
            "--instance_code_size", "0", "--monotonic_network_n_nodes", "3",
            "--batch_size", "8", "--n_steps", "4", "--warmup_step", "2",
            "--opt_cam_step", "2", "--weight_gmm_loss", "0",
            "--save_every", "4"]
        finals = {}
        for tag, extra in (("dp1", []), ("dp8", ["--dp", "8"])):
            out_dir = str(tmp_path / tag)
            assert fit_main(flags + ["--out_dir", out_dir] + extra) == 0
            with open(os.path.join(out_dir, "000000",
                                   "metrics.jsonl")) as f:
                recs = [json.loads(l) for l in f]
            finals[tag] = [r for r in recs if r["phase"] == "final"][-1]
        np.testing.assert_allclose(finals["dp8"]["total_loss"],
                                   finals["dp1"]["total_loss"], rtol=2e-4)


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

    @pytest.mark.slow
    def test_fit_suite_seed_sweep_keeps_best(self, raw_action, tmp_path):
        """--seeds N: one fit per seed (the reference launcher's seed grid,
        custom_video/nemo-run.sh) and a best.txt recording the winner by
        final total loss."""
        from nemo_tpu.cli.fit_suite import main as suite_main
        from nemo_tpu.cli.preprocess import main as pre_main

        cfg, mats = raw_action
        b = str(tmp_path / "act.npz")
        pre_main(["--nemo_cfg_path", cfg, "--out", b,
                  "--penn_mats", ",".join(mats)])
        out_dir = str(tmp_path / "suite_seeds")
        rc = suite_main(["--bundles", b, "--out_dir", out_dir, "--seeds", "2",
                         "--synthetic_assets", "--label_type", "gt",
                         "--model_version", "1", "--h_dim", "8",
                         "--instance_code_size", "0",
                         "--monotonic_network_n_nodes", "3",
                         "--batch_size", "4", "--n_steps", "2",
                         "--warmup_step", "2", "--opt_cam_step", "2",
                         "--weight_gmm_loss", "0", "--save_every", "2"])
        assert rc == 0
        for s in range(2):
            assert os.path.exists(os.path.join(
                out_dir, "act", f"seed{s}", "000000", "metrics.jsonl")), s
        best = open(os.path.join(out_dir, "act", "best.txt")).read().split()
        assert "seed" in best[0] and float(best[1]) < float("inf")


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


class TestVideoToolCLI:
    """The frames/openpose/assemble surface (scripts/video_to_frames.py,
    nemo/run_openpose.py, custom_video/demo.sh pipeline)."""

    def test_print_only_commands_per_view(self, tmp_path, capsys):
        from nemo_tpu.cli.video_tool import main as vt_main
        cfg = tmp_path / "nemo-config.yml"
        cfg.write_text(yaml.safe_dump(
            {"exp_dir": str(tmp_path / "exps"),
             "videos": {"names": ["a.mp4", "b.mp4"],
                        "root_dir": str(tmp_path / "videos")}}))
        assert vt_main(["frames", "--nemo_cfg_path", str(cfg),
                        "--print_only"]) == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 2
        # ffmpeg dump into <exp_dir>/<name>.frames (video_to_frames.py:11-15)
        # with the FULL name kept, matching cli/preprocess.py's dir probing
        assert out[0].startswith("ffmpeg") and "a.mp4" in out[0]
        assert os.path.join("exps", "a.mp4.frames") in out[0]

        assert vt_main(["openpose", "--nemo_cfg_path", str(cfg),
                        "--print_only"]) == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 2
        # BODY_25 JSON invocation (custom_video/demo.sh:55)
        assert "docker" in out[0] and "--write_json" in out[0]
        assert "--number_people_max 1" in out[0]

        assert vt_main(["assemble", "--frame_dir", str(tmp_path / "fr"),
                        "--out", str(tmp_path / "o.mp4"),
                        "--print_only"]) == 0
        out = capsys.readouterr().out.strip()
        assert out.startswith("ffmpeg") and "o.mp4" in out

    def test_reference_extensionless_names(self, tmp_path, capsys):
        """Reference configs list extensionless views ("tennis_swing.0",
        custom_video/nemo-config.yml): the video path gains .mp4
        (video_to_frames_custom.py:37) but frames dirs keep the bare name
        (<name>.frames)."""
        from nemo_tpu.cli.video_tool import main as vt_main
        cfg = tmp_path / "nemo-config.yml"
        cfg.write_text(yaml.safe_dump(
            {"exp_dir": str(tmp_path / "exps"),
             "videos": {"names": ["tennis_swing.0"],
                        "root_dir": str(tmp_path / "videos")}}))
        assert vt_main(["frames", "--nemo_cfg_path", str(cfg),
                        "--print_only"]) == 0
        out = capsys.readouterr().out.strip().splitlines()[0]
        assert os.path.join("videos", "tennis_swing.0.mp4") in out
        assert os.path.join("exps", "tennis_swing.0.frames") in out


class TestDoctor:
    def test_doctor_ready_on_openpose_layout(self, raw_action, capsys):
        """PASS per-view OpenPose, WARN on the optional pieces, exit 0."""
        from nemo_tpu.cli.doctor import main
        cfg, _ = raw_action
        rc = main(["--nemo_cfg_path", cfg])
        out = capsys.readouterr().out
        assert rc == 0 and "READY" in out
        assert out.count("OpenPose") == 2 and "FAIL" not in out
        assert "WARN" in out          # GT/VIBE/frames are absent

    def test_doctor_fails_on_missing_view(self, raw_action, tmp_path,
                                          capsys):
        import yaml
        from nemo_tpu.cli.doctor import main
        cfg_path, _ = raw_action
        with open(cfg_path) as f:
            cfg = yaml.safe_load(f)
        cfg["videos"]["names"].append("ghost.mp4")
        bad = tmp_path / "bad.yml"
        bad.write_text(yaml.safe_dump(cfg))
        rc = main(["--nemo_cfg_path", str(bad)])
        out = capsys.readouterr().out
        assert rc == 1 and "NOT READY" in out and "ghost" in out

    def test_doctor_no_args_prints_help(self, capsys):
        from nemo_tpu.cli.doctor import main
        assert main([]) == 2


class TestDoctorAssets:
    def test_doctor_asset_roundtrip(self, tmp_path, rng, capsys):
        """Write synthetic SMPL (smplx npz layout) + SPIN-format GMM pkl,
        then doctor must PASS both through the real loaders."""
        import pickle
        from nemo_tpu.body import synthetic_smpl_model
        from nemo_tpu.cli.doctor import main

        m = synthetic_smpl_model(num_vertices=200, seed=3)
        V = m.num_vertices
        kintree = np.stack([np.asarray(m.parents),
                            np.arange(len(m.parents))])
        smpl_path = tmp_path / "SMPL_NEUTRAL.npz"
        np.savez(smpl_path,
                 v_template=np.asarray(m.v_template),
                 shapedirs=np.asarray(m.shapedirs),
                 posedirs=np.asarray(m.posedirs).T.reshape(V, 3, 207),
                 J_regressor=np.asarray(m.J_regressor),
                 weights=np.asarray(m.lbs_weights),
                 kintree_table=kintree, f=np.asarray(m.faces))
        A = 0.1 * rng.randn(8, 69, 69)
        covs = np.einsum('mij,mkj->mik', A, A) + 0.5 * np.eye(69)
        gmm_path = tmp_path / "gmm_08.pkl"
        with open(gmm_path, "wb") as f:
            pickle.dump({"means": 0.3 * rng.randn(8, 69),
                         "covars": covs,
                         "weights": rng.dirichlet(np.ones(8))}, f)
        rc = main(["--smpl_path", str(smpl_path),
                   "--gmm_path", str(gmm_path)])
        out = capsys.readouterr().out
        assert rc == 0 and "READY" in out and "FAIL" not in out
        assert "200 verts" in out and "8 components" in out

    def test_doctor_fails_on_malformed_asset(self, tmp_path, capsys):
        from nemo_tpu.cli.doctor import main
        bad = tmp_path / "SMPL_NEUTRAL.npz"
        np.savez(bad, nonsense=np.zeros(3))
        rc = main(["--smpl_path", str(bad)])
        out = capsys.readouterr().out
        assert rc == 1 and "NOT READY" in out


def test_fit_cli_dp8_full_batch(tmp_path):
    """--dp 8 --full_batch combine: the sharded main stage must accept the
    fixed (V x F)-grid steps (custom-entry mode on a mesh)."""
    from nemo_tpu.cli.fit import main as fit_main
    rc = fit_main([
        "--synthetic_assets", "--label_type", "gt",
        "--model_version", "1", "--h_dim", "8",
        "--instance_code_size", "0", "--monotonic_network_n_nodes", "3",
        "--batch_size", "8", "--n_steps", "4", "--warmup_step", "2",
        "--opt_cam_step", "2", "--weight_gmm_loss", "0",
        "--save_every", "4", "--full_batch", "--dp", "8",
        "--out_dir", str(tmp_path)])
    assert rc == 0
