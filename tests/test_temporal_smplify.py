"""TemporalSMPLify: direct-import oracles + functional + e2e CLI tests.

The temporal loss math is pinned against the reference's OWN
VIBE/lib/smplify/losses.py (imported with its heavy model deps stubbed —
the stub perspective_projection is the reference's hmr/geometry.py
implementation, itself oracle-tested in test_reference_import_oracle.py,
and JOINT_IDS comes from the reference's kp_utils.get_spin_joint_names).
The GMM prior oracle is the reference MaxMixturePrior on a synthetic
SPIN-format pkl, as in the GMM oracle test.
"""

from __future__ import annotations

import importlib.util
import os
import pickle
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_losses():
    """Import VIBE/lib/smplify/losses.py + MaxMixturePrior as oracles."""
    if "ipdb" not in sys.modules:
        stub = types.ModuleType("ipdb")
        stub.set_trace = lambda *a, **k: None
        sys.modules["ipdb"] = stub

    spec = importlib.util.spec_from_file_location(
        "_oracle_hmr_geometry", os.path.join(REFERENCE, "hmr/geometry.py"))
    geometry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(geometry)

    # JOINT_NAMES as lib/models/smpl.py spells them ('Right Hip', ...;
    # same indices as kp_utils.get_spin_joint_names) — extracted from the
    # reference source via ast so the heavy smplx import never runs
    import ast
    with open(os.path.join(REFERENCE, "VIBE/lib/models/smpl.py")) as f:
        tree = ast.parse(f.read())
    names = None
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign) and
                any(getattr(t, "id", "") == "JOINT_NAMES"
                    for t in node.targets)):
            names = ast.literal_eval(node.value)
    assert names and len(names) == 49

    vibe_root = os.path.join(REFERENCE, "VIBE")
    sys.path.insert(0, vibe_root)
    sys.path.insert(0, REFERENCE)
    added = {}
    try:
        spin_stub = types.ModuleType("lib.models.spin")
        spin_stub.perspective_projection = geometry.perspective_projection
        smpl_stub = types.ModuleType("lib.models.smpl")
        smpl_stub.JOINT_IDS = {n: i for i, n in enumerate(names)}
        for k, v in (("lib.models.spin", spin_stub),
                     ("lib.models.smpl", smpl_stub)):
            added[k] = sys.modules.get(k)
            sys.modules[k] = v
        import lib.smplify.losses as losses
        import hmr.smplify.prior as prior
    finally:
        sys.path.remove(vibe_root)
        sys.path.remove(REFERENCE)
        for k, old in added.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
    return types.SimpleNamespace(losses=losses, prior=prior,
                                 joint_ids=smpl_stub.JOINT_IDS)


def _t(a):
    return torch.as_tensor(np.asarray(a), dtype=torch.float32)


def _close(ours, theirs, atol, rtol=0.0, what=""):
    theirs = np.asarray(theirs.detach().numpy() if torch.is_tensor(theirs)
                        else theirs, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(ours, np.float64), theirs,
                               atol=atol, rtol=rtol, err_msg=what)


def _random_inputs(rng, B=6, J=49):
    mj = rng.randn(B, J, 3).astype(np.float32) * 0.4
    mj[..., 2] += 5.0
    cam_t = rng.randn(B, 3).astype(np.float32) * 0.1 + [0, 0, 5]
    cam_est = cam_t + rng.randn(B, 3).astype(np.float32) * 0.05
    j2d = (rng.randn(B, J, 2) * 40 + 112).astype(np.float32)
    conf = rng.rand(B, J).astype(np.float32)
    center = np.full((B, 2), 112.0, np.float32)
    return mj, cam_t, cam_est, j2d, conf, center


class TestTemporalLossOracles:
    def test_camera_loss(self, ref_losses, rng):
        from nemo_tpu.priors import temporal_camera_fitting_loss
        mj, cam_t, cam_est, j2d, conf, center = _random_inputs(rng)
        want = ref_losses.losses.temporal_camera_fitting_loss(
            _t(mj), _t(cam_t), _t(cam_est), _t(center), _t(j2d), _t(conf))
        ours = temporal_camera_fitting_loss(
            jnp.asarray(mj), jnp.asarray(cam_t), jnp.asarray(cam_est),
            jnp.asarray(center), jnp.asarray(j2d), jnp.asarray(conf))
        _close(ours, want, atol=0.0, rtol=1e-5, what="temporal camera loss")

    def test_camera_loss_invalid_torso_drops_frame(self, ref_losses, rng):
        """Zero confidence on any torso joint zeroes that frame's
        reprojection term (losses.py:191-194) — only depth remains."""
        from nemo_tpu.priors import temporal_camera_fitting_loss
        mj, cam_t, cam_est, j2d, conf, center = _random_inputs(rng)
        torso = [ref_losses.joint_ids[j] for j in
                 ("OP RHip", "OP LHip", "OP RShoulder", "OP LShoulder")]
        conf[2, torso[0]] = 0.0
        conf[4, torso] = 0.0
        want = ref_losses.losses.temporal_camera_fitting_loss(
            _t(mj), _t(cam_t), _t(cam_est), _t(center), _t(j2d), _t(conf))
        ours = temporal_camera_fitting_loss(
            jnp.asarray(mj), jnp.asarray(cam_t), jnp.asarray(cam_est),
            jnp.asarray(center), jnp.asarray(j2d), jnp.asarray(conf))
        _close(ours, want, atol=0.0, rtol=1e-5,
               what="camera loss with invalid torso")

    @pytest.fixture()
    def gmm_pair(self, ref_losses, rng, tmp_path):
        from nemo_tpu.priors import load_gmm_prior
        M, D = 8, 69
        A = 0.05 * rng.randn(M, D, D)
        covs = np.einsum("mij,mkj->mik", A, A) + 0.4 * np.eye(D)
        pkl = tmp_path / "gmm_08.pkl"
        with open(pkl, "wb") as f:
            pickle.dump({"means": 0.3 * rng.randn(M, D), "covars": covs,
                         "weights": rng.dirichlet(np.ones(M))}, f)
        oracle = ref_losses.prior.MaxMixturePrior(
            prior_folder=str(tmp_path), num_gaussians=M, use_merged=True)
        return oracle, load_gmm_prior(str(pkl))

    @pytest.mark.parametrize("output", ["sum", "reprojection"])
    def test_body_loss(self, ref_losses, gmm_pair, rng, output):
        from nemo_tpu.priors import temporal_body_fitting_loss
        oracle_prior, repo_prior = gmm_pair
        mj, cam_t, _, j2d, conf, center = _random_inputs(rng)
        B = mj.shape[0]
        body_pose = (0.3 * rng.randn(B, 69)).astype(np.float32)
        betas = (0.5 * rng.randn(1, 10)).astype(np.float32)
        want = ref_losses.losses.temporal_body_fitting_loss(
            _t(body_pose), _t(betas), _t(mj), _t(cam_t), _t(center),
            _t(j2d), _t(conf), oracle_prior, output=output)
        ours = temporal_body_fitting_loss(
            jnp.asarray(body_pose), jnp.asarray(betas), jnp.asarray(mj),
            jnp.asarray(cam_t), jnp.asarray(center), jnp.asarray(j2d),
            jnp.asarray(conf), repo_prior, output=output)
        _close(ours, want, atol=1e-2, rtol=1e-5,
               what=f"temporal body loss ({output})")

    def test_ign_joints_match_reference(self, ref_losses):
        """IGN_JOINTS indices (temporal_smplify.py:44-45) resolve through
        the reference's own JOINT_IDS."""
        from nemo_tpu.priors.temporal_smplify import IGN_JOINTS
        names = ("OP Neck", "OP RHip", "OP LHip", "Right Hip", "Left Hip")
        assert IGN_JOINTS == [ref_losses.joint_ids[n] for n in names]


class TestTemporalSmplifyFit:
    def test_runner_improves_and_accepts(self, rng):
        """Perturbed init vs GT-projected keypoints: the fit must reduce
        the per-frame reprojection loss on most frames and the accept mask
        must reflect it (demo_utils.py:131-138)."""
        import jax
        from nemo_tpu.body import synthetic_smpl_model
        from nemo_tpu.body.smpl import smpl_forward
        from nemo_tpu.geometry.camera import perspective_projection
        from nemo_tpu.geometry.rotations import batch_rodrigues
        from nemo_tpu.priors import run_temporal_smplify, \
            synthetic_gmm_prior

        smpl = synthetic_smpl_model(num_vertices=150, seed=0)
        gmm = synthetic_gmm_prior()
        B = 5
        gt_pose = (0.12 * rng.randn(B, 72)).astype(np.float32)
        gt_betas10 = (0.3 * rng.randn(10)).astype(np.float32)
        gt_betas = np.tile(gt_betas10, (B, 1))
        cam_t = np.tile(np.array([0.05, 0.1, 8.0], np.float32), (B, 1))
        rot = batch_rodrigues(jnp.asarray(gt_pose).reshape(-1, 24, 3))
        _, gt_j = smpl_forward(smpl, jnp.asarray(gt_betas10)[None],
                               rot[:, 1:], rot[:, :1],
                               want_vertices=False)
        eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        center = jnp.full((B, 2), 112.0)
        proj = perspective_projection(gt_j, eye, jnp.asarray(cam_t),
                                      5000.0, center)
        j2d = np.concatenate([np.asarray(proj),
                              np.ones((B, 49, 1), np.float32)], -1)

        init_pose = gt_pose + 0.08 * rng.randn(B, 72).astype(np.float32)
        init_betas = gt_betas + 0.2 * rng.randn(B, 10).astype(np.float32)
        weak = np.stack([2 * 5000.0 / (224.0 * cam_t[:, 2]),
                         cam_t[:, 0], cam_t[:, 1]], -1).astype(np.float32)

        out, update = run_temporal_smplify(
            smpl, gmm, jnp.asarray(init_pose), jnp.asarray(init_betas),
            jnp.asarray(weak), jnp.asarray(j2d), opt_steps=1, max_iter=6)

        assert out["pose"].shape == (B, 72)
        assert out["betas"].shape == (10,)
        assert out["weak_cam"].shape == (B, 3)
        assert out["verts"].shape == (B, 150, 3)
        assert update.shape == (B,) and update.dtype == jnp.bool_
        assert float(out["new_loss"].mean()) < float(
            out["pre_loss"].mean())
        imp = np.asarray(out["new_loss"] < out["pre_loss"])
        np.testing.assert_array_equal(np.asarray(update), imp)
        assert imp.mean() >= 0.6

    def test_weak_cam_roundtrip(self, rng):
        """weak -> full -> weak camera conversion is the identity
        (demo_utils.py:118-122 vs temporal_smplify.py:201-205)."""
        from nemo_tpu.priors.temporal_smplify import run_temporal_smplify
        s = 0.5 + rng.rand(7).astype(np.float32)
        tz = 2 * 5000.0 / (224.0 * s + 1e-9)
        back = 2 * 5000.0 / (224.0 * tz + 1e-9)
        np.testing.assert_allclose(back, s, rtol=1e-5)


@pytest.mark.slow
def test_vibe_demo_run_smplify_to_vs_eval_csv(tmp_path, rng):
    """frames -> vibe_demo --run_smplify -> preprocess --vs_pkls -> fit:
    the eval CSV must carry the VIBE+SMPLify baseline columns
    (recon_error_2d-vs / pck-vs; neural_motion_model.py:677-707)."""
    import csv
    import json

    import joblib
    import yaml
    from scipy.io import savemat

    from nemo_tpu.cli.fit import main as fit_main
    from nemo_tpu.cli.preprocess import main as pre_main
    from nemo_tpu.cli.vibe_demo import main as demo_main
    from nemo_tpu.render.video import _write_png

    # --- synthetic frames + OpenPose keypoints for one moving person ---
    T, H, W = 8, 64, 64
    frames_dir = tmp_path / "vid0.mp4.frames"
    op_dir = tmp_path / "vid0.mp4.frames.op"
    frames_dir.mkdir()
    op_dir.mkdir()
    for f in range(T):
        img = rng.rand(H, W, 3).astype(np.float32) * 0.2
        x0 = 12 + f
        img[18:50, x0:x0 + 24] = 0.8
        _write_png(str(frames_dir / f"{f:06d}.png"), img)
        kp = np.zeros((25, 3), np.float32)
        kp[:, 0] = x0 + 24 * rng.rand(25)
        kp[:, 1] = 18 + 32 * rng.rand(25)
        kp[:, 2] = 0.9
        with open(op_dir / f"{f:06d}_keypoints.json", "w") as fh:
            json.dump({"people": [
                {"pose_keypoints_2d": kp.ravel().tolist()}]}, fh)

    # --- tiny real-loader SMPL npz + SPIN-format GMM pkl ---
    from nemo_tpu.body import synthetic_smpl_model
    m = synthetic_smpl_model(num_vertices=150, seed=3)
    V = m.num_vertices
    smpl_path = tmp_path / "SMPL_NEUTRAL.npz"
    np.savez(smpl_path, v_template=np.asarray(m.v_template),
             shapedirs=np.asarray(m.shapedirs),
             posedirs=np.asarray(m.posedirs).T.reshape(V, 3, 207),
             J_regressor=np.asarray(m.J_regressor),
             weights=np.asarray(m.lbs_weights),
             kintree_table=np.stack([np.asarray(m.parents),
                                     np.arange(len(m.parents))]),
             f=np.asarray(m.faces))
    A = 0.1 * rng.randn(8, 69, 69)
    gmm_path = tmp_path / "gmm_08.pkl"
    with open(gmm_path, "wb") as f:
        pickle.dump({"means": 0.3 * rng.randn(8, 69),
                     "covars": np.einsum("mij,mkj->mik", A, A)
                     + 0.5 * np.eye(69),
                     "weights": rng.dirichlet(np.ones(8))}, f)

    # --- vibe_demo --run_smplify (random weights, smoke mode) ---
    vs_pkl = tmp_path / "vs_output.pkl"
    rc = demo_main(["--frames_dir", str(frames_dir),
                    "--openpose_dir", str(op_dir),
                    "--out", str(vs_pkl), "--min_track_len", "6",
                    "--out_res", "64", "--run_smplify",
                    "--smplify_max_iter", "2",
                    "--smpl_path", str(smpl_path),
                    "--gmm_path", str(gmm_path)])
    assert rc == 0
    refined = joblib.load(vs_pkl)
    assert refined
    person = refined[sorted(refined.keys())[-1]]
    assert "smplify_update" in person
    assert person["pose"].shape == (T, 72)

    # --- preprocess with the refined pkl in the vs baseline slot ---
    mats = []
    for v in range(2):
        d = tmp_path / "data" / f"vid{v}.mp4.frames.op"
        d.mkdir(parents=True)
        Tv = 10 + 4 * v
        for f in range(Tv):
            kp = np.zeros((25, 3), np.float32)
            kp[:, 0] = 100 + 50 * rng.rand(25)
            kp[:, 1] = 80 + 90 * rng.rand(25)
            kp[:, 2] = 0.9
            with open(d / f"{f:06d}_keypoints.json", "w") as fh:
                json.dump({"people": [
                    {"pose_keypoints_2d": kp.ravel().tolist()}]}, fh)
        mat = tmp_path / f"penn{v}.mat"
        savemat(str(mat), {"x": rng.rand(Tv, 13) * 100,
                           "y": rng.rand(Tv, 13) * 100,
                           "visibility": np.ones((Tv, 13))})
        mats.append(str(mat))
    cfg = tmp_path / "action.yml"
    cfg.write_text(yaml.safe_dump(
        {"exp_dir": str(tmp_path / "data"),
         "videos": {"names": ["vid0.mp4", "vid1.mp4"]}}))
    bundle = str(tmp_path / "b.npz")
    assert pre_main(["--nemo_cfg_path", str(cfg), "--out", bundle,
                     "--penn_mats", ",".join(mats),
                     "--vs_pkls", f"{vs_pkl},{vs_pkl}"]) == 0

    out_dir = str(tmp_path / "out")
    assert fit_main([
        "--bundle", bundle, "--synthetic_assets", "--label_type", "gt",
        "--model_version", "1", "--h_dim", "8",
        "--instance_code_size", "0", "--monotonic_network_n_nodes", "3",
        "--batch_size", "4", "--n_steps", "2", "--warmup_step", "2",
        "--opt_cam_step", "2", "--weight_gmm_loss", "0",
        "--save_every", "2", "--out_dir", out_dir]) == 0
    csv_path = os.path.join(out_dir, "000000", "eval_2d.csv")
    with open(csv_path) as f:
        header = next(csv.reader(f))
    assert any(c.startswith("recon_error_2d-vs") for c in header), header
    assert any(c.startswith("pck-vs") for c in header), header
