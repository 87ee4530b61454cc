"""AMASS -> HuMoR training-data pipeline: oracle + behavior tests.

Oracle side imports the literal reference script
(humor/humor/scripts/process_amass_data.py) with heavy deps stubbed and
pins the repo's host-side numerics against it; behavior side drives the
full per-sequence pipeline and the window assembly on a synthetic SMPL.
"""

import os
import os.path as osp
import sys
import types

import numpy as np
import pytest

from nemo_tpu.body.assets import synthetic_smpl_model
from nemo_tpu.data.amass_process import (
    ALL_DATASETS, KEYPT_VERTS, SMPL_JOINTS, TRAIN_DATASETS,
    amass_state_windows, amass_world_states, canonicalize_windows,
    cleanup_amass_data, compute_align_from_right, compute_align_mats,
    compute_joint_align_mats, dbscan_1d,
    determine_floor_height_and_contacts, estimate_angular_velocity,
    estimate_velocity, load_amass_windows, np_rodrigues, process_amass_dir,
    process_amass_seq)

HUMOR_ROOT = "/root/reference/humor/humor"
REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref(request):
    """Direct-import the reference processing script with viz/body-model
    deps stubbed; snapshot/restore every sys.modules entry touched."""
    # NOTE: only stub/reference names belong here. Never list real
    # third-party packages (matplotlib, torch): popping the parent package
    # while its submodules stay cached leaves sys.modules half-imported
    # and breaks every later importer in the session.
    touched = ["smplx", "smplx.vertex_ids", "smplx.utils", "body_model",
               "body_model.utils", "body_model.body_model", "utils",
               "utils.torch", "utils.transforms", "utils.logging", "viz",
               "viz.utils", "scripts", "scripts.process_amass_data"]
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
    sys.modules["smplx"], sys.modules["smplx.vertex_ids"] = smplx, vid
    sys.modules["smplx.utils"] = su
    # the script imports viz.utils.viz_smpl_seq (pyrender chain) — stub it
    viz = types.ModuleType("viz")
    viz.__path__ = []
    vutils = types.ModuleType("viz.utils")
    vutils.viz_smpl_seq = lambda *a, **k: None
    viz.utils = vutils
    sys.modules["viz"], sys.modules["viz.utils"] = viz, vutils

    sys.path.insert(0, REF_ROOT)
    sys.path.insert(0, HUMOR_ROOT)
    import scripts.process_amass_data as pad
    sys.path.remove(HUMOR_ROOT)
    sys.path.remove(REF_ROOT)
    return pad


class TestHostNumericsOracle:
    """Pin the host-side numerics against the imported reference script."""

    def test_constants_match(self, ref):
        assert ref.OUT_FPS == 30
        assert ref.TRAIN_DATASETS == TRAIN_DATASETS
        assert ref.ALL_DATASETS == ALL_DATASETS
        from body_model.utils import KEYPT_VERTS as RV
        from body_model.utils import SMPL_JOINTS as RJ
        assert RJ == SMPL_JOINTS
        assert list(RV) == list(KEYPT_VERTS)

    def test_estimate_velocity(self, ref):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((12, 5, 3))
        np.testing.assert_allclose(estimate_velocity(x, 1 / 30.0),
                                   ref.estimate_velocity(x, 1 / 30.0),
                                   rtol=1e-12)

    def test_estimate_angular_velocity(self, ref):
        rng = np.random.default_rng(1)
        aa = rng.standard_normal((10, 4, 3)) * 0.5
        R = np_rodrigues(aa)
        np.testing.assert_allclose(
            estimate_angular_velocity(R, 1 / 60.0),
            ref.estimate_angular_velocity(R, 1 / 60.0), rtol=1e-10)

    def test_rodrigues_matches_reference(self, ref):
        from utils.transforms import batch_rodrigues
        import torch
        rng = np.random.default_rng(2)
        aa = rng.standard_normal((40, 3)) * 1.3
        R_ref = batch_rodrigues(torch.tensor(aa).float()).numpy()
        np.testing.assert_allclose(np_rodrigues(aa), R_ref, atol=2e-6)

    def test_compute_align_from_right(self, ref):
        rng = np.random.default_rng(3)
        br = rng.standard_normal((25, 3))
        br = br / np.linalg.norm(br, axis=1, keepdims=True)
        mat, aa = compute_align_from_right(br.copy())
        mat_r, aa_r = ref.compute_align_from_right(br.copy())
        np.testing.assert_allclose(mat, mat_r, atol=2e-6)
        np.testing.assert_allclose(aa, aa_r, atol=2e-6)

    def test_align_mats_from_orient_and_joints(self, ref):
        rng = np.random.default_rng(4)
        root_orient = rng.standard_normal((15, 3)) * 0.8
        np.testing.assert_allclose(compute_align_mats(root_orient),
                                   ref.compute_align_mats(root_orient),
                                   atol=2e-5)
        joints = rng.standard_normal((15, 22, 3))
        np.testing.assert_allclose(compute_joint_align_mats(joints.copy()),
                                   ref.compute_joint_align_mats(
                                       joints.copy()), atol=2e-6)

    def test_floor_and_contacts_oracle(self, ref):
        """Full floor-height + contact parity on a plausible walk: feet
        alternate stance (static, near floor) and swing phases."""
        T = 90
        rng = np.random.default_rng(5)
        joints = rng.standard_normal((T, 22, 3)) * 0.05
        joints[:, :, 2] += 1.0  # body up at ~1 m
        t = np.arange(T)
        # left foot: stance for even 15-frame blocks (static, z ~ 0.02)
        stance_l = (t // 15) % 2 == 0
        stance_r = ~stance_l
        for idx, stance in ((SMPL_JOINTS['leftToeBase'], stance_l),
                            (SMPL_JOINTS['rightToeBase'], stance_r),
                            (SMPL_JOINTS['leftFoot'], stance_l),
                            (SMPL_JOINTS['rightFoot'], stance_r)):
            base = np.where(stance, 0.02, 0.15 + 0.05 * np.sin(t / 3.0))
            joints[:, idx, 0] = np.where(stance, 0.0, 0.01 * t)
            joints[:, idx, 1] = 0.0
            joints[:, idx, 2] = base
        joints[:, SMPL_JOINTS['hips'], 2] = 0.95
        fh, contacts, discard = determine_floor_height_and_contacts(
            joints.copy(), fps=30)
        fh_r, contacts_r, discard_r = \
            ref.determine_floor_height_and_contacts(joints.copy(), fps=30)
        assert discard == discard_r
        np.testing.assert_allclose(fh, fh_r, atol=1e-9)
        np.testing.assert_array_equal(contacts, contacts_r)
        # sanity: stance toes read as contact, swing toes don't
        assert contacts[2, SMPL_JOINTS['leftToeBase']] == 1
        assert contacts[17, SMPL_JOINTS['leftToeBase']] == 0

    def test_terrain_discard_oracle(self, ref):
        """A long static stretch on a raised platform trips the terrain
        heuristic in both implementations."""
        T = 120
        joints = np.zeros((T, 22, 3))
        joints[:, :, 2] = 1.0
        half = T // 2
        for name in ('leftToeBase', 'rightToeBase', 'leftFoot',
                     'rightFoot'):
            joints[:half, SMPL_JOINTS[name], 2] = 0.02
            joints[half:, SMPL_JOINTS[name], 2] = 0.30  # on a box
        joints[:half, SMPL_JOINTS['hips'], 2] = 0.95
        joints[half:, SMPL_JOINTS['hips'], 2] = 1.25
        fh, _, discard = determine_floor_height_and_contacts(
            joints.copy(), fps=30)
        fh_r, _, discard_r = ref.determine_floor_height_and_contacts(
            joints.copy(), fps=30)
        assert discard and discard_r
        np.testing.assert_allclose(fh, fh_r, atol=1e-9)


class TestDbscan1d:
    def test_matches_sklearn_labels(self):
        sklearn = pytest.importorskip("sklearn.cluster")
        rng = np.random.default_rng(7)
        x = np.concatenate([rng.normal(0.0, 0.001, 40),
                            rng.normal(0.1, 0.001, 25),
                            rng.normal(0.35, 0.001, 5),
                            np.array([0.7])])  # noise point
        rng.shuffle(x)
        mine = dbscan_1d(x, eps=0.005, min_samples=3)
        skl = sklearn.DBSCAN(eps=0.005, min_samples=3).fit(
            x.reshape(-1, 1)).labels_
        # identical partition up to label permutation; noise matches exactly
        np.testing.assert_array_equal(mine == -1, skl == -1)
        fwd, bwd = {}, {}
        for m, s in zip(mine, skl):
            if m == -1:
                continue
            assert fwd.setdefault(m, s) == s  # mine -> skl is a function
            assert bwd.setdefault(s, m) == m  # and injective

    def test_all_noise(self):
        x = np.array([0.0, 1.0, 2.0])
        np.testing.assert_array_equal(dbscan_1d(x, 0.1, 3), [-1, -1, -1])


def _synthetic_raw(T=150, fps=120.0, seed=0):
    """A raw-AMASS-format dict driving a smooth fake motion."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 4 * np.pi, T)[:, None]
    poses = np.zeros((T, 156))
    poses[:, :3] = 0.2 * np.stack(
        [np.sin(t[:, 0]), np.cos(t[:, 0]), 0 * t[:, 0]], 1)
    poses[:, 3:66] = 0.15 * np.sin(t + rng.uniform(0, np.pi, (1, 63)))
    trans = np.stack([0.3 * t[:, 0], 0.1 * np.sin(t[:, 0]),
                      np.zeros(T)], 1)
    return dict(poses=poses, trans=trans,
                betas=rng.standard_normal(16) * 0.3,
                gender=np.array("neutral"), mocap_framerate=fps)


@pytest.fixture(scope="module")
def model():
    return synthetic_smpl_model(num_vertices=400, seed=0)


class TestProcessSeq:
    def test_field_family_and_shapes(self, model):
        raw = _synthetic_raw()
        out = process_amass_seq(raw, model)
        assert out is not None
        # trim to 80% -> 120 frames, minus 2 velocity edges = 118, then
        # downsample 120 -> 30 fps: int(0.25 * 118) = 29
        T = out['trans'].shape[0]
        assert T == int((0.25) * (int(0.9 * 150) - int(0.1 * 150) - 2))
        assert out['fps'] == 30
        assert out['root_orient'].shape == (T, 3)
        assert out['pose_body'].shape == (T, 63)
        assert out['joints'].shape == (T, 22, 3)
        assert out['joints_vel'].shape == (T, 22, 3)
        assert out['trans_vel'].shape == (T, 3)
        assert out['root_orient_vel'].shape == (T, 3)
        assert out['pose_body_vel'].shape == (T, 21, 3)
        assert out['world2aligned_rot'].shape == (T, 3, 3)
        assert out['contacts'].shape == (T, 22)
        nk = len([v for v in KEYPT_VERTS if v < 400])
        assert out['mojo_verts'].shape == (T, nk, 3)
        assert out['joint_orient_vel_seq'].shape == (T,)
        assert np.isfinite(out['joints']).all()
        # world2aligned_rot actually removes heading: aligned body right
        # has zero world-y component
        R = np_rodrigues(out['root_orient'])
        body_right = -R[:, :, 0]
        aligned = np.einsum('tij,tj->ti', out['world2aligned_rot'],
                            body_right)
        np.testing.assert_allclose(aligned[:, 1], 0.0, atol=1e-4)

    def test_too_short_discarded(self, model):
        raw = _synthetic_raw(T=30, fps=120.0)  # 0.25 s
        assert process_amass_seq(raw, model) is None

    def test_velocity_consistency(self, model):
        """trans_vel must be the central difference of pre-downsample
        trans; spot-check via integrating one step at 30 fps scale."""
        raw = _synthetic_raw()
        out = process_amass_seq(raw, model)
        # the raw translation advances linearly in x at a known rate:
        # x = 0.3 * (4*pi/149) * fps per second
        expect_dx = 0.3 * (4 * np.pi / 149) * 120.0
        np.testing.assert_allclose(out['trans_vel'][:, 0], expect_dx,
                                   rtol=1e-3)


class TestDirWalkAndCleanup:
    def test_process_dir_and_skip(self, model, tmp_path):
        root = tmp_path / "raw"
        sub = root / "CMU" / "01"
        sub.mkdir(parents=True)
        np.savez(sub / "01_01_poses.npz", **_synthetic_raw())
        out_root = tmp_path / "proc"
        logs = []
        written = process_amass_dir(str(root), str(out_root), model,
                                    datasets=["CMU"], log_fn=logs.append)
        assert len(written) == 1
        assert "_frames_30_fps.npz" in written[0]
        # second run skips
        written2 = process_amass_dir(str(root), str(out_root), model,
                                     datasets=["CMU"], log_fn=logs.append)
        assert written2 == []
        assert any("already processed" in s for s in logs)

    def test_cleanup_moves_bad_clips(self, tmp_path):
        data = tmp_path / "proc"
        (data / "BioMotionLab_NTroje" / "rub001").mkdir(parents=True)
        (data / "MPI_HDM05" / "dg").mkdir(parents=True)
        keep = data / "BioMotionLab_NTroje" / "rub001" / \
            "rub001_0009_jumping1_poses_100_frames_30_fps.npz"
        tread = data / "BioMotionLab_NTroje" / "rub001" / \
            "rub001_treadmill_fast_poses_100_frames_30_fps.npz"
        skate = data / "MPI_HDM05" / "dg" / \
            "HDM_dg_07-01_01_120_poses_100_frames_30_fps.npz"
        for f in (keep, tread, skate):
            np.savez(f, x=np.zeros(1))
        moved = cleanup_amass_data(str(data), str(tmp_path / "bk"))
        assert str(tread) in moved and str(skate) in moved
        assert keep.exists() and not tread.exists() and not skate.exists()
        assert (tmp_path / "bk" / "BioMotionLab_NTroje" / "rub001" /
                tread.name).exists()


class TestWindows:
    def test_world_state_packing(self, model):
        out = process_amass_seq(_synthetic_raw(), model)
        states = amass_world_states(out)
        T = out['trans'].shape[0]
        assert states.shape == (T, 207)
        np.testing.assert_allclose(states[:, 0:3], out['trans'], rtol=1e-6)
        np.testing.assert_allclose(states[:, 75:78],
                                   out['joints'][:, 0], rtol=1e-6)

    def test_window_slide(self, model):
        out = process_amass_seq(_synthetic_raw(), model)
        w = amass_state_windows(out, num_frames=7, stride=3)
        T = out['trans'].shape[0]
        assert w.shape == ((T - 7) // 3 + 1, 7, 207)
        np.testing.assert_allclose(w[1, 0], amass_world_states(out)[3])

    def test_canonicalize_frame0_properties(self, model):
        out = process_amass_seq(_synthetic_raw(), model)
        w = amass_state_windows(out, num_frames=5, stride=11)
        c = canonicalize_windows(w)
        # frame 0 of every canonical window: trans xy = 0 and heading
        # removed (aligned body right y-component = 0). The root JOINT xy
        # is NOT zero — it sits at -t2j, the world-frame trans->joint
        # offset HuMoR keeps un-rotated (humor_model.py:831-834 /
        # amass_discrete_dataset.py:435): j0_xy - trans0_xy.
        np.testing.assert_allclose(c[:, 0, 0:2], 0.0, atol=1e-5)
        np.testing.assert_allclose(c[:, 0, 75:77],
                                   w[:, 0, 75:77] - w[:, 0, 0:2],
                                   atol=1e-5)
        # Heading removal reproduces the reference's +1e-6 normalization
        # eps (transforms.py:21,28): when body-right is nearly -x (this
        # sequence), |cross(flat, x)| ~ 1e-3 and the eps skews the angle
        # by ~angle*eps/|cross| ~ 1e-3 — a conditioning floor shared with
        # the reference, so the zero here is only approximate.
        R0 = np_rodrigues(c[:, 0, 6:9].astype(np.float64))
        np.testing.assert_allclose((-R0[:, :, 0])[:, 1], 0.0, atol=5e-3)

    def test_canonicalize_heading_invariance(self, model):
        """Rotating the whole world by a heading + shifting xy leaves the
        canonical windows unchanged on every channel EXCEPT the joints
        positions, which pick up the constant (I - Rz) @ t2j offset from
        HuMoR's un-rotated trans->joint convention (the reference behaves
        identically: trans2joint is a world-frame xy constant,
        amass_discrete_dataset.py:435). Asserting the exact residual pins
        that convention."""
        out = process_amass_seq(_synthetic_raw(), model)
        w = amass_state_windows(out, num_frames=4, stride=17)

        def rz(ang):
            return np.array([[np.cos(ang), -np.sin(ang), 0],
                             [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])

        def xf(win, Rz, shift):
            win = win.copy()
            N, T, _ = win.shape
            win[..., 0:3] = (win[..., 0:3] + shift) @ Rz.T
            win[..., 3:6] = win[..., 3:6] @ Rz.T
            R = np_rodrigues(win[..., 6:9].reshape(-1, 3))
            aa = np.matmul(Rz[None], R)
            # rotmat -> aa via the repo's own converter for consistency
            from nemo_tpu.geometry.rotations import rotmat_to_aa
            import jax.numpy as jnp
            win[..., 6:9] = np.asarray(
                rotmat_to_aa(jnp.asarray(aa))).reshape(N, T, 3)
            win[..., 9:12] = win[..., 9:12] @ Rz.T
            J = win[..., 75:141].reshape(N, T, 22, 3)
            win[..., 75:141] = ((J + shift) @ Rz.T).reshape(N, T, 66)
            JV = win[..., 141:207].reshape(N, T, 22, 3)
            win[..., 141:207] = (JV @ Rz.T).reshape(N, T, 66)
            return win

        # t2j = -(j0 - trans0)_xy in the ORIGINAL world frame: the joints
        # channel is only invariant up to the per-window constant
        # (Rz_a - Rz_b) @ t2j picked up from HuMoR's un-rotated
        # trans->joint convention (amass_discrete_dataset.py:435).
        t2j = np.zeros((w.shape[0], 3))
        t2j[:, :2] = -(w[:, 0, 75:77] - w[:, 0, 0:2])

        def check(ca, cb, Rza, Rzb, atol):
            np.testing.assert_allclose(cb[..., :75], ca[..., :75],
                                       atol=atol)
            np.testing.assert_allclose(cb[..., 141:], ca[..., 141:],
                                       atol=atol)
            expect = t2j @ Rza.T - t2j @ Rzb.T  # (N, 3)
            diff = (cb[..., 75:141] - ca[..., 75:141]).reshape(
                w.shape[0], -1, 22, 3)
            np.testing.assert_allclose(
                diff, np.broadcast_to(expect[:, None, None, :],
                                      diff.shape), atol=atol)

        Rz1, Rz2 = rz(0.9), rz(2.0)
        c1 = canonicalize_windows(
            xf(w, Rz1, np.array([2.0, -3.0, 0.0], np.float32)))
        c2 = canonicalize_windows(
            xf(w, Rz2, np.array([-1.0, 5.0, 0.0], np.float32)))
        # Both rotated worlds have well-conditioned headings (body-right
        # far from ±x), so the invariance holds tightly between them.
        check(c1, c2, Rz1, Rz2, atol=3e-4)
        # vs the ORIGINAL world the heading removal is ill-conditioned
        # (body-right ~ -x: the reference's +1e-6 eps on |cross(flat, x)|
        # ~ 1e-3 skews the angle by ~2e-3, transforms.py:21,28), and the
        # angle error scales with the rotated vectors' xy magnitude
        # (joints_vel here reaches ~4 at 30 fps scale), so this pair only
        # matches at the shared conditioning floor.
        c0 = canonicalize_windows(w)
        check(c0, c1, np.eye(3), Rz1, atol=2e-2)

    def test_load_amass_windows_tree(self, model, tmp_path):
        root = tmp_path / "raw"
        (root / "CMU" / "01").mkdir(parents=True)
        np.savez(root / "CMU" / "01" / "a_poses.npz", **_synthetic_raw())
        proc = tmp_path / "proc"
        process_amass_dir(str(root), str(proc), model, datasets=["CMU"],
                          log_fn=lambda s: None)
        w = load_amass_windows(str(proc), num_frames=6, split="train",
                               stride=5, max_windows=3)
        assert w.shape == (3, 6, 207)
        assert np.isfinite(w).all()
        # val split has no datasets in this tree
        w2 = load_amass_windows(str(proc), num_frames=6, split="val")
        assert w2.shape[0] == 0


class TestHumorToolAmass:
    def test_train_on_amass_windows(self, model, tmp_path, capsys):
        root = tmp_path / "raw"
        (root / "CMU" / "01").mkdir(parents=True)
        np.savez(root / "CMU" / "01" / "a_poses.npz", **_synthetic_raw())
        proc = tmp_path / "proc"
        process_amass_dir(str(root), str(proc), model, datasets=["CMU"],
                          log_fn=lambda s: None)
        from nemo_tpu.cli.humor_tool import main
        out = tmp_path / "run"
        rc = main(["train", "--amass", str(proc), "--amass_stride", "4",
                   "--amass_max_windows", "8", "--seq_len", "3",
                   "--epochs", "1", "--batch_size", "4",
                   "--out", str(out)])
        assert rc == 0
        assert osp.exists(str(out / "train_stats.jsonl"))


class TestFitObservations:
    """amass_fit_observations — the AMASSFitDataset.__getitem__ surface
    (amass_fit_dataset.py:70-155)."""

    @pytest.fixture(scope="class")
    def seq(self, model):
        out = process_amass_seq(_synthetic_raw(), model)
        assert out is not None
        return out

    def test_clean_observations_match_gt(self, seq, model):
        from nemo_tpu.data.amass_process import amass_fit_observations
        obs, gt = amass_fit_observations(seq, model, seq_len=10,
                                         return_points=True,
                                         num_samp_pts=64)
        assert obs["joints3d"].shape == (10, 22, 3)
        np.testing.assert_allclose(obs["joints3d"], gt["joints"])
        np.testing.assert_allclose(obs["verts3d"], gt["verts"])
        assert obs["points3d"].shape == (10, 64, 3)
        # surface samples live inside the (slightly padded) mesh bbox
        lo = gt["points"].min((1,)) - 1e-4
        hi = gt["points"].max((1,)) + 1e-4
        assert (obs["points3d"] >= lo[:, None]).all()
        assert (obs["points3d"] <= hi[:, None]).all()

    def test_root_only_masks_all_but_kept(self, seq, model):
        from nemo_tpu.data.amass_process import (ROOT_ONLY_KEPT_JOINTS,
                                                 amass_fit_observations)
        obs, _ = amass_fit_observations(seq, model, seq_len=8,
                                        root_only=True, return_verts=False)
        j = obs["joints3d"]
        kept = np.isfinite(j).all(-1).all(0)
        assert set(np.where(kept)[0]) == set(ROOT_ONLY_KEPT_JOINTS)

    def test_partial_occlusion_and_resample(self, seq, model):
        from nemo_tpu.data.amass_process import amass_fit_observations
        obs, gt = amass_fit_observations(
            seq, model, seq_len=6, return_points=True, num_samp_pts=32,
            make_partial=True, partial_height=float(
                np.median(gt0 := np.asarray(seq["joints"])[:6, :, 2])))
        # joints below the height threshold are occluded (inf)
        below = gt["joints"][:, :, 2] < np.median(gt0)
        assert not np.isfinite(obs["joints3d"][below]).any()
        # points are re-sampled back to the fixed budget, all finite
        assert obs["points3d"].shape == (6, 32, 3)
        assert np.isfinite(obs["points3d"]).all()

    def test_drop_middle_and_noise_determinism(self, seq, model):
        from nemo_tpu.data.amass_process import amass_fit_observations
        obs, _ = amass_fit_observations(seq, model, seq_len=9,
                                        drop_middle=True, noise_std=0.01,
                                        seed=7)
        obs2, _ = amass_fit_observations(seq, model, seq_len=9,
                                         drop_middle=True, noise_std=0.01,
                                         seed=7)
        sidx = 9 // 3
        assert not np.isfinite(obs["joints3d"][sidx:2 * sidx]).any()
        assert np.isfinite(obs["joints3d"][:sidx]).all()
        np.testing.assert_array_equal(obs["joints3d"], obs2["joints3d"])

    def test_surface_sampling_area_weighted(self, model):
        from nemo_tpu.data.amass_process import sample_surface_points
        # two triangles, one with 99x the area: samples should mostly land
        # in the big one (x>=1 half-plane separates them)
        verts = np.array([[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0],
                          [1, 0, 0], [2, 0, 0], [1, 1, 0]], float)
        faces = np.array([[0, 1, 2], [3, 4, 5]])
        pts = sample_surface_points(verts, faces, 500,
                                    np.random.default_rng(0))
        frac_big = (pts[:, 0] >= 0.5).mean()
        assert frac_big > 0.9
        assert np.allclose(pts[:, 2], 0.0)
