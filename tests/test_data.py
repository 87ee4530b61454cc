"""Data layer tests: bundles, synthetic problems, ingestion adapters."""

import json
import os

import numpy as np
import pytest

from nemo_tpu.body import synthetic_smpl_model
from nemo_tpu.data import (
    MultiViewBundle, densify_person, load_openpose_dir, monotone_warp,
    parse_openpose_json, penn_gt_to_op, resample_to_common_frames,
    select_person_near_gt, smooth_motion, synthetic_problem, vibe_to_theta,
)


@pytest.fixture(scope="module")
def tiny_model():
    return synthetic_smpl_model(num_vertices=300, seed=1)


class TestBundle:
    def test_save_load_roundtrip(self, tmp_path, tiny_model):
        bundle, _ = synthetic_problem(tiny_model, num_views=2, num_frames=8)
        p = str(tmp_path / "b.npz")
        bundle.save(p)
        loaded = MultiViewBundle.load(p)
        assert loaded.num_views == 2
        assert loaded.num_frames == 8
        np.testing.assert_allclose(loaded.labels["gt"], bundle.labels["gt"])
        np.testing.assert_allclose(loaded.hmr_theta, bundle.hmr_theta)
        np.testing.assert_allclose(loaded.gt_cameras, bundle.gt_cameras)

    def test_bbox_diag_positive(self, tiny_model):
        bundle, _ = synthetic_problem(tiny_model, num_views=2, num_frames=8)
        d = bundle.bbox_diag("gt")
        assert d.shape == (2, 8)
        assert (d > 0).all()

    def test_intersection_label(self, tiny_model):
        bundle, _ = synthetic_problem(tiny_model, num_views=2, num_frames=4)
        inter = bundle.label("intersection")
        # op == gt in the synthetic bundle, so intersection keeps everything
        np.testing.assert_allclose(inter[..., :2], bundle.labels["gt"][..., :2])
        np.testing.assert_allclose(inter[..., 2], bundle.labels["gt"][..., 2])

    def test_resample(self):
        arrs = [np.arange(10)[:, None], np.arange(20)[:, None]]
        out = resample_to_common_frames(arrs, 5)
        assert out.shape == (2, 5, 1)
        assert out[0, 0, 0] == 0 and out[0, -1, 0] == 9
        assert out[1, -1, 0] == 19


class TestSynthetic:
    def test_motion_smooth_and_anchored(self):
        pose, trans = smooth_motion(50, seed=0)
        assert pose.shape == (50, 24, 3)
        np.testing.assert_allclose(trans[0], 0.0, atol=1e-6)
        # smooth: consecutive frame deltas are small
        assert np.abs(np.diff(pose, axis=0)).max() < 0.5

    def test_warp_monotone(self):
        p = np.linspace(0, 1, 100)
        w = monotone_warp(p, strength=0.8, seed=3)
        assert (np.diff(w) >= -1e-9).all()
        assert abs(w[0]) < 1e-6 and abs(w[-1] - 1) < 1e-6

    def test_problem_projections_in_image(self, tiny_model):
        bundle, truth = synthetic_problem(tiny_model, num_views=3,
                                          num_frames=10)
        pts = bundle.labels["gt"][..., :2]
        # most keypoints should land within a sane region around the image
        d0, d1 = bundle.img_hw
        frac_in = ((pts[..., 0] > -d1) & (pts[..., 0] < 2 * d1) &
                   (pts[..., 1] > -d0) & (pts[..., 1] < 2 * d0)).mean()
        assert frac_in > 0.9


class TestOpenPose:
    def test_parse_and_dir(self, tmp_path):
        kp = np.random.rand(25, 3).astype(np.float32)
        rec = {"people": [{"pose_keypoints_2d": kp.ravel().tolist()}]}
        for i, content in enumerate([rec, {"people": []}]):
            with open(tmp_path / f"{i:06d}_keypoints.json", "w") as f:
                json.dump(content, f)
        out = load_openpose_dir(str(tmp_path))
        assert out.shape == (2, 25, 3)
        np.testing.assert_allclose(out[0], kp, atol=1e-6)
        np.testing.assert_allclose(out[1], 0.0)  # empty frame -> zeros


class TestVibe:
    def test_densify_and_select(self):
        person = {
            "pose": np.ones((3, 72), np.float32),
            "betas": np.zeros(10, np.float32),
            "frame_ids": np.array([0, 2, 4]),
            "joints2d_img_coord": np.full((3, 25, 2), 5.0, np.float32),
        }
        dense = densify_person(person, 6)
        assert dense["pose"].shape == (6, 72)
        np.testing.assert_allclose(dense["mask"], [1, 0, 1, 0, 1, 0])
        theta = vibe_to_theta(dense)
        assert theta.shape == (6, 70)
        np.testing.assert_allclose(theta[:, -1], dense["mask"])

        far = dict(person)
        far["joints2d_img_coord"] = np.full((3, 25, 2), 500.0, np.float32)
        people = {0: densify_person(far, 6), 1: dense}
        gt = np.full((6, 25, 3), 5.0, np.float32)
        chosen = select_person_near_gt(people, gt)
        np.testing.assert_allclose(chosen["joints2d_img_coord"][0, 0],
                                   [5.0, 5.0])


class TestPennAction:
    def test_lr_swap(self):
        T = 2
        labels = {
            "x": np.tile(np.arange(13, dtype=np.float32), (T, 1)),
            "y": np.zeros((T, 13), np.float32),
            "visibility": np.ones((T, 13), np.float32),
        }
        out = penn_gt_to_op(labels)
        assert out.shape == (T, 25, 3)
        # Penn 'left_shoulder' (index 1) must land in OP RShoulder (index 2)
        assert out[0, 2, 0] == 1.0
        # Penn 'right_shoulder' (index 2) -> OP LShoulder (index 5)
        assert out[0, 5, 0] == 2.0
        # head -> OP Nose (index 0)
        assert out[0, 0, 0] == 0.0 and out[0, 0, 2] == 1.0
        # unmapped OP joints stay zero-confidence
        assert out[0, 8, 2] == 0.0  # OP MidHip has no Penn source


class TestShardedDataset:
    def _write(self, tmp_path, n=100, shard_size=16):
        from nemo_tpu.data import write_shards
        rng = np.random.RandomState(0)
        arrays = {"pose": rng.randn(n, 63).astype(np.float32),
                  "idx": np.arange(n, dtype=np.int64)}
        num = write_shards(arrays, str(tmp_path / "ds"), shard_size)
        return arrays, num

    def test_roundtrip_and_index(self, tmp_path):
        from nemo_tpu.data import ShardedDataset
        arrays, num = self._write(tmp_path)
        assert num == 7  # ceil(100/16)
        ds = ShardedDataset(str(tmp_path / "ds"))
        assert len(ds) == 100 and ds.num_shards == 7
        got = np.concatenate([ds.load_shard(i)["idx"] for i in range(7)])
        np.testing.assert_array_equal(got, arrays["idx"])

    def test_batch_iterator_covers_epoch(self, tmp_path):
        from nemo_tpu.data import ShardedDataset, batch_iterator
        arrays, _ = self._write(tmp_path)
        ds = ShardedDataset(str(tmp_path / "ds"))
        batches = list(batch_iterator(ds, batch_size=8, seed=1, epochs=1))
        # 100 rows -> 12 full batches of 8 (4 dropped at epoch end)
        assert len(batches) == 12
        seen = np.concatenate([b["idx"] for b in batches])
        assert len(np.unique(seen)) == 96          # no duplicates
        assert batches[0]["pose"].shape == (8, 63)
        # rows stay aligned across keys after the two-level shuffle
        for b in batches:
            np.testing.assert_allclose(b["pose"],
                                       arrays["pose"][b["idx"]])

    def test_deterministic_given_seed(self, tmp_path):
        from nemo_tpu.data import ShardedDataset, batch_iterator
        self._write(tmp_path)
        ds = ShardedDataset(str(tmp_path / "ds"))
        a = [b["idx"] for b in batch_iterator(ds, 8, seed=3, epochs=1)]
        b = [b["idx"] for b in batch_iterator(ds, 8, seed=3, epochs=1)]
        c = [b["idx"] for b in batch_iterator(ds, 8, seed=4, epochs=1)]
        np.testing.assert_array_equal(np.stack(a), np.stack(b))
        assert not np.array_equal(np.stack(a), np.stack(c))

    def test_dp_placement_on_mesh(self, tmp_path):
        from nemo_tpu.data import (ShardedDataset, as_sharded_arrays,
                                   batch_iterator)
        from nemo_tpu.parallel import make_mesh
        self._write(tmp_path)
        ds = ShardedDataset(str(tmp_path / "ds"))
        mesh = make_mesh(8)
        it = as_sharded_arrays(batch_iterator(ds, 16, epochs=1), mesh)
        batch = next(it)
        assert batch["pose"].shape == (16, 63)
        assert len(batch["pose"].sharding.device_set) == 8

    def test_trains_vposer_from_shards(self, tmp_path):
        """End-to-end: sharded AMASS-style poses -> VPoser train steps."""
        import jax
        import jax.numpy as jnp
        from nemo_tpu.data import ShardedDataset, batch_iterator, write_shards
        from nemo_tpu.priors import init_vposer
        from nemo_tpu.priors.vposer_train import (VPoserTrainConfig,
                                                  make_vposer_train_step)
        import optax
        rng = np.random.RandomState(0)
        write_shards({"pose": 0.3 * rng.randn(64, 63).astype(np.float32)},
                     str(tmp_path / "amass"), shard_size=32)
        ds = ShardedDataset(str(tmp_path / "amass"))
        params = init_vposer(jax.random.PRNGKey(0))
        cfg = VPoserTrainConfig()
        opt, step = make_vposer_train_step(cfg)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(1)
        losses = []
        for batch in batch_iterator(ds, 16, epochs=1):
            key, k = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state,
                                              jnp.asarray(batch["pose"]), k)
            losses.append(float(metrics["loss_total"]))
        assert len(losses) == 4
        assert all(np.isfinite(l) for l in losses)


class TestVibeDb:
    """VIBE training-db schema layer (data/vibe_db.py; reference
    VIBE/lib/data_utils/*_utils.py emit this dict-of-arrays format)."""

    def _tiny_db(self, rng):
        from nemo_tpu.data import VibeDbBuilder
        b = VibeDbBuilder()
        for vid, F in (("a_0", 40), ("b_0", 21)):
            b.add_sequence(
                vid, np.arange(F),
                joints2d=rng.rand(F, 49, 3).astype(np.float32),
                pose=rng.randn(F, 72).astype(np.float32),
                shape=rng.randn(10).astype(np.float32),
                bbox=np.abs(rng.randn(F, 4)).astype(np.float32),
                features=rng.randn(F, 2048).astype(np.float32))
        return b

    def test_builder_schema(self, rng):
        db = self._tiny_db(rng).build()
        assert db["pose"].shape == (61, 72)
        assert db["joints2D"].shape == (61, 49, 3)
        assert db["features"].shape == (61, 2048)
        assert db["valid"].shape == (61,)
        assert (db["vid_name"][:40] == "a_0").all()
        # zero-filled optional columns exist with the right shapes
        assert db["joints3D"].shape == (61, 49, 3)
        np.testing.assert_allclose(db["joints3D"], 0.0)

    def test_shape_validation(self, rng):
        from nemo_tpu.data import VibeDbBuilder
        b = VibeDbBuilder()
        with np.testing.assert_raises(ValueError):
            b.add_sequence("v", np.arange(3),
                           joints2d=rng.rand(3, 25, 3).astype(np.float32))

    def test_make_windows_respects_video_boundaries(self, rng):
        from nemo_tpu.data import make_windows
        db = self._tiny_db(rng).build()
        win = make_windows(db["vid_name"], seqlen=16)
        # 40 frames -> 2 windows; 21 frames -> 1 window; none crossing
        assert win.shape == (3, 16)
        for w in win:
            assert len(np.unique(db["vid_name"][w])) == 1
            assert (np.diff(w) == 1).all()

    def test_db_to_shards_feeds_batch_iterator(self, rng, tmp_path):
        from nemo_tpu.data import batch_iterator, db_to_shards, ShardedDataset
        db = self._tiny_db(rng).build()
        n, win = db_to_shards(db, str(tmp_path / "shards"), seqlen=8,
                              shard_size=4)
        assert n == win.shape[0] == 7   # 5 from 40 frames, 2 from 21
        ds = ShardedDataset(str(tmp_path / "shards"))
        assert len(ds) == 7
        batch = next(batch_iterator(ds, batch_size=4, seed=0))
        assert batch["features"].shape == (4, 8, 2048)
        assert batch["pose"].shape == (4, 8, 72)

    def test_save_load_roundtrip(self, rng, tmp_path):
        from nemo_tpu.data import load_db
        b = self._tiny_db(rng)
        path = str(tmp_path / "db.pt")
        db = b.save(path)
        db2 = load_db(path)
        np.testing.assert_allclose(db2["pose"], db["pose"])

    def test_read_3dpw_layout(self, rng, tmp_path):
        """3DPW reader against a fixture mimicking the official
        sequenceFiles pkl layout (threedpw_utils.py:42-146)."""
        import pickle
        import os
        from nemo_tpu.data import read_3dpw
        seq_dir = tmp_path / "sequenceFiles" / "train"
        os.makedirs(seq_dir)
        F = 12
        data = {
            "poses": [rng.randn(F, 72).astype(np.float64)],
            "betas": [rng.randn(16).astype(np.float64)],
            "campose_valid": [np.ones(F)],
            "poses2d": [np.abs(rng.randn(F, 3, 18)).astype(np.float64)],
        }
        with open(seq_dir / "courtyard_test_00.pkl", "wb") as f:
            pickle.dump(data, f)
        db = read_3dpw(str(tmp_path), "train").build()
        assert db["pose"].shape == (F, 72)
        assert db["joints2D"].shape == (F, 49, 3)
        assert (db["vid_name"] == "courtyard_test_00_0").all()
        assert db["img_name"][0].endswith("image_00000.jpg")


def test_read_penn_action_layout(rng, tmp_path):
    """Penn Action db reader against a labels/*.mat fixture
    (penn_action_utils.py:63-123)."""
    from scipy.io import savemat
    import os
    from nemo_tpu.data import read_penn_action
    os.makedirs(tmp_path / "labels")
    F = 7
    savemat(str(tmp_path / "labels" / "0001.mat"), {
        "x": rng.rand(F, 13) * 100,
        "y": rng.rand(F, 13) * 100,
        "visibility": np.ones((F, 13)),
        "nframes": np.array([[F]]),
        "pose": "?", "train": 1, "action": "x",
        "dimensions": np.array([[120, 160, F]]),
        "bbox": rng.rand(F, 4),
    })
    db = read_penn_action(str(tmp_path)).build()
    assert db["joints2D"].shape == (F, 49, 3)
    assert (db["joints2D"][:, :25, 2] >= 0).all()
    assert db["bbox"].shape == (F, 4)
    assert (db["bbox"][:, 2:] > 0).all()
    assert (db["vid_name"] == "0001").all()


class TestSpinCropFrame:
    """SPIN (center, scale) crop geometry (utils/imutils.py:12-139)."""

    def test_transform_roundtrip(self):
        from nemo_tpu.data.crops import transform_point

        center, scale, res = (120.0, 80.0), 0.9, (224, 224)
        pt = np.array([50, 70])
        back = transform_point(
            transform_point(pt, center, scale, res),
            center, scale, res, invert=True)
        np.testing.assert_allclose(back, pt, atol=2)

    def test_transform_matches_reference_formula(self):
        from nemo_tpu.data.crops import get_transform

        center, scale, res = (100.0, 60.0), 1.2, (224, 224)
        t = get_transform(center, scale, res)
        h = 200 * scale
        assert t[0, 0] == 224 / h and t[1, 1] == 224 / h
        np.testing.assert_allclose(t[0, 2], 224 * (-100 / h + 0.5))
        # rotation keeps the crop center fixed
        t_rot = get_transform(center, scale, res, rot=30)
        c_out = t @ np.array([center[0], center[1], 1.0])
        c_rot = t_rot @ np.array([center[0], center[1], 1.0])
        np.testing.assert_allclose(c_out[:2], c_rot[:2], atol=1e-9)

    def test_crop_scale_picks_window(self):
        from nemo_tpu.data.crops import crop_scale

        img = np.zeros((200, 200, 3), np.float32)
        img[90:110, 90:110] = 1.0  # bright square at the center
        out = crop_scale(img, (100, 100), 0.2, res=(40, 40))  # 40px window
        assert out.shape == (40, 40, 3)
        assert out[20, 20, 0] > 0.9      # center stays bright
        assert out[2, 2, 0] < 0.2        # corners outside the square

    def test_crop_scale_rotation_invariance_of_center(self):
        from nemo_tpu.data.crops import crop_scale

        rng = np.random.RandomState(0)
        img = rng.rand(150, 150, 3).astype(np.float32)
        img[70:80, 70:80] = 1.0
        a = crop_scale(img, (75, 75), 0.25, res=(50, 50))
        b = crop_scale(img, (75, 75), 0.25, res=(50, 50), rot=90)
        # the bright center square is rotation-invariant
        assert abs(float(a[25, 25, 0]) - float(b[25, 25, 0])) < 0.1

    def test_uncrop_inverts_placement(self):
        from nemo_tpu.data.crops import crop_scale, uncrop

        img = np.zeros((100, 100), np.float32)
        img[40:60, 40:60] = 1.0
        crop = crop_scale(img[..., None], (50, 50), 0.3,
                          res=(64, 64))[..., 0]
        back = uncrop(crop.astype(np.float32), (50, 50), 0.3, (100, 100))
        assert back[50, 50] > 0.9
        assert back[10, 10] < 0.1

    def test_rot_aa_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        from nemo_tpu.data.crops import rot_aa

        aa = np.array([0.3, -0.5, 0.2])
        out = rot_aa(aa, 40.0)
        want = (Rotation.from_rotvec([0, 0, np.deg2rad(-40.0)])
                * Rotation.from_rotvec(aa)).as_rotvec()
        np.testing.assert_allclose(out, want, atol=1e-9)

    def test_flip_img(self):
        from nemo_tpu.data.crops import flip_img

        img = np.arange(12).reshape(2, 6).astype(np.float32)
        np.testing.assert_allclose(flip_img(img)[:, 0], img[:, -1])
