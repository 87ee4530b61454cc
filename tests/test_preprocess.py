"""Preprocessing-pipeline tests: crops, video command builders, SMPLify."""

import numpy as np
import jax
import jax.numpy as jnp

from nemo_tpu.data import (bbox_from_keypoints, crop_image,
                           get_single_image_crop, frames_to_video,
                           openpose_command, video_to_frames)


class TestCrops:
    def test_bbox_from_keypoints(self):
        kp = np.zeros((25, 3), np.float32)
        kp[0] = [10, 20, 1]
        kp[1] = [50, 80, 1]
        kp[2] = [500, 500, 0.0]  # invisible — must be ignored
        bbox = bbox_from_keypoints(kp, rescale=1.0)
        np.testing.assert_allclose(bbox, [30, 50, 60], atol=1e-5)

    def test_crop_identity_region(self):
        img = np.arange(100, dtype=np.float32).reshape(10, 10, 1)
        # crop the full image back at the same resolution
        out = crop_image(img, center=(4.5, 4.5), size=10, out_res=10)
        np.testing.assert_allclose(out[..., 0], img[..., 0], atol=0.5)

    def test_crop_zero_padding_outside(self):
        img = np.ones((4, 4, 3), np.float32)
        out = crop_image(img, center=(20, 20), size=4, out_res=8)
        np.testing.assert_allclose(out, 0.0)

    def test_normalized_patch(self):
        img = np.full((20, 20, 3), 128, np.uint8)
        patch = get_single_image_crop(img, np.array([10, 10, 10]), out_res=8)
        assert patch.shape == (8, 8, 3)
        # 128/255 normalized by ImageNet stats
        want = (128 / 255.0 - 0.485) / 0.229
        np.testing.assert_allclose(patch[4, 4, 0], want, atol=1e-3)


class TestVideoCommands:
    def test_ffmpeg_commands(self, tmp_path):
        cmd = video_to_frames("in.mp4", str(tmp_path / "f"), fps=30,
                              run=False)
        assert cmd[0] == "ffmpeg" and "fps=30" in " ".join(cmd)
        cmd = frames_to_video(str(tmp_path), "out.mp4", run=False)
        assert "libx264" in cmd

    def test_openpose_command(self):
        cmd = openpose_command("/imgs", "/out", runtime="docker")
        joined = " ".join(cmd)
        assert "docker" in joined and "--write_json" in joined
        assert "--number_people_max 1" in joined


class TestSMPLify:
    def test_fit_reduces_loss(self):
        from nemo_tpu.body import synthetic_smpl_model
        from nemo_tpu.priors import smplify_fit, synthetic_gmm_prior
        from nemo_tpu.geometry import batch_rodrigues
        from nemo_tpu.body.smpl import smpl_forward

        smpl = synthetic_smpl_model(num_vertices=200, seed=0)
        prior = synthetic_gmm_prior(2)
        rng = np.random.RandomState(0)
        true_pose = (0.2 * rng.randn(1, 72)).astype(np.float32)
        t_true = np.array([[0.0, 0.2, 8.0]], np.float32)
        center = np.array([[112.0, 112.0]], np.float32)

        rot = batch_rodrigues(jnp.asarray(true_pose.reshape(1, 24, 3)))
        _, j = smpl_forward(smpl, jnp.zeros((1, 10)), rot[:, 1:], rot[:, :1],
                            want_vertices=False)
        from nemo_tpu.geometry import perspective_projection
        j2d = perspective_projection(j, jnp.broadcast_to(jnp.eye(3), (1, 3, 3)),
                                     jnp.asarray(t_true), 5000.0,
                                     jnp.asarray(center))
        kp = jnp.concatenate([j2d, jnp.ones((1, 49, 1))], -1)

        init_pose = jnp.asarray(true_pose + 0.1 * rng.randn(1, 72)
                                .astype(np.float32))
        out = smplify_fit(smpl, prior, init_pose, jnp.zeros((1, 10)),
                          jnp.asarray(t_true + 0.3), jnp.asarray(center),
                          kp, num_iters=80)
        assert np.isfinite(float(out["loss"]))

        # the fitted camera must reproject the TRUE pose better than the
        # perturbed init did (the SPIN camera loss anchors depth to the
        # estimate, so exact depth recovery is not the objective).
        def reproj_err(cam_t):
            p2 = perspective_projection(
                j, jnp.broadcast_to(jnp.eye(3), (1, 3, 3)), cam_t, 5000.0,
                jnp.asarray(center))
            return float(jnp.abs(p2 - j2d).mean())
        assert reproj_err(out["cam_t"]) < reproj_err(jnp.asarray(t_true + 0.3))


class TestVPoserTraining:
    def test_loss_decreases(self):
        from nemo_tpu.priors import (VPoserTrainConfig, init_vposer,
                                     train_vposer)
        params = init_vposer(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        data = (0.2 * rng.randn(256, 63)).astype(np.float32)
        cfg = VPoserTrainConfig(batch_size=64,
                                keep_extra_loss_terms_until_epoch=1)
        params2, hist = train_vposer(params, data, cfg, num_epochs=3)
        assert np.isfinite(hist["loss_total"]).all()
        assert hist["v2v"][-1] < hist["v2v"][0]

    def test_bn_stats_updated(self):
        from nemo_tpu.priors import (VPoserTrainConfig, init_vposer,
                                     train_vposer)
        params = init_vposer(jax.random.PRNGKey(1))
        data = (2.0 + np.random.RandomState(1).randn(128, 63)).astype(np.float32)
        params2, _ = train_vposer(params, data,
                                  VPoserTrainConfig(batch_size=64),
                                  num_epochs=1)
        # running mean must have moved toward the data mean (~2.0)
        assert float(np.abs(np.asarray(params2["bn0_mean"])).mean()) > 0.05


class TestReferenceArtifacts:
    """Readers for the reference's on-disk artifact formats
    (multi_view_sequence.py:336-414)."""

    def test_gt2d_pkl_dir(self, tmp_path):
        import joblib
        from nemo_tpu.data import load_gt2d_pkl_dir
        rng = np.random.RandomState(0)
        d = tmp_path / "view_gt_new"
        d.mkdir()
        frames = []
        for t in range(4):
            kp = rng.rand(2, 49, 2).astype(np.float32) * 100
            joblib.dump(kp, str(d / f"{t + 1:06d}_keypoints.pkl"))
            frames.append(kp[0, :15])
        out = load_gt2d_pkl_dir(str(d))
        assert out.shape == (4, 25, 3)
        np.testing.assert_allclose(out[:, :15, :2], np.stack(frames))
        np.testing.assert_allclose(out[:, :15, 2], 1.0)   # confidence 1
        np.testing.assert_allclose(out[:, 15:], 0.0)       # zero-padded rows

    def test_gt_camera_pt_torch_tuple(self, tmp_path):
        import pytest
        torch = pytest.importorskip("torch")
        from nemo_tpu.data import load_gt_camera_pt
        cam = torch.arange(9, dtype=torch.float32)
        path = str(tmp_path / "opt_cam_IMG_6289.pt")
        torch.save((cam, torch.tensor(5000.0)), path)
        cam9, f = load_gt_camera_pt(path)
        np.testing.assert_allclose(cam9, np.arange(9, dtype=np.float32))
        assert f == 5000.0

    def test_gt_camera_joblib_dict(self, tmp_path):
        import joblib
        from nemo_tpu.data import load_gt_camera_pt
        K = np.diag([4700.0, 4700.0, 1.0]).astype(np.float32)
        K[0, 2], K[1, 2] = 960, 540
        path = str(tmp_path / "opt_cam_IMG_6287_20230227.pt")
        joblib.dump({"rot6d": np.arange(6, dtype=np.float32),
                     "tran": np.array([1., 2., 3.], np.float32),
                     "K": K}, path)
        cam9, f = load_gt_camera_pt(path)
        np.testing.assert_allclose(cam9[:3], [1, 2, 3])
        np.testing.assert_allclose(cam9[3:], np.arange(6))
        assert f == 4700.0

    def test_label_intersection_threshold(self):
        from nemo_tpu.data.bundle import MultiViewBundle
        op = np.zeros((1, 2, 25, 3), np.float32)
        gt = np.zeros((1, 2, 25, 3), np.float32)
        op[..., 2] = 1.0
        gt[0, :, :, 0] = 20.0   # 20 px horizontal disagreement
        b = MultiViewBundle(labels={"op": op, "gt": gt},
                            hmr_theta=np.zeros((1, 2, 69), np.float32),
                            hmr_mask=np.zeros((1, 2, 1), np.float32),
                            img_hw=np.array([100., 100.], np.float32),
                            framerate_multiplier=np.ones(1, np.float32),
                            name="t")
        tight = b.label("intersection", intersection_threshold=10.0)
        loose = b.label("intersection", intersection_threshold=30.0)
        assert tight[..., 2].max() == 0.0      # all gated out at 10 px
        assert loose[..., 2].min() == 1.0      # all kept at 30 px
