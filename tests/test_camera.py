"""Tests for camera projection and translation estimation."""

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.geometry import (
    apply_extrinsics, camera_from_params, estimate_translation,
    init_camera_params, perspective_projection, project,
)


def manual_project(points, R, t, f, cx, cy):
    p = points @ R.T + t
    p = p / p[:, 2:3]
    return np.stack([f * p[:, 0] + cx, f * p[:, 1] + cy], axis=-1)


class TestProjection:
    def test_matches_manual(self, rng):
        pts = rng.randn(8, 25, 3).astype(np.float32)
        from scipy.spatial.transform import Rotation as sRot
        R = sRot.random(8, random_state=0).as_matrix().astype(np.float32)
        t = np.array([[0, 0, 10.0]] * 8, dtype=np.float32) \
            + 0.1 * rng.randn(8, 3).astype(np.float32)
        f = 5000.0
        center = np.full((8, 2), 500.0, dtype=np.float32)
        got = np.asarray(perspective_projection(
            jnp.asarray(pts), jnp.asarray(R), jnp.asarray(t), f,
            jnp.asarray(center)))
        for i in range(8):
            want = manual_project(pts[i], R[i], t[i], f, 500.0, 500.0)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-2)

    def test_grad_finite_at_zero_depth(self):
        pts = jnp.array([[[0.0, 0.0, 0.0]]])
        R = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        t = jnp.zeros((1, 3))

        def f(t):
            out = perspective_projection(pts, R, t, 5000.0, jnp.zeros((1, 2)))
            return jnp.sum(out)
        g = jax.grad(f)(t)
        assert np.isfinite(np.asarray(g)).all()

    def test_camera_from_params_identity(self):
        # Near-identity init must give a near-identity rotation.
        p = init_camera_params(jax.random.PRNGKey(0), 4, img_d0=1000.0)
        cam = camera_from_params(p, 1000.0, 1900.0)
        np.testing.assert_allclose(np.asarray(cam.rotation),
                                   np.broadcast_to(np.eye(3), (4, 3, 3)),
                                   atol=1e-3)
        # depth init = 2f/D0 = 10
        np.testing.assert_allclose(np.asarray(cam.translation[:, 2]), 10.0,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(cam.center[0]), [500.0, 950.0])

    def test_project_camera_tuple(self, rng):
        pts = jnp.asarray(rng.randn(4, 10, 3).astype(np.float32))
        p = init_camera_params(jax.random.PRNGKey(1), 4, img_d0=720.0)
        cam = camera_from_params(p, 720.0, 1280.0)
        out = project(pts, cam)
        assert out.shape == (4, 10, 2)
        assert np.isfinite(np.asarray(out)).all()


class TestExtrinsics:
    def test_forward_inverse(self, rng):
        from scipy.spatial.transform import Rotation as sRot
        pts = jnp.asarray(rng.randn(5, 7, 3).astype(np.float32))
        R = jnp.asarray(sRot.random(5, random_state=2).as_matrix().astype(np.float32))
        t = jnp.asarray(rng.randn(5, 3).astype(np.float32))
        fwd = apply_extrinsics(pts, R, t)
        back = apply_extrinsics(fwd, R, t, inverse=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


class TestEstimateTranslation:
    def test_recovers_known_translation(self, rng):
        S = rng.randn(25, 3).astype(np.float32)
        t_true = np.array([0.3, -0.2, 8.0], dtype=np.float32)
        f, img = 5000.0, 224.0
        j2d = manual_project(S, np.eye(3, dtype=np.float32), t_true, f,
                             img / 2, img / 2)
        conf = np.ones(25, dtype=np.float32)
        got = np.asarray(estimate_translation(
            jnp.asarray(S)[None], jnp.asarray(j2d)[None],
            jnp.asarray(conf)[None], focal_length=f, img_size=img))[0]
        np.testing.assert_allclose(got, t_true, atol=1e-2)

    def test_confidence_weighting(self, rng):
        # Corrupt half the joints but zero their confidence: solution should
        # still match the clean translation.
        S = rng.randn(25, 3).astype(np.float32)
        t_true = np.array([0.0, 0.5, 9.0], dtype=np.float32)
        f, img = 5000.0, 224.0
        j2d = manual_project(S, np.eye(3, dtype=np.float32), t_true, f,
                             img / 2, img / 2)
        j2d[::2] += 300.0
        conf = np.ones(25, dtype=np.float32)
        conf[::2] = 0.0
        got = np.asarray(estimate_translation(
            jnp.asarray(S)[None], jnp.asarray(j2d)[None],
            jnp.asarray(conf)[None], focal_length=f, img_size=img))[0]
        np.testing.assert_allclose(got, t_true, atol=1e-2)
