"""Tests for the neural modules (FCNN, MotionNet, monotonic warp, RBF)."""

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.modules import (
    apply_fcnn, apply_monotonic_all_views, apply_monotonic_gather,
    apply_monotonic_single, apply_motion_net, apply_rbf, init_fcnn,
    init_monotonic, init_motion_net, init_rbf, RBF_KERNELS,
)


class TestFCNN:
    def test_shapes(self):
        p = init_fcnn(jax.random.PRNGKey(0), 5, 32, 7)
        out = apply_fcnn(p, jnp.ones((4, 5)))
        assert out.shape == (4, 7)


class TestMotionNet:
    def test_identity_init_outputs_identity_rotations(self):
        # init_last_layer_zero -> every joint ~identity rotation, pose ~0
        # (the reference's known-good near-identity start, :120-126).
        p = init_motion_net(jax.random.PRNGKey(0), 11, 64, n_joints=24)
        pose_d, orient, trans = apply_motion_net(p, jnp.ones((3, 11)), 24)
        np.testing.assert_allclose(
            np.asarray(pose_d["rotmat"]),
            np.broadcast_to(np.eye(3), (3, 23, 3, 3)), atol=1e-3)
        np.testing.assert_allclose(np.asarray(pose_d["pose"]), 0.0, atol=1e-3)
        assert orient["rot6d"].shape == (3, 6)
        assert trans.shape == (3, 3)

    def test_grad_finite_at_init(self):
        # The reference can't use gain=0 because of NaN grads; our branchless
        # conversions must give finite grads at the near-identity init.
        p = init_motion_net(jax.random.PRNGKey(1), 4, 32, n_joints=24)

        def loss(p):
            pose_d, orient, trans = apply_motion_net(p, jnp.ones((2, 4)), 24)
            return (jnp.sum(pose_d["pose"] ** 2) + jnp.sum(trans ** 2)
                    + jnp.sum(orient["pose"] ** 2))
        g = jax.grad(loss)(p)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)

    def test_splits_orient_and_pose(self):
        p = init_motion_net(jax.random.PRNGKey(2), 4, 32, n_joints=24)
        pose_d, orient, _ = apply_motion_net(
            p, jax.random.normal(jax.random.PRNGKey(3), (5, 4)), 24)
        assert pose_d["rot6d"].shape == (5, 138)   # 23 joints
        assert pose_d["rotmat"].shape == (5, 23, 3, 3)
        assert pose_d["pose"].shape == (5, 69)
        assert orient["rotmat"].shape == (5, 1, 3, 3)


class TestMonotonic:
    def test_endpoints_and_monotonicity(self):
        p = init_monotonic(jax.random.PRNGKey(0), num_views=3, n_nodes=10)
        x = jnp.linspace(0, 1, 101)[:, None]
        for v in range(3):
            y = np.asarray(apply_monotonic_single(
                p["shifts"][v], p["scales"][v], x))[:, 0]
            assert abs(y[0]) < 1e-4
            assert abs(y[-1] - 1.0) < 1e-3
            assert (np.diff(y) >= -1e-6).all()

    def test_linear_init(self):
        p = init_monotonic(jax.random.PRNGKey(0), 2, 50, init="linear")
        x = jnp.linspace(0, 1, 11)[:, None]
        y = np.asarray(apply_monotonic_single(p["shifts"][0], p["scales"][0], x))
        # linear-ish map: endpoints exact, midpoint near 0.5
        assert abs(y[5, 0] - 0.5) < 0.1

    def test_all_views_matches_single(self):
        p = init_monotonic(jax.random.PRNGKey(4), 4, 10)
        x = jnp.linspace(0, 1, 7)[:, None]
        all_y = apply_monotonic_all_views(p, x)
        assert all_y.shape == (4, 7, 1)
        for v in range(4):
            single = apply_monotonic_single(p["shifts"][v], p["scales"][v], x)
            np.testing.assert_allclose(np.asarray(all_y[v]),
                                       np.asarray(single), atol=1e-6)

    def test_gather_matches_all_views(self):
        p = init_monotonic(jax.random.PRNGKey(5), 4, 10)
        key = jax.random.PRNGKey(6)
        view_idx = jax.random.randint(key, (32,), 0, 4)
        x = jax.random.uniform(key, (32, 1))
        gathered = apply_monotonic_gather(p, view_idx, x)
        full = apply_monotonic_all_views(p, x)  # (V, B, 1)
        want = full[view_idx, jnp.arange(32)]
        np.testing.assert_allclose(np.asarray(gathered), np.asarray(want),
                                   atol=1e-6)


class TestRBF:
    def test_all_kernels_finite(self):
        p = init_rbf(16)
        x = jnp.linspace(0, 1, 9)[:, None]
        for name in RBF_KERNELS:
            out = apply_rbf(p, x, kernel=name)
            assert out.shape == (9, 16)
            assert np.isfinite(np.asarray(out)).all()

    def test_squared_distance_semantics(self):
        # d = (x - c)^2 / exp(log_sigma); 'linear' kernel returns d directly.
        p = init_rbf(3)  # centres [0, 0.5, 1]
        out = np.asarray(apply_rbf(p, jnp.array([[0.5]]), kernel="linear"))
        np.testing.assert_allclose(out[0], [0.25, 0.0, 0.25], atol=1e-6)

    def test_grad_finite_at_centres(self):
        # The sqrt formulation NaN'd the reference (rbf.py:51-52); squared
        # distances must have finite grads when x coincides with a centre.
        p = init_rbf(5)

        def loss(x):
            return jnp.sum(apply_rbf(p, x, kernel="quadratic"))
        g = jax.grad(loss)(jnp.array([[0.5]]))
        assert np.isfinite(np.asarray(g)).all()
