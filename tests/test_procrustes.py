"""Tests for similarity/rigid alignment and reconstruction error."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sRot

from nemo_tpu.geometry import (
    apply_rigid_transform, reconstruction_error, rigid_transform,
    similarity_transform,
)


class TestSimilarity:
    def test_exact_recovery(self, rng):
        S1 = rng.randn(4, 15, 3).astype(np.float32)
        R = sRot.random(4, random_state=1).as_matrix().astype(np.float32)
        s = rng.uniform(0.5, 2.0, (4, 1, 1)).astype(np.float32)
        t = rng.randn(4, 1, 3).astype(np.float32)
        S2 = s * np.einsum('bij,bnj->bni', R, S1) + t
        S1_hat, (scale, Rhat, that) = similarity_transform(
            jnp.asarray(S1), jnp.asarray(S2))
        # f32 SVD is ~1e-2 accurate; the float64 twin must be exact.
        np.testing.assert_allclose(np.asarray(S1_hat), S2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(scale), s[:, 0, 0], atol=1e-2)
        from nemo_tpu.geometry import similarity_transform_np
        S1_hat64, (scale64, _, _) = similarity_transform_np(S1, S2)
        np.testing.assert_allclose(S1_hat64, S2, atol=1e-5)
        np.testing.assert_allclose(scale64, s[:, 0, 0].astype(np.float64),
                                   atol=1e-5)

    def test_reflection_fix(self, rng):
        # Mirror S2: the recovered R must still be a proper rotation.
        S1 = rng.randn(10, 3).astype(np.float32)
        S2 = S1 * np.array([-1, 1, 1], dtype=np.float32)
        _, (_, R, _) = similarity_transform(jnp.asarray(S1), jnp.asarray(S2))
        assert np.linalg.det(np.asarray(R)) > 0


class TestRigid:
    def test_exact_recovery(self, rng):
        A = rng.randn(12, 3).astype(np.float32)
        R = sRot.random(1, random_state=7).as_matrix()[0].astype(np.float32)
        t = np.array([1.0, -2.0, 0.5], dtype=np.float32)
        B = A @ R.T + t
        Rhat, that = rigid_transform(jnp.asarray(A), jnp.asarray(B))
        # f32 SVD accuracy is ~1e-2; exactness is covered by the f64 twins.
        np.testing.assert_allclose(np.asarray(Rhat), R, atol=1e-2)
        np.testing.assert_allclose(np.asarray(that), t, atol=1e-2)
        Bhat = apply_rigid_transform(jnp.asarray(A), Rhat, that)
        np.testing.assert_allclose(np.asarray(Bhat), B, atol=1e-2)


class TestRigidNp:
    """float64 twin of the reference's rigid_transform_3D
    (pose_utils.py:30-84) — the eval_3d_global alignment."""

    def test_exact_recovery(self, rng):
        from nemo_tpu.geometry import rigid_transform_np
        A = rng.randn(40, 3)
        R = sRot.random(1, random_state=3).as_matrix()[0]
        t = np.array([0.7, -1.2, 2.5])
        B = A @ R.T + t
        Rhat, that = rigid_transform_np(A, B)
        np.testing.assert_allclose(Rhat, R, atol=1e-10)
        np.testing.assert_allclose(that, t, atol=1e-10)

    def test_no_scale_component(self, rng):
        # Kabsch must NOT absorb scale: aligning A -> 2A leaves residual.
        from nemo_tpu.geometry import rigid_transform_np
        A = rng.randn(30, 3)
        R, t = rigid_transform_np(A, 2.0 * A)
        resid = np.abs(A @ R.T + t - 2.0 * A).max()
        assert resid > 0.1

    def test_reflection_case_proper_rotation(self, rng):
        from nemo_tpu.geometry import rigid_transform_np
        A = rng.randn(25, 3)
        B = A * np.array([-1.0, 1.0, 1.0])
        R, t = rigid_transform_np(A, B)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-8)

    def test_matches_reference_transcription(self, rng):
        # independent hand transcription of pose_utils.py:30-84 on (3, N)
        from nemo_tpu.geometry import rigid_transform_np
        A = rng.randn(12, 3)
        B = rng.randn(12, 3)
        At, Bt = A.T, B.T
        cA = At.mean(1, keepdims=True)
        cB = Bt.mean(1, keepdims=True)
        H = (At - cA) @ (Bt - cB).T
        U, _s, Vt = np.linalg.svd(H)
        Rw = Vt.T @ U.T
        if np.linalg.det(Rw) < 0:
            Vt[2, :] *= -1
            Rw = Vt.T @ U.T
        tw = (-Rw @ cA + cB)[:, 0]
        R, t = rigid_transform_np(A, B)
        np.testing.assert_allclose(R, Rw, atol=1e-12)
        np.testing.assert_allclose(t, tw, atol=1e-12)


class TestReconstructionError:
    def test_zero_for_identical(self, rng):
        S = jnp.asarray(rng.randn(6, 15, 3).astype(np.float32))
        assert float(reconstruction_error(S, S, pa=False)) < 1e-6
        assert float(reconstruction_error(S, S, pa=True)) < 2e-2  # f32 SVD
        from nemo_tpu.geometry import reconstruction_error_np
        assert reconstruction_error_np(np.asarray(S), np.asarray(S), pa=True) < 1e-8

    def test_pa_removes_similarity(self, rng):
        S1 = rng.randn(3, 15, 3).astype(np.float32)
        R = sRot.random(3, random_state=9).as_matrix().astype(np.float32)
        S2 = 1.3 * np.einsum('bij,bnj->bni', R, S1) + 0.2
        err_pa = float(reconstruction_error(jnp.asarray(S1), jnp.asarray(S2),
                                            pa=True))
        err_nopa = float(reconstruction_error(jnp.asarray(S1),
                                              jnp.asarray(S2), pa=False))
        assert err_pa < 5e-2
        assert err_nopa > 0.1
        from nemo_tpu.geometry import reconstruction_error_np
        assert reconstruction_error_np(S1, S2, pa=True) < 1e-5

    def test_matches_manual_mpjpe(self, rng):
        S1 = rng.randn(5, 15, 3).astype(np.float32)
        S2 = rng.randn(5, 15, 3).astype(np.float32)
        want = np.sqrt(((S1 - S2) ** 2).sum(-1)).mean()
        got = float(reconstruction_error(jnp.asarray(S1), jnp.asarray(S2),
                                         pa=False))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_none_reduction(self, rng):
        S1 = jnp.asarray(rng.randn(5, 15, 3).astype(np.float32))
        S2 = jnp.asarray(rng.randn(5, 15, 3).astype(np.float32))
        out = reconstruction_error(S1, S2, pa=False, reduction=None)
        assert out.shape == (5,)
