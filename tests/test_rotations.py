"""Golden tests for rotation conversions against independent references.

The torch reference implementations (hmr/geometry.py) are re-derived here via
scipy.spatial.transform / hand-computed cases — not imported — so these tests
pin the *behavior*, not the code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sRot

from nemo_tpu.geometry import (
    aa_to_quat, batch_rodrigues, quat_to_aa, quat_to_rotmat,
    rot6d_to_rotmat, rotmat_to_aa, rotmat_to_quat, rotmat_to_rot6d,
    euler_to_rotmat,
)


def random_rotmats(n, seed=0):
    return sRot.random(n, random_state=seed).as_matrix().astype(np.float32)


class TestRot6d:
    def test_roundtrip_from_rotmat(self):
        R = random_rotmats(64)
        got = np.asarray(rot6d_to_rotmat(rotmat_to_rot6d(jnp.asarray(R))))
        np.testing.assert_allclose(got, R, atol=1e-5)

    def test_orthonormal_for_random_input(self, rng):
        x = jnp.asarray(rng.randn(128, 6).astype(np.float32))
        R = np.asarray(rot6d_to_rotmat(x))
        eye = np.einsum('bij,bkj->bik', R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_identity_6d(self):
        # The reference initializes rot heads to bias [1,0,0,1,0,0] == identity.
        x = jnp.asarray(np.array([[1, 0, 0, 1, 0, 0]], dtype=np.float32))
        np.testing.assert_allclose(np.asarray(rot6d_to_rotmat(x))[0], np.eye(3),
                                   atol=1e-6)

    def test_gram_schmidt_convention(self, rng):
        # Columns (not rows) are the orthonormalized frame: b1 = a1/|a1|.
        x = rng.randn(4, 6).astype(np.float32)
        R = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
        a1 = x.reshape(4, 3, 2)[:, :, 0]
        b1 = a1 / np.linalg.norm(a1, axis=-1, keepdims=True)
        np.testing.assert_allclose(R[:, :, 0], b1, atol=1e-5)

    def test_grad_finite_at_identity(self):
        # gain=0 init NaNs the reference's grad; ours must stay finite at the
        # exact identity-6D point (neural_motion_model.py:87-89).
        x = jnp.asarray(np.array([1., 0, 0, 1, 0, 0], dtype=np.float32))
        g = jax.grad(lambda v: jnp.sum(rot6d_to_rotmat(v)))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestRodrigues:
    def test_matches_scipy(self, rng):
        aa = rng.randn(100, 3).astype(np.float32)
        want = sRot.from_rotvec(aa).as_matrix()
        got = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_zero_rotation(self):
        got = np.asarray(batch_rodrigues(jnp.zeros((1, 3))))
        np.testing.assert_allclose(got[0], np.eye(3), atol=1e-6)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda v: jnp.sum(batch_rodrigues(v)))(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()


class TestQuat:
    def test_quat_rotmat_roundtrip(self, rng):
        q = rng.randn(50, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        # scipy uses (x, y, z, w) order.
        want = sRot.from_quat(np.roll(q, -1, axis=-1)).as_matrix()
        np.testing.assert_allclose(R, want, atol=1e-5)

    def test_rotmat_to_quat_roundtrip(self):
        R = random_rotmats(200, seed=3)
        q = np.asarray(rotmat_to_quat(jnp.asarray(R)))
        R2 = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_quat_branch_coverage(self):
        # Hit all four branch cases of the quaternion extraction: rotations by
        # pi about each axis plus identity.
        mats = [np.eye(3)]
        for axis in np.eye(3):
            mats.append(sRot.from_rotvec(np.pi * axis).as_matrix())
        R = np.stack(mats).astype(np.float32)
        q = np.asarray(rotmat_to_quat(jnp.asarray(R)))
        R2 = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestRotmatToAA:
    def test_matches_scipy(self):
        R = random_rotmats(100, seed=1)
        got = np.asarray(rotmat_to_aa(jnp.asarray(R)))
        want = sRot.from_matrix(R).as_rotvec()
        # axis-angle is unique up to 2*pi*k; these random rotations stay in
        # (-pi, pi) so direct comparison works.
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_identity_maps_to_zero(self):
        R = jnp.broadcast_to(jnp.eye(3), (5, 3, 3))
        got = np.asarray(rotmat_to_aa(R))
        np.testing.assert_allclose(got, 0.0, atol=1e-6)

    def test_grad_finite_at_identity(self):
        # This is the NaN trap the reference patches three separate ways.
        def f(eps):
            R = rot6d_to_rotmat(jnp.array([1., 0, 0, 1, 0, 0]) + eps)
            return jnp.sum(rotmat_to_aa(R))
        g = jax.grad(f)(jnp.zeros(6))
        assert np.isfinite(np.asarray(g)).all()

    def test_roundtrip_aa(self, rng):
        aa = 0.5 * rng.randn(64, 3).astype(np.float32)
        R = batch_rodrigues(jnp.asarray(aa))
        got = np.asarray(rotmat_to_aa(R))
        np.testing.assert_allclose(got, aa, atol=1e-3)


class TestAAQuat:
    def test_roundtrip(self, rng):
        aa = rng.randn(32, 3).astype(np.float32)
        got = np.asarray(quat_to_aa(aa_to_quat(jnp.asarray(aa))))
        np.testing.assert_allclose(got, aa, atol=1e-4)


class TestEuler:
    def test_euler_to_rotmat(self, rng):
        e = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
        got = np.asarray(euler_to_rotmat(jnp.asarray(e)))
        for i in range(16):
            assert np.allclose(got[i] @ got[i].T, np.eye(3), atol=1e-5)
