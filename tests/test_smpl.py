"""SMPL forward-kinematics tests.

The golden reference is a naive numpy LBS implemented *here* from the SMPL
paper equations (same math as human_body_prior/body_model/lbs.py) — loops and
all — so the vectorized level-parallel JAX implementation is validated against
independent code, not itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sRot

from nemo_tpu.body import (
    SMPLModel, batch_rigid_transform, smpl_forward, synthetic_smpl_model,
)
from nemo_tpu.body import constants


@pytest.fixture(scope="module")
def model():
    return synthetic_smpl_model(num_vertices=500, seed=0)


def naive_lbs(model: SMPLModel, betas, rot_mats):
    """Loop-based LBS reference (numpy, float64)."""
    v_template = np.asarray(model.v_template, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)
    J_reg = np.asarray(model.J_regressor, np.float64)
    W = np.asarray(model.lbs_weights, np.float64)
    parents = np.asarray(model.parents)
    B = rot_mats.shape[0]
    V = v_template.shape[0]

    out_v, out_j = [], []
    for b in range(B):
        beta = np.asarray(betas[min(b, betas.shape[0] - 1)], np.float64)
        v_shaped = v_template + np.einsum('l,mkl->mk', beta, shapedirs)
        J = J_reg @ v_shaped  # (24, 3)
        R = np.asarray(rot_mats[b], np.float64)  # (24, 3, 3)
        pose_feature = (R[1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + (pose_feature @ posedirs).reshape(V, 3)

        # sequential kinematic chain
        G = np.zeros((24, 4, 4))
        G[0] = np.eye(4)
        G[0][:3, :3] = R[0]
        G[0][:3, 3] = J[0]
        for i in range(1, 24):
            T = np.eye(4)
            T[:3, :3] = R[i]
            T[:3, 3] = J[i] - J[parents[i]]
            G[i] = G[parents[i]] @ T
        posed_joints = G[:, :3, 3].copy()
        # remove rest-pose joint contribution
        A = G.copy()
        for i in range(24):
            A[i][:3, 3] -= A[i][:3, :3] @ J[i]

        verts = np.zeros((V, 3))
        for v in range(V):
            T = sum(W[v, j] * A[j] for j in range(24))
            verts[v] = (T @ np.append(v_posed[v], 1.0))[:3]
        out_v.append(verts)
        out_j.append(posed_joints)
    return np.stack(out_v), np.stack(out_j)


def joints54_from_verts(model, verts, posed_joints):
    sel = verts[:, np.asarray(model.vertex_joint_ids)]
    extra = np.einsum('jv,bvk->bjk', np.asarray(model.J_regressor_extra,
                                                np.float64), verts)
    return np.concatenate([posed_joints, sel, extra], axis=1)


class TestLBS:
    def test_matches_naive_reference(self, model, rng):
        B = 3
        aa = 0.3 * rng.randn(B, 24, 3).astype(np.float32)
        rot = sRot.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(B, 24, 3, 3)
        rot = rot.astype(np.float32)
        betas = 0.5 * rng.randn(1, 10).astype(np.float32)

        verts, joints49 = smpl_forward(
            model, jnp.asarray(betas), jnp.asarray(rot[:, 1:]),
            jnp.asarray(rot[:, :1]))
        want_v, want_j = naive_lbs(model, betas, rot)
        np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-5)

        want49 = joints54_from_verts(model, want_v, want_j)[
            :, np.asarray(model.joint_map)]
        np.testing.assert_allclose(np.asarray(joints49), want49, atol=2e-5)

    def test_rest_pose_is_template(self, model):
        eye = jnp.broadcast_to(jnp.eye(3), (1, 23, 3, 3))
        orient = jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3))
        betas = jnp.zeros((1, 10))
        verts, _ = smpl_forward(model, betas, eye, orient)
        np.testing.assert_allclose(np.asarray(verts)[0],
                                   np.asarray(model.v_template), atol=1e-5)

    def test_pose2rot_axis_angle_input(self, model, rng):
        aa = 0.2 * rng.randn(2, 24, 3).astype(np.float32)
        rot = sRot.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(2, 24, 3, 3)
        betas = jnp.zeros((1, 10))
        v1, j1 = smpl_forward(model, betas, jnp.asarray(aa[:, 1:].reshape(2, 69)),
                              jnp.asarray(aa[:, 0]), pose2rot=True)
        v2, j2 = smpl_forward(model, betas,
                              jnp.asarray(rot[:, 1:].astype(np.float32)),
                              jnp.asarray(rot[:, :1].astype(np.float32)))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-4)

    def test_joints_only_path_matches_full(self, model, rng):
        B = 4
        aa = 0.3 * rng.randn(B, 24, 3).astype(np.float32)
        rot = sRot.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
            B, 24, 3, 3).astype(np.float32)
        betas = jnp.asarray(0.3 * rng.randn(1, 10).astype(np.float32))
        _, j_full = smpl_forward(model, betas, jnp.asarray(rot[:, 1:]),
                                 jnp.asarray(rot[:, :1]), want_vertices=True)
        none_v, j_fast = smpl_forward(model, betas, jnp.asarray(rot[:, 1:]),
                                      jnp.asarray(rot[:, :1]),
                                      want_vertices=False)
        assert none_v is None
        np.testing.assert_allclose(np.asarray(j_fast), np.asarray(j_full),
                                   atol=1e-4)

    def test_transl(self, model, rng):
        rot = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3)).astype(jnp.float32)
        t = jnp.asarray(rng.randn(2, 3).astype(np.float32))
        betas = jnp.zeros((1, 10))
        v0, j0 = smpl_forward(model, betas, rot[:, 1:], rot[:, :1])
        v1, j1 = smpl_forward(model, betas, rot[:, 1:], rot[:, :1], transl=t)
        np.testing.assert_allclose(np.asarray(v1 - v0),
                                   np.broadcast_to(np.asarray(t)[:, None],
                                                   v0.shape), atol=1e-6)

    def test_grad_flows(self, model):
        def loss(aa):
            rot = jnp.broadcast_to(jnp.eye(3), (1, 23, 3, 3))
            from nemo_tpu.geometry import batch_rodrigues
            orient = batch_rodrigues(aa.reshape(1, 1, 3))
            _, j = smpl_forward(model, jnp.zeros((1, 10)), rot, orient)
            return jnp.sum(j ** 2)
        g = jax.grad(loss)(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()

    def test_jit_and_vmap_compatible(self, model, rng):
        fn = jax.jit(lambda b, p, o: smpl_forward(model, b, p, o)[1])
        rot = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3)).astype(jnp.float32)
        out = fn(jnp.zeros((1, 10)), rot[:, 1:], rot[:, :1])
        assert out.shape == (2, 49, 3)


class TestRigidTransform:
    def test_identity_preserves_joints(self, model):
        J = jnp.asarray(np.asarray(model.J_regressor) @
                        np.asarray(model.v_template))
        eye = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        posed, rel = batch_rigid_transform(eye, J[None], model.parents)
        np.testing.assert_allclose(np.asarray(posed)[0], np.asarray(J),
                                   atol=1e-6)
        # relative transforms must be identity at rest
        np.testing.assert_allclose(
            np.asarray(rel)[0], np.broadcast_to(np.eye(4), (24, 4, 4)),
            atol=1e-5)
