"""IK engine tests: VPoser-latent fitting with Adam and L-BFGS.

Behavioral reference: human_body_prior/models/ik_engine.py:156-287 (the
LBFGS/Adam closure switch at :246-252)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.body import synthetic_smpl_model
from nemo_tpu.priors import IKConfig, ik_fit, init_vposer
from nemo_tpu.priors.vposer import vposer_decode


@pytest.fixture(scope="module")
def problem():
    smpl = synthetic_smpl_model(num_vertices=200, seed=0)
    vposer = init_vposer(jax.random.PRNGKey(2))
    rng = np.random.RandomState(0)
    B = 2
    z_true = jnp.asarray(0.5 * rng.randn(B, 32).astype(np.float32))
    trans_true = jnp.asarray(0.3 * rng.randn(B, 3).astype(np.float32))

    from nemo_tpu.body.smpl import smpl_forward
    from nemo_tpu.geometry.rotations import batch_rodrigues
    dec = vposer_decode(vposer, z_true)
    full = jnp.concatenate([dec["pose_body"].reshape(B, 63),
                            jnp.zeros((B, 6))], 1)
    rot = batch_rodrigues(full.reshape(B, 23, 3))
    orient = batch_rodrigues(jnp.zeros((B, 1, 3)))
    _, target = smpl_forward(smpl, jnp.zeros((1, 10)), rot, orient,
                             want_vertices=False, transl=trans_true)
    return smpl, vposer, target, z_true, trans_true


class TestIKFit:
    def test_adam_reduces_loss_and_recovers_joints(self, problem):
        smpl, vposer, target, _, _ = problem
        out = ik_fit(smpl, vposer, target,
                     cfg=IKConfig(num_steps=150, optimizer="adam"))
        assert np.isfinite(np.asarray(out["loss"])).all()
        assert float(out["loss"][-1]) < float(out["loss"][0]) * 0.1
        err = np.abs(np.asarray(out["joints"]) - np.asarray(target)).mean()
        assert err < 0.05  # metres

    def test_lbfgs_mode_converges_in_fewer_steps(self, problem):
        """The reference's LBFGS closure path (ik_engine.py:246-252):
        optax.lbfgs with linesearch must reach at least Adam's loss with a
        third of the steps."""
        smpl, vposer, target, _, _ = problem
        adam = ik_fit(smpl, vposer, target,
                      cfg=IKConfig(num_steps=150, optimizer="adam"))
        lbfgs = ik_fit(smpl, vposer, target,
                       cfg=IKConfig(num_steps=50, optimizer="lbfgs"))
        assert np.isfinite(np.asarray(lbfgs["loss"])).all()
        assert float(lbfgs["loss"][-1]) <= float(adam["loss"][-1]) * 1.05
        err = np.abs(np.asarray(lbfgs["joints"]) - np.asarray(target)).mean()
        assert err < 0.05

    def test_joint_mask_ignores_unmasked_targets(self, problem):
        smpl, vposer, target, _, _ = problem
        # corrupt half the joints but mask them out: fit must still succeed
        bad = np.asarray(target).copy()
        bad[:, 25:] += 100.0
        mask = np.zeros(target.shape[1], np.float32)
        mask[:25] = 1.0
        out = ik_fit(smpl, vposer, jnp.asarray(bad), joint_mask=mask,
                     cfg=IKConfig(num_steps=100))
        err = np.abs(np.asarray(out["joints"])[:, :25]
                     - np.asarray(target)[:, :25]).mean()
        assert err < 0.1
