"""HuMoR motion-optimizer smoke test (tiny sizes; checks stage plumbing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.body import synthetic_smpl_model
from nemo_tpu.models import (HumorConfig, MotionOptConfig, humor_motion_fit,
                             init_humor)


@pytest.mark.slow
def test_three_stage_fit_runs_and_reduces_reprojection(rng):
    smpl = synthetic_smpl_model(num_vertices=200, seed=0)
    hcfg = HumorConfig()
    hp = init_humor(jax.random.PRNGKey(0), hcfg)

    T = 6
    true_pose = (0.2 * rng.randn(T, 72)).astype(np.float32)
    cam_t = jnp.asarray([0.0, 0.0, 8.0])
    center = jnp.asarray([112.0, 112.0])

    from nemo_tpu.geometry import batch_rodrigues, perspective_projection
    from nemo_tpu.body.smpl import smpl_forward
    rot = batch_rodrigues(jnp.asarray(true_pose.reshape(T, 24, 3)))
    _, j = smpl_forward(smpl, jnp.zeros((1, 10)), rot[:, 1:], rot[:, :1],
                        want_vertices=False)
    j = j[:, :25]
    proj = perspective_projection(
        j, jnp.broadcast_to(jnp.eye(3), (T, 3, 3)),
        jnp.broadcast_to(cam_t, (T, 3)), 5000.0,
        jnp.broadcast_to(center, (T, 2)))
    kp2d = jnp.concatenate([proj, jnp.ones((T, 25, 1))], -1)

    init_pose = jnp.asarray(true_pose + 0.15 * rng.randn(T, 72)
                            .astype(np.float32))
    cfg = MotionOptConfig(steps_stage1=5, steps_stage2=10, steps_stage3=5)
    out = humor_motion_fit(smpl, hp, hcfg, kp2d, init_pose, cam_t, center,
                           cfg=cfg)
    assert out["pose"].shape == (T, 72)
    assert out["trans"].shape == (T, 3)
    assert np.isfinite(np.asarray(out["pose"])).all()
    # stage 2 must improve on its own starting loss
    assert float(out["stage2_loss"][-1]) < float(out["stage2_loss"][0])


@pytest.mark.slow
def test_fitting_loss_completion_terms(rng):
    """Stage 2 optimizes betas; stage 3 carries contact/floor/bone-length
    terms and the conditional-prior NLL; optimize_camera learns the camera
    (fitting_loss.py contact/floor terms; motion_optimizer.py:275-283)."""
    smpl = synthetic_smpl_model(num_vertices=200, seed=0)
    hcfg = HumorConfig(latent_size=8, pred_contacts=True)
    hp = init_humor(jax.random.PRNGKey(0), hcfg)

    T = 5
    true_pose = (0.2 * rng.randn(T, 72)).astype(np.float32)
    cam_t = jnp.asarray([0.0, 0.0, 8.0])
    center = jnp.asarray([112.0, 112.0])

    from nemo_tpu.geometry import batch_rodrigues, perspective_projection
    from nemo_tpu.body.smpl import smpl_forward
    rot = batch_rodrigues(jnp.asarray(true_pose.reshape(T, 24, 3)))
    _, j = smpl_forward(smpl, jnp.zeros((1, 10)), rot[:, 1:], rot[:, :1],
                        want_vertices=False)
    proj = perspective_projection(
        j[:, :25], jnp.broadcast_to(jnp.eye(3), (T, 3, 3)),
        jnp.broadcast_to(cam_t, (T, 3)), 5000.0,
        jnp.broadcast_to(center, (T, 2)))
    kp2d = jnp.concatenate([proj, jnp.ones((T, 25, 1))], -1)
    init_pose = jnp.asarray(true_pose + 0.1 * rng.randn(T, 72)
                            .astype(np.float32))

    cfg = MotionOptConfig(steps_stage1=4, steps_stage2=6, steps_stage3=4,
                          optimize_camera=True)
    out = humor_motion_fit(smpl, hp, hcfg, kp2d, init_pose, cam_t, center,
                           cfg=cfg)
    # new outputs: fitted betas, floor plane, camera
    assert out["betas"].shape == (10,)
    assert np.isfinite(np.asarray(out["betas"])).all()
    assert "floor" in out and out["floor"].shape == (3,)
    assert np.isfinite(np.asarray(out["floor"])).all()
    assert out["cam_R"].shape == (3, 3)
    # the learned rotation stays orthonormal (rot6d parameterization)
    RtR = np.asarray(out["cam_R"].T @ out["cam_R"])
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-5)
    # all three stage losses finite and stage 3 non-increasing overall
    for k in ("stage1_loss", "stage2_loss", "stage3_loss"):
        assert np.isfinite(np.asarray(out[k])).all()
    assert float(out["stage3_loss"][-1]) <= float(out["stage3_loss"][0])


def test_init_state_gmm_prior(rng, tmp_path):
    """load_init_motion_prior reads the reference's prior_gmm.npz format;
    the NLL matches an independent scipy mixture evaluation and wires into
    stage 3 (fitting_loss.py:416-429, config.py:104)."""
    from scipy.stats import multivariate_normal

    from nemo_tpu.models.humor_fit import (init_state_gmm_nll,
                                           load_init_motion_prior)

    K, D = 3, 138
    w = rng.rand(K) + 0.1
    w /= w.sum()
    means = rng.randn(K, D).astype(np.float64)
    A = rng.randn(K, D, D) * 0.05
    covs = np.einsum('kij,klj->kil', A, A) + np.eye(D)[None]
    np.savez(tmp_path / "prior_gmm.npz", weights=w, means=means,
             covariances=covs)
    prior = load_init_motion_prior(str(tmp_path))

    x = rng.randn(D).astype(np.float32)
    got = float(init_state_gmm_nll(jnp.asarray(x), prior))
    dens = sum(wk * multivariate_normal.pdf(x, m, c)
               for wk, m, c in zip(w, means, covs))
    np.testing.assert_allclose(got, -np.log(dens), rtol=1e-4)

    # wiring: the term is finite + differentiable inside the stage-3 fit
    smpl = synthetic_smpl_model(num_vertices=200, seed=0)
    hcfg = HumorConfig(latent_size=8)
    hp = init_humor(jax.random.PRNGKey(0), hcfg)
    T = 4
    kp2d = jnp.concatenate(
        [jnp.asarray(rng.uniform(0, 224, size=(T, 25, 2)), jnp.float32),
         jnp.ones((T, 25, 1))], -1)
    init_pose = jnp.asarray(0.2 * rng.randn(T, 72).astype(np.float32))
    cfg = MotionOptConfig(steps_stage1=2, steps_stage2=2, steps_stage3=3)
    out = humor_motion_fit(smpl, hp, hcfg, kp2d, init_pose,
                           jnp.asarray([0.0, 0.0, 8.0]),
                           jnp.asarray([112.0, 112.0]), cfg=cfg,
                           init_motion_prior=prior)
    assert np.isfinite(np.asarray(out["stage3_loss"])).all()


def test_lbfgs_optimizer_mode(rng):
    """cfg.optimizer='lbfgs': the reference's torch.optim.LBFGS closure
    stages (motion_optimizer.py:233-285) as optax.lbfgs scans — finite,
    and stage 2 still descends."""
    smpl = synthetic_smpl_model(num_vertices=200, seed=0)
    hcfg = HumorConfig()
    hp = init_humor(jax.random.PRNGKey(0), hcfg)
    T = 5
    true_pose = (0.2 * rng.randn(T, 72)).astype(np.float32)
    cam_t = jnp.asarray([0.0, 0.0, 8.0])
    center = jnp.asarray([112.0, 112.0])
    from nemo_tpu.geometry import batch_rodrigues, perspective_projection
    from nemo_tpu.body.smpl import smpl_forward
    rot = batch_rodrigues(jnp.asarray(true_pose.reshape(T, 24, 3)))
    _, j = smpl_forward(smpl, jnp.zeros((1, 10)), rot[:, 1:], rot[:, :1],
                        want_vertices=False)
    proj = perspective_projection(
        j[:, :25], jnp.broadcast_to(jnp.eye(3), (T, 3, 3)),
        jnp.broadcast_to(cam_t, (T, 3)), 5000.0,
        jnp.broadcast_to(center, (T, 2)))
    kp2d = jnp.concatenate([proj, jnp.ones((T, 25, 1))], -1)
    init_pose = jnp.asarray(true_pose + 0.15 * rng.randn(T, 72)
                            .astype(np.float32))
    cfg = MotionOptConfig(steps_stage1=3, steps_stage2=6, steps_stage3=3,
                          optimizer="lbfgs")
    out = humor_motion_fit(smpl, hp, hcfg, kp2d, init_pose, cam_t, center,
                           cfg=cfg)
    assert np.isfinite(np.asarray(out["pose"])).all()
    assert np.isfinite(np.asarray(out["stage2_loss"])).all()
    assert float(out["stage2_loss"][-1]) < float(out["stage2_loss"][0])
