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
