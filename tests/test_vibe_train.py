"""VIBE training machinery tests: discriminator, adversarial losses."""

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.models import (
    init_motion_discriminator, make_discriminator_train_step,
    motion_discriminator, vibe_discriminator_loss, vibe_generator_loss,
)


class TestMotionDiscriminator:
    def test_shapes(self):
        p = init_motion_discriminator(jax.random.PRNGKey(0), input_size=69,
                                      rnn_size=64)
        seq = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 69))
        out = motion_discriminator(p, seq)
        assert out.shape == (4, 2)

    def test_discriminator_learns_to_separate(self, rng):
        p = init_motion_discriminator(jax.random.PRNGKey(0), input_size=8,
                                      rnn_size=32)
        real = jnp.asarray(
            (np.sin(np.linspace(0, 6, 10))[None, :, None]
             * np.ones((8, 10, 8))).astype(np.float32))
        fake = jnp.asarray(rng.randn(8, 10, 8).astype(np.float32) * 3)
        opt, step = make_discriminator_train_step(lr=3e-3)
        state = opt.init(p)
        losses = []
        for _ in range(60):
            p, state, loss = step(p, state, real, fake)
            losses.append(float(loss))
        assert min(losses[-5:]) < losses[0]

    def test_generator_loss_terms(self, rng):
        B, T = 2, 5
        pred = {
            "kp_2d": jnp.asarray(rng.randn(B, T, 49, 2).astype(np.float32)),
            "kp_3d": jnp.asarray(rng.randn(B, T, 14, 3).astype(np.float32)),
            "pose": jnp.asarray(rng.randn(B, T, 72).astype(np.float32)),
            "betas": jnp.asarray(rng.randn(B, T, 10).astype(np.float32)),
            "pose_body_seq": jnp.asarray(
                rng.randn(B, T, 69).astype(np.float32)),
        }
        target = {
            "kp_2d": jnp.concatenate(
                [pred["kp_2d"], jnp.ones((B, T, 49, 1))], -1),
            "kp_3d": pred["kp_3d"],
            "pose": pred["pose"],
            "betas": pred["betas"],
        }
        disc = init_motion_discriminator(jax.random.PRNGKey(0),
                                         input_size=69, rnn_size=32)
        loss, metrics = vibe_generator_loss(pred, target, disc)
        # supervised terms vanish for perfect predictions
        assert float(metrics["loss_kp_2d"]) < 1e-8
        assert float(metrics["loss_kp_3d"]) < 1e-8
        assert float(metrics["loss_pose"]) < 1e-8
        assert "loss_adv" in metrics
        assert np.isfinite(float(loss))

    def test_disc_loss_grad_not_into_generator(self, rng):
        disc = init_motion_discriminator(jax.random.PRNGKey(0),
                                         input_size=4, rnn_size=16)
        fake = jnp.asarray(rng.randn(2, 6, 4).astype(np.float32))

        def f(fake):
            real = jnp.zeros((2, 6, 4))
            return vibe_discriminator_loss(disc, real, fake)
        g = jax.grad(f)(fake)
        np.testing.assert_allclose(np.asarray(g), 0.0)  # stop_gradient works
