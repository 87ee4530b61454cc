"""Tests for the pose priors: GMoF, GMM max-mixture, VPoser."""

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.priors import (
    angle_prior, gmof, gmm_log_likelihood, synthetic_gmm_prior,
    convert_torch_state_dict, init_vposer, vposer_decode, vposer_encode,
    vposer_kl_to_std_normal,
)


class TestGMoF:
    def test_formula(self, rng):
        r = rng.randn(4, 25, 2).astype(np.float32)
        out = np.asarray(gmof(jnp.asarray(r), rho=100.0))
        want = 100.0 ** 2 * (r ** 2) / (r ** 2 + 100.0 ** 2)
        np.testing.assert_allclose(out, want, rtol=1e-5)

    def test_sqrt_variant(self, rng):
        r = rng.randn(4, 25, 2).astype(np.float32)
        out = np.asarray(gmof(jnp.asarray(r), rho=100.0, sqrt=True))
        n = np.sqrt((r ** 2).sum(-1, keepdims=True))
        want = 100.0 ** 2 * n / (n + 100.0 ** 2)
        np.testing.assert_allclose(out, want, rtol=1e-5)
        assert out.shape == (4, 25, 1)

    def test_bounded_by_rho_sq(self, rng):
        r = 1e6 * rng.randn(10).astype(np.float32)
        out = np.asarray(gmof(jnp.asarray(r), rho=100.0))
        assert (out <= 100.0 ** 2 + 1e-3).all()


class TestAnglePrior:
    def test_shape_and_direction(self):
        pose = jnp.zeros((2, 69))
        out = np.asarray(angle_prior(pose))
        assert out.shape == (2, 4)
        np.testing.assert_allclose(out, 1.0)  # exp(0)^2
        # bending the right knee the wrong way (idx 52 positive) raises it
        pose2 = pose.at[:, 52].set(1.0)
        out2 = np.asarray(angle_prior(pose2))
        assert (out2[:, 0] > out[:, 0]).all()


class TestGMM:
    def test_nll_matches_manual(self, rng):
        prior = synthetic_gmm_prior(num_gaussians=4, dim=69, seed=1)
        pose = rng.randn(6, 69).astype(np.float32)
        got = np.asarray(gmm_log_likelihood(prior, jnp.asarray(pose)))

        means = np.asarray(prior.means, np.float64)
        precs = np.asarray(prior.precisions, np.float64)
        w = np.asarray(prior.nll_weights, np.float64)[0]
        want = []
        for b in range(6):
            comps = []
            for m in range(4):
                d = pose[b] - means[m]
                comps.append(0.5 * d @ precs[m] @ d - np.log(w[m]))
            want.append(min(comps))
        np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_min_at_mean(self):
        prior = synthetic_gmm_prior(num_gaussians=3, dim=69, seed=2)
        at_mean = float(gmm_log_likelihood(prior, prior.means[:1])[0])
        away = float(gmm_log_likelihood(prior, prior.means[:1] + 5.0)[0])
        assert at_mean < away

    def test_grad_finite(self):
        prior = synthetic_gmm_prior(num_gaussians=2, dim=69)
        g = jax.grad(lambda p: jnp.sum(gmm_log_likelihood(prior, p)))(
            jnp.zeros((2, 69)))
        assert np.isfinite(np.asarray(g)).all()


class TestVPoser:
    def test_encode_decode_shapes(self):
        p = init_vposer(jax.random.PRNGKey(0))
        pose = jax.random.normal(jax.random.PRNGKey(1), (5, 63)) * 0.2
        mu, scale = vposer_encode(p, pose)
        assert mu.shape == (5, 32) and scale.shape == (5, 32)
        assert (np.asarray(scale) > 0).all()
        dec = vposer_decode(p, mu)
        assert dec["pose_body"].shape == (5, 21, 3)
        assert dec["pose_body_matrot"].shape == (5, 21, 9)
        # decoded matrots are valid rotations
        R = np.asarray(dec["pose_body_matrot"]).reshape(-1, 3, 3)
        eye = np.einsum('bij,bkj->bik', R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-4)

    def test_kl_zero_for_standard_normal(self):
        mu = jnp.zeros((3, 32))
        scale = jnp.ones((3, 32))
        assert abs(float(vposer_kl_to_std_normal(mu, scale))) < 1e-6

    def test_kl_manual(self, rng):
        mu = jnp.asarray(rng.randn(2, 32).astype(np.float32))
        scale = jnp.asarray(np.abs(rng.randn(2, 32)).astype(np.float32) + 0.1)
        got = float(vposer_kl_to_std_normal(mu, scale))
        m, s = np.asarray(mu, np.float64), np.asarray(scale, np.float64)
        want = (-np.log(s) + (s ** 2 + m ** 2) / 2 - 0.5).sum(1).mean()
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_torch_conversion_matches_torch(self):
        """Golden test: random torch VPoser vs converted JAX weights."""
        torch = __import__("torch")
        nn = torch.nn

        class NormalHead(nn.Module):
            def __init__(self, n, d):
                super().__init__()
                self.mu = nn.Linear(n, d)
                self.logvar = nn.Linear(n, d)

        n, d = 512, 32
        enc = nn.Sequential(
            nn.Flatten(), nn.BatchNorm1d(63), nn.Linear(63, n),
            nn.LeakyReLU(), nn.BatchNorm1d(n), nn.Dropout(0.1),
            nn.Linear(n, n), nn.Linear(n, n))
        head = NormalHead(n, d)
        dec = nn.Sequential(
            nn.Linear(d, n), nn.LeakyReLU(), nn.Dropout(0.1),
            nn.Linear(n, n), nn.LeakyReLU(), nn.Linear(n, 21 * 6))
        # randomize BN running stats to catch stat-mapping bugs
        with torch.no_grad():
            for m in enc.modules():
                if isinstance(m, nn.BatchNorm1d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.5, 1.5)
        enc.eval(), dec.eval()

        sd = {}
        for i, mod in enumerate(enc):
            for k, v in mod.state_dict().items():
                sd[f"encoder_net.{i}.{k}"] = v
        for k, v in head.state_dict().items():
            sd[f"encoder_net.8.{k}"] = v
        for i, mod in enumerate(dec):
            for k, v in mod.state_dict().items():
                sd[f"decoder_net.{i}.{k}"] = v

        params = convert_torch_state_dict(sd)

        x = torch.randn(4, 63) * 0.3
        with torch.no_grad():
            h = enc(x)
            mu_t = head.mu(h).numpy()
            scale_t = torch.nn.functional.softplus(head.logvar(h)).numpy()
            dec6d_t = dec(torch.tensor(mu_t)).numpy()

        mu_j, scale_j = vposer_encode(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(mu_j), mu_t, atol=2e-4)
        np.testing.assert_allclose(np.asarray(scale_j), scale_t, atol=2e-4)

        # decoder pre-rotation output
        z = jnp.asarray(mu_t)
        p = params
        h1 = jax.nn.leaky_relu(z @ p["dec_w1"] + p["dec_b1"], 0.01)
        h2 = jax.nn.leaky_relu(h1 @ p["dec_w2"] + p["dec_b2"], 0.01)
        out6d = h2 @ p["dec_w3"] + p["dec_b3"]
        np.testing.assert_allclose(np.asarray(out6d), dec6d_t, atol=2e-3)


def test_prepare_vposer_dataset(tmp_path):
    """AMASS split prep: middle-window trim + keep-rate subsample into
    sharded pose_body/root_orient banks (prepare_data.py:69-133)."""
    import numpy as np

    from nemo_tpu.data.sharded import ShardedDataset
    from nemo_tpu.priors.vposer_train import prepare_vposer_dataset

    rng = np.random.RandomState(0)
    amass = tmp_path / "amass"
    for ds, subj in [("CMU", "01"), ("KIT", "05")]:
        d = amass / ds / subj
        d.mkdir(parents=True)
        np.savez(d / f"{subj}_poses.npz",
                 poses=rng.randn(200, 156).astype(np.float32))
    out = tmp_path / "vposer_ds"
    counts = prepare_vposer_dataset(
        str(out), {"train": ["CMU"], "vald": ["KIT"]}, str(amass))
    # keep_rate 0.3 * 0.8 * 200 = 48 frames per file
    assert counts == {"train": 48, "vald": 48}
    from nemo_tpu.data.sharded import batch_iterator
    ds = ShardedDataset(str(out / "train"))
    assert len(ds) == 48
    batch = next(batch_iterator(ds, 10, epochs=1))
    assert batch["pose_body"].shape == (10, 63)
    assert batch["root_orient"].shape == (10, 3)
