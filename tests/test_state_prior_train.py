"""HuMoR init-state GMM prior training (EM) tests.

Pinned against sklearn's GaussianMixture — the exact engine the reference
train_state_prior.py:99-112 uses — on synthetic mixtures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.models.humor_fit import (init_state_gmm_nll,
                                       load_init_motion_prior)
from nemo_tpu.models.humor_state_prior import (fit_state_prior_gmm,
                                               save_state_prior_gmm,
                                               states_from_sequences)


def _mixture_data(rng, n=1500, d=5):
    means = np.array([[4.0] * d, [-4.0] * d, [4.0, -4.0] * (d // 2) + [0.0]
                      * (d % 2)])
    weights = np.array([0.5, 0.3, 0.2])
    comps = rng.choice(3, size=n, p=weights)
    x = means[comps] + rng.standard_normal((n, d)) * 0.7
    return x.astype(np.float32), means, weights


class TestStatePriorGmm:
    def test_em_recovers_mixture(self):
        rng = np.random.default_rng(0)
        x, true_means, true_weights = _mixture_data(rng)
        gmm, ll = fit_state_prior_gmm(jnp.asarray(x), n_components=3,
                                      n_iter=60, key=jax.random.PRNGKey(0))
        ll = np.asarray(ll)
        # EM monotonicity (tiny f32 slack)
        assert np.all(np.diff(ll) > -1e-3), "log-likelihood decreased"

        means = np.asarray(gmm["means"])
        weights = np.asarray(gmm["weights"])
        # match recovered components to truth by nearest mean
        order = [int(np.argmin(np.linalg.norm(means - m, axis=1)))
                 for m in true_means]
        assert sorted(order) == [0, 1, 2], "component collapse"
        for m, o in zip(true_means, order):
            assert np.linalg.norm(means[o] - m) < 0.3
        np.testing.assert_allclose(weights[order], true_weights, atol=0.05)

    def test_matches_sklearn_likelihood(self):
        from sklearn.mixture import GaussianMixture
        rng = np.random.default_rng(1)
        x, _, _ = _mixture_data(rng, n=1000)
        gmm, ll = fit_state_prior_gmm(jnp.asarray(x), n_components=3,
                                      n_iter=80, key=jax.random.PRNGKey(1))
        sk = GaussianMixture(n_components=3, covariance_type="full",
                             reg_covar=1e-6, max_iter=200,
                             random_state=0).fit(x)
        # same model family + converged EM: achieved mean log-likelihood
        # must match sklearn's to ~1%
        assert float(ll[-1]) == pytest.approx(float(sk.score(x)), rel=0.01)

    def test_save_load_roundtrip_nll(self, tmp_path):
        from sklearn.mixture import GaussianMixture
        rng = np.random.default_rng(2)
        x, _, _ = _mixture_data(rng, n=800)
        gmm, _ = fit_state_prior_gmm(jnp.asarray(x), n_components=3,
                                     n_iter=60, key=jax.random.PRNGKey(2))
        path = str(tmp_path / "prior_gmm.npz")
        save_state_prior_gmm(path, gmm)
        prior = load_init_motion_prior(path)
        nll = np.asarray(jax.vmap(init_state_gmm_nll, in_axes=(0, None))(
            jnp.asarray(x[:50]), prior))

        sk = GaussianMixture(n_components=3, covariance_type="full")
        sk.weights_ = np.asarray(gmm["weights"], np.float64)
        sk.means_ = np.asarray(gmm["means"], np.float64)
        sk.covariances_ = np.asarray(gmm["covariances"], np.float64)
        # sklearn stores L^{-T} (cov_chol solve), NOT cholesky(precision)
        sk.precisions_cholesky_ = np.linalg.inv(
            np.linalg.cholesky(sk.covariances_)).transpose(0, 2, 1)
        np.testing.assert_allclose(nll, -sk.score_samples(x[:50]),
                                   rtol=1e-4)

    def test_states_from_sequences(self):
        seqs = jnp.asarray(np.random.default_rng(3)
                           .standard_normal((2, 4, 207)).astype(np.float32))
        states = states_from_sequences(seqs)
        assert states.shape == (8, 138)
        # field order: joints(66) joints_vel(66) trans_vel(3)
        # root_orient_vel(3) — train_state_prior.py:89
        from nemo_tpu.models.humor import split_state
        d = split_state(seqs.reshape(8, 207))
        np.testing.assert_array_equal(np.asarray(states[:, :66]),
                                      np.asarray(d["joints"]))
        np.testing.assert_array_equal(np.asarray(states[:, 132:135]),
                                      np.asarray(d["trans_vel"]))
