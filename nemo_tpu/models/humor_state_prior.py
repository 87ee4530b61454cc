"""HuMoR initial-state GMM prior training (EM), functional JAX.

Behavioral reference: humor/humor/train/train_state_prior.py:33-130 —
collect initial states (joints + joints_vel + trans_vel +
root_orient_vel, D=138) from AMASS and fit a 12-component
full-covariance GaussianMixture (sklearn, :99-123), saving
prior_gmm.npz {weights, means, covariances} which run_fitting.py:252-262
loads as the stage-3 init-state prior (`load_init_motion_prior` /
`init_state_gmm_nll` in models/humor_fit.py consume the same file).

TPU-first: the reference defers to sklearn's CPU EM; here EM is a
lax.scan whose E-step is batched Cholesky whitening (one triangular
solve per component, vmapped) and whose M-step is a pair of einsum
contractions — the N x K x D work lands on the MXU and the whole fit
jits once. k-means++ seeding + a few Lloyd iterations reproduce
sklearn's default 'kmeans' initialization behavior.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LOG2PI = float(np.log(2.0 * np.pi))


def _component_log_prob(x: jnp.ndarray, means: jnp.ndarray,
                        chols: jnp.ndarray) -> jnp.ndarray:
    """log N(x | mu_k, L_k L_k^T) for all (n, k). x: (N, D); means: (K, D);
    chols: (K, D, D) lower. Returns (N, K)."""
    D = x.shape[1]

    def one(mu, L):
        diff = x - mu  # (N, D)
        y = jax.scipy.linalg.solve_triangular(L, diff.T, lower=True)  # (D,N)
        maha = jnp.sum(y * y, axis=0)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return -0.5 * (D * _LOG2PI + logdet + maha)

    return jax.vmap(one)(means, chols).T


def _kmeans_init(key, x: jnp.ndarray, k: int, lloyd_iters: int = 10
                 ) -> jnp.ndarray:
    """k-means++ seeding + Lloyd refinement (sklearn's default GMM init)."""
    N = x.shape[0]
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, N)]
    centers = jnp.zeros((k, x.shape[1])).at[0].set(first)

    def seed_step(i, carry):
        centers, key = carry
        d2 = jnp.min(jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2,
                             axis=-1)
                     + jnp.where(jnp.arange(k)[None, :] < i, 0.0, jnp.inf),
                     axis=1)
        key, kc = jax.random.split(key)
        idx = jax.random.categorical(kc, jnp.log(d2 + 1e-12))
        return centers.at[i].set(x[idx]), key

    centers, _ = jax.lax.fori_loop(1, k, seed_step, (centers, key))

    def lloyd(centers, _):
        d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k)  # (N, K)
        cnt = onehot.sum(0)
        new = (onehot.T @ x) / jnp.maximum(cnt, 1.0)[:, None]
        new = jnp.where(cnt[:, None] > 0, new, centers)
        return new, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=lloyd_iters)
    return centers


def fit_state_prior_gmm(states: jnp.ndarray, n_components: int = 12,
                        n_iter: int = 100, key=None,
                        reg_covar: float = 1e-6
                        ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Fit a full-covariance GMM to (N, D) states by EM.

    Mirrors train_state_prior.py:99-112 (GaussianMixture(n_components=12,
    covariance_type='full', max_iter=200, init kmeans, reg 1e-6)).
    Returns ({'weights' (K,), 'means' (K, D), 'covariances' (K, D, D)},
    per-iteration mean log-likelihood curve).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    x = jnp.asarray(states, jnp.float32)
    N, D = x.shape
    K = n_components
    eye = jnp.eye(D)

    means = _kmeans_init(key, x, K)
    weights = jnp.full((K,), 1.0 / K)
    # initial covariances from the hard k-means assignment spread
    var0 = jnp.maximum(x.var(axis=0).mean(), 1e-3)
    covs = jnp.tile((var0 * eye)[None], (K, 1, 1))

    def em_step(carry, _):
        weights, means, covs = carry
        chols = jnp.linalg.cholesky(covs)
        log_prob = _component_log_prob(x, means, chols)  # (N, K)
        log_w = jnp.log(weights)[None, :]
        joint = log_prob + log_w
        norm = jax.scipy.special.logsumexp(joint, axis=1, keepdims=True)
        resp = jnp.exp(joint - norm)  # (N, K)
        ll = norm.mean()

        nk = resp.sum(0) + 1e-10  # (K,)
        new_means = (resp.T @ x) / nk[:, None]
        diff = x[:, None, :] - new_means[None, :, :]  # (N, K, D)
        wd = resp[:, :, None] * diff
        new_covs = (jnp.einsum("nkd,nke->kde", wd, diff)
                    / nk[:, None, None] + reg_covar * eye[None])
        new_weights = nk / nk.sum()
        return (new_weights, new_means, new_covs), ll

    (weights, means, covs), ll_curve = jax.lax.scan(
        em_step, (weights, means, covs), None, length=n_iter)
    return ({"weights": weights, "means": means, "covariances": covs},
            ll_curve)


def save_state_prior_gmm(path: str, gmm: Dict[str, jnp.ndarray]) -> None:
    """Write prior_gmm.npz exactly as train_state_prior.py:123 does, in
    the layout models/humor_fit.py:load_init_motion_prior reads."""
    np.savez(path, weights=np.asarray(gmm["weights"], np.float64),
             means=np.asarray(gmm["means"], np.float64),
             covariances=np.asarray(gmm["covariances"], np.float64))


def states_from_sequences(seqs: jnp.ndarray) -> jnp.ndarray:
    """Extract init-state prior features from packed (B, T, 207) HuMoR
    state sequences: each frame contributes (joints 66, joints_vel 66,
    trans_vel 3, root_orient_vel 3) -> (B*T, 138), the field set
    train_state_prior.py:92-97 concatenates."""
    from .humor import split_state
    d = split_state(seqs.reshape(-1, seqs.shape[-1]))
    return jnp.concatenate([d["joints"], d["joints_vel"], d["trans_vel"],
                            d["root_orient_vel"]], axis=-1)
