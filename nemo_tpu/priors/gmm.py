"""GMM max-mixture pose prior.

Behavioral reference: /root/reference/hmr/smplify/prior.py:100-196
(MaxMixturePrior with use_merged=True — the path NeMo uses). The prior is a
set of frozen arrays (means, precisions, nll weights) applied as one einsum +
min; loading happens once on the host.
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class GMMPrior:
    means: jnp.ndarray        # (M, 69)
    precisions: jnp.ndarray   # (M, 69, 69)
    nll_weights: jnp.ndarray  # (1, M)

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]


jax.tree_util.register_pytree_node(
    GMMPrior,
    lambda p: ((p.means, p.precisions, p.nll_weights), None),
    lambda _, c: GMMPrior(*c),
)


def _build(means: np.ndarray, covs: np.ndarray,
           weights: np.ndarray) -> GMMPrior:
    """Precompute precisions and normalized NLL weights (prior.py:142-160)."""
    means = means.astype(np.float32)
    covs = covs.astype(np.float64)
    precisions = np.stack([np.linalg.inv(c) for c in covs]).astype(np.float32)
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
    D = means.shape[1]
    const = (2 * np.pi) ** (D / 2.0)
    nll_weights = (weights / (const * (sqrdets / sqrdets.min()))).astype(
        np.float32)[None]
    return GMMPrior(means=jnp.asarray(means),
                    precisions=jnp.asarray(precisions),
                    nll_weights=jnp.asarray(nll_weights))


def load_gmm_prior(path: str) -> GMMPrior:
    """Load a SPIN gmm_08.pkl (dict or sklearn GMM pickle)."""
    with open(path, "rb") as f:
        gmm = pickle.load(f, encoding="latin1")
    if isinstance(gmm, dict):
        means, covs, weights = gmm["means"], gmm["covars"], gmm["weights"]
    else:  # sklearn.mixture GMM object
        means, covs, weights = gmm.means_, gmm.covars_, gmm.weights_
    return _build(np.asarray(means), np.asarray(covs), np.asarray(weights))


def synthetic_gmm_prior(num_gaussians: int = 8, dim: int = 69,
                        seed: int = 0) -> GMMPrior:
    """Deterministic synthetic prior for tests/benchmarks (no SPIN data)."""
    rng = np.random.RandomState(seed)
    means = 0.3 * rng.randn(num_gaussians, dim)
    A = 0.1 * rng.randn(num_gaussians, dim, dim)
    covs = np.einsum('mij,mkj->mik', A, A) + 0.5 * np.eye(dim)
    weights = rng.dirichlet(np.ones(num_gaussians))
    return _build(means, covs, weights)


def gmm_log_likelihood(prior: GMMPrior, pose: jnp.ndarray,
                       betas: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Merged max-mixture NLL (prior.py:181-196).

    pose: (B, 69). Returns (B,): min over components of
    0.5 * (x-mu)^T P (x-mu) - log(nll_weight).
    """
    del betas  # unused, kept for signature parity with the reference
    diff = pose[:, None, :] - prior.means[None]               # (B, M, D)
    pd = jnp.einsum('mij,bmj->bmi', prior.precisions, diff, precision=HI)
    quad = jnp.sum(pd * diff, axis=-1)                        # (B, M)
    nll = 0.5 * quad - jnp.log(prior.nll_weights)
    return jnp.min(nll, axis=1)
