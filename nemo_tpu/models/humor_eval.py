"""HuMoR evaluation harness: sampling / reconstruction metrics.

Behavioral reference: humor/humor/test/test_humor.py (419 LoC) — an
evaluation harness over AMASS-style sequences reporting one-step
reconstruction error, rollout drift, and prior-sample statistics. Config
driven there; a plain function here.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .humor import (HumorConfig, Params, humor_posterior, humor_prior,
                    humor_decode, humor_roll_out, gaussian_kl)


def humor_eval_metrics(params: Params, cfg: HumorConfig,
                       sequences: np.ndarray, key=None,
                       rollout_steps: int = 10) -> Dict[str, float]:
    """Evaluate a trained HuMoR model on (N, T, D) state sequences.

    Reports:
      one_step_rec    mean L2 of posterior-mean one-step reconstruction
      rollout_drift   mean L2 between a `rollout_steps` prior rollout and GT
      prior_kl        mean KL(posterior || prior) over transitions
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    seqs = jnp.asarray(sequences)
    N, T, D = seqs.shape
    past = seqs[:, :-1].reshape(N * (T - 1), D)
    nxt = seqs[:, 1:].reshape(N * (T - 1), D)

    qm, qv = humor_posterior(params, cfg, past, nxt)
    pm, pv = humor_prior(params, cfg, past)
    pred, _ = humor_decode(params, cfg, qm, past)  # posterior-mean decode
    one_step = jnp.sqrt(((pred - nxt) ** 2).sum(-1)).mean()
    kl = gaussian_kl(qm, qv, pm, pv)

    steps = min(rollout_steps, T - 1)
    roll = humor_roll_out(params, cfg, seqs[:, 0], steps, key=key,
                          use_mean=True)
    drift = jnp.sqrt(((roll["states"] - seqs[:, 1:steps + 1]) ** 2
                      ).sum(-1)).mean()
    return {"one_step_rec": float(one_step),
            "rollout_drift": float(drift),
            "prior_kl": float(kl)}
