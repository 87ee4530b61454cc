"""HuMoR evaluation harness: full-test stats, sampling, reconstruction.

Behavioral reference: humor/humor/test/test_humor.py (419 LoC) — the
config-driven harness with three modes, rebuilt as plain functions over
(N, T, 207) packed state sequences:

  * eval_full_test (:118-147): run the training step over the test set with
    ground-truth inputs and aggregate the per-batch loss/stat dict through a
    StatTracker (mean/std per stat) — `humor_eval_full_test`.
  * eval_sampling (:170-239): roll the prior out from each sequence's first
    state, multiple samples per sequence, at samp_len*30 steps
    (:181 eval_qual_samp_len) — `humor_eval_sampling` reports per-window
    sample statistics (diversity across samples, drift vs GT, prior spread)
    instead of the reference's renderings (its outputs are videos; headless
    parity is the statistics of the same rollouts).
  * eval_recon (:242-339): posterior-encode the full sequence
    (infer_global_seq :295), decode a rollout driven by the posterior-mean
    z sequence (:306-313 roll_out(z_seq=...)), and compare against GT —
    `humor_eval_recon` reports per-field reconstruction errors (trans /
    root orient / body pose / joints) the visual comparison would show.

The aggregate `humor_eval_metrics` (one_step_rec / rollout_drift /
prior_kl) is kept as the compact summary used by fit-side smoke tests.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .humor import (STATE_FIELDS, HumorConfig, Params, gaussian_kl,
                    humor_decode, humor_infer_seq, humor_posterior,
                    humor_prior, humor_roll_out, humor_train_loss,
                    split_state)


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


def humor_eval_full_test(params: Params, cfg: HumorConfig,
                         sequences: np.ndarray, key=None,
                         batch_size: int = 8,
                         kl_weight: float = 4e-4) -> Dict[str, float]:
    """Full-test-set evaluation with training-time stats (test_humor.py:
    118-147: model_class.step(..., mode='test', use_gt_p=1.0) per batch,
    aggregated by StatTracker).

    Batches the (N, T, D) windows, runs the one-step training loss on each
    with ground-truth inputs, and returns mean/std per stat plus per-field
    one-step reconstruction MSEs (the HumorLoss stats_dict breakdown).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    seqs = np.asarray(sequences)
    N, T, D = seqs.shape
    per_batch: Dict[str, list] = {}
    for i in range(0, N, batch_size):
        b = jnp.asarray(seqs[i:i + batch_size])
        past = b[:, :-1].reshape(-1, D)
        nxt = b[:, 1:].reshape(-1, D)
        key, k = jax.random.split(key)
        _, metrics = humor_train_loss(params, cfg, past, nxt, k,
                                      kl_weight=kl_weight)
        qm, _ = humor_posterior(params, cfg, past, nxt)
        pred, _c = humor_decode(params, cfg, qm, past)
        err = split_state(pred - nxt)
        for name, _d, _r in STATE_FIELDS:
            metrics[f"rec_{name}"] = (err[name] ** 2).mean()
        for k2, v in metrics.items():
            per_batch.setdefault(k2, []).append(float(v))
    out: Dict[str, float] = {}
    for k2, vals in per_batch.items():
        out[k2] = float(np.mean(vals))
        out[f"{k2}_std"] = float(np.std(vals))
    return out


def humor_eval_sampling(params: Params, cfg: HumorConfig,
                        sequences: np.ndarray, key=None,
                        num_samples: int = 3,
                        samp_len: Optional[int] = None) -> Dict[str, float]:
    """Per-window sampling statistics (test_humor.py:170-239).

    Rolls the prior out `num_samples` times from each sequence's first
    state (eval_sampling's model.roll_out per samp_idx, :224) and reports:
      sample_diversity   mean pairwise L2 between samples of one window
                         (the qualitative spread the videos show)
      sample_drift       mean L2 of samples vs GT over the overlap
      prior_std          mean predicted prior std along rollouts
      trans_travel       mean root-translation distance travelled
    samp_len defaults to T-1 (the reference uses samp_len*30 frames).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    seqs = jnp.asarray(sequences)
    N, T, D = seqs.shape
    steps = int(samp_len) if samp_len else T - 1
    rolls = []
    prior_std = []
    for s in range(num_samples):
        key, k = jax.random.split(key)
        r = humor_roll_out(params, cfg, seqs[:, 0], steps, key=k)
        rolls.append(np.asarray(r["states"]))                # (N, steps, D)
        prior_std.append(float(jnp.sqrt(r["prior_var"]).mean()))
    rolls_np = np.stack(rolls)                               # (S, N, steps, D)

    div = []
    for a in range(num_samples):
        for b in range(a + 1, num_samples):
            div.append(np.sqrt(((rolls_np[a] - rolls_np[b]) ** 2
                                ).sum(-1)).mean())
    overlap = min(steps, T - 1)
    gt = np.asarray(seqs[:, 1:overlap + 1])
    drift = np.sqrt(((rolls_np[:, :, :overlap] - gt[None]) ** 2
                     ).sum(-1)).mean()
    trans = rolls_np[..., :3]                                # trans field
    travel = np.sqrt(((trans[:, :, -1] - trans[:, :, 0]) ** 2).sum(-1)).mean()
    return {
        "sample_diversity": float(np.mean(div)) if div else 0.0,
        "sample_drift": float(drift),
        "prior_std": float(np.mean(prior_std)),
        "trans_travel": float(travel),
        "num_samples": float(num_samples),
        "samp_len": float(steps),
    }


def humor_eval_recon(params: Params, cfg: HumorConfig,
                     sequences: np.ndarray) -> Dict[str, float]:
    """Reconstruction evaluation (test_humor.py:242-339): encode the full
    sequence with the posterior (infer_global_seq, :295), decode a rollout
    driven by the posterior-MEAN z sequence from the first state
    (roll_out(z_seq=latent_z_seq), :306-313), and report per-field errors
    between the reconstruction and GT — the quantitative content of the
    reference's side-by-side GT/recon renders.
    """
    seqs = jnp.asarray(sequences)
    N, T, D = seqs.shape
    enc = humor_infer_seq(params, cfg, seqs)                 # (N, T-1, L)
    recon = humor_roll_out(params, cfg, seqs[:, 0], T - 1,
                           z_seq=enc["z_mean"])
    pred = recon["states"]                                   # (N, T-1, D)
    gt = seqs[:, 1:]
    out = {"recon_l2": float(jnp.sqrt(((pred - gt) ** 2).sum(-1)).mean()),
           "posterior_kl": float(enc["kl"].mean())}
    perr = split_state(pred - gt)
    for name, _d, _r in STATE_FIELDS:
        out[f"recon_{name}"] = float(
            jnp.sqrt((perr[name] ** 2).sum(-1)).mean())
    return out
