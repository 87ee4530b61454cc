"""VIBE training machinery: losses + motion discriminator + train steps.

Behavioral reference: VIBE/lib/core/loss.py (VIBELoss: 2D/3D keypoint MSE,
SMPL pose/shape losses, adversarial term), VIBE/lib/models/motion_
discriminator.py:24-79 (GRU + avg/max-pool 'concat' head judging AMASS-real
vs generated pose sequences), VIBE/lib/core/trainer.py (alternating
generator/discriminator updates).

TPU-native: both updates are jitted; the discriminator GRU runs as a
lax.scan over time; generator and discriminator train steps can be fused
into one program per batch.
"""

from __future__ import annotations

import dataclasses
import os.path as osp
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .vibe import Params, gru_cell, init_gru


# ---------------------------------------------------------------------------
# motion discriminator
# ---------------------------------------------------------------------------

def init_self_attention(key, attention_size: int = 1024,
                        layers: int = 1) -> Params:
    """SelfAttention pool parameters (VIBE/lib/models/attention.py:25-53).

    `layers - 1` (Linear size->size, tanh, dropout) blocks followed by a
    final (Linear size->1, tanh, dropout); weights init uniform(-0.1, 0.1),
    biases 0.01 (init_weights, attention.py:20-23).
    """
    keys = jax.random.split(key, layers)
    mlp = []
    for i in range(layers):
        out = attention_size if i < layers - 1 else 1
        mlp.append({
            "w": jax.random.uniform(keys[i], (attention_size, out),
                                    minval=-0.1, maxval=0.1),
            "b": jnp.full((out,), 0.01),
        })
    return {"mlp": tuple(mlp)}


def _dropout(x, rate, rng):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def self_attention(p: Params, inputs: jnp.ndarray, dropout: float = 0.0,
                   rng=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Learned per-frame softmax pooling (attention.py:55-78).

    inputs: (B, T, H) -> ((B, H) weighted sum, (B, T) attention weights).
    Dropout follows each tanh like the reference's nn.Dropout modules
    (train-time only: pass a PRNG key and rate > 0).
    """
    x = inputs
    for layer in p["mlp"]:
        x = jnp.tanh(x @ layer["w"] + layer["b"])
        if dropout > 0.0 and rng is not None:
            rng, sub = jax.random.split(rng)
            x = _dropout(x, dropout, sub)
    scores = jax.nn.softmax(x[..., 0], axis=-1)               # (B, T)
    return jnp.einsum('bth,bt->bh', inputs, scores), scores


def init_motion_discriminator(key, input_size: int = 69,
                              rnn_size: int = 1024,
                              output_size: int = 2,
                              feature_pool: str = "concat",
                              num_layers: int = 1,
                              attention_size: int = 1024,
                              attention_layers: int = 1) -> Params:
    """MotionDiscriminator parameters (motion_discriminator.py:25-56).

    feature_pool 'concat' (avg+max over relu'd GRU outputs) or 'attention'
    (the SelfAttention pool both shipped training configs use,
    VIBE/configs/config.yaml:44). num_layers stacks GRU layers like
    torch.nn.GRU(num_layers=) — the shipped configs use 2 (:43).
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    linear_size = 2 * rnn_size if feature_pool == "concat" else rnn_size
    s = 1.0 / np.sqrt(linear_size)
    p = {
        "gru": init_gru(k1, input_size, rnn_size),
        "fc_w": jax.random.uniform(k2, (linear_size, output_size),
                                   minval=-s, maxval=s),
        "fc_b": jax.random.uniform(k3, (output_size,), minval=-s, maxval=s),
    }
    if num_layers > 1:
        p["gru_extra"] = tuple(
            init_gru(k, rnn_size, rnn_size)
            for k in jax.random.split(k4, num_layers - 1))
    if feature_pool == "attention":
        if attention_size != rnn_size:
            raise ValueError(
                "the attention MLP consumes GRU outputs directly, so "
                f"attention_size ({attention_size}) must equal rnn_size "
                f"({rnn_size}) — same constraint as the reference")
        p["att"] = init_self_attention(k5, attention_size, attention_layers)
    elif feature_pool != "concat":
        raise ValueError(f"unknown feature_pool {feature_pool!r}")
    return p


def _gru_outputs(p: Params, seq: jnp.ndarray) -> jnp.ndarray:
    """Run the (possibly stacked) discriminator GRU: (B, T, D) -> (B, T, H)."""
    B = seq.shape[0]
    xs = jnp.swapaxes(seq, 0, 1)                              # (T, B, D)
    for layer in (p["gru"],) + tuple(p.get("gru_extra", ())):
        h0 = jnp.zeros((B, layer["w_hh"].shape[0]))

        def step(h, x_t, _layer=layer):
            h = gru_cell(_layer, x_t, h)
            return h, h

        _, xs = jax.lax.scan(step, h0, xs)                    # (T, B, H)
    return jnp.swapaxes(xs, 0, 1)                             # (B, T, H)


def motion_discriminator(p: Params, seq: jnp.ndarray, dropout: float = 0.0,
                         rng=None) -> jnp.ndarray:
    """(B, T, D) pose sequences -> (B, 2) real/fake logits.

    'concat' pool: relu(GRU outputs), then avg+max pool over time
    (motion_discriminator.py:67-71). 'attention' pool (selected by the
    presence of the 'att' params): SelfAttention softmax-weighted sum of the
    raw GRU outputs (:72-75 — note no relu on this path).
    """
    ys = _gru_outputs(p, seq)                                 # (B, T, H)
    if "att" in p:
        y, _scores = self_attention(p["att"], ys, dropout, rng)
        return y @ p["fc_w"] + p["fc_b"]
    ys = jax.nn.relu(ys)
    pooled = jnp.concatenate([ys.mean(axis=1), ys.max(axis=1)], axis=1)
    return pooled @ p["fc_w"] + p["fc_b"]


# ---------------------------------------------------------------------------
# VIBE loss (lib/core/loss.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VibeLossWeights:
    kp_2d: float = 300.0
    kp_3d: float = 300.0
    pose: float = 60.0
    shape: float = 0.06
    adv: float = 2.0
    disc_motion_lr: float = 1e-4


def vibe_generator_loss(pred: Dict[str, jnp.ndarray],
                        target: Dict[str, jnp.ndarray],
                        disc_params: Optional[Params],
                        w: VibeLossWeights = VibeLossWeights(),
                        disc_dropout: float = 0.0, rng=None
                        ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Supervised keypoint/SMPL losses + adversarial generator term.

    pred/target dicts use (B, T, ...) arrays:
      'kp_2d' (B,T,49,3 target w/conf; pred (B,T,49,2)), 'kp_3d' (B,T,14,3),
      'pose' (B,T,72), 'betas' (B,T,10), masks 'has_3d' (B,T).
    """
    metrics = {}
    loss = jnp.zeros(())

    conf = target["kp_2d"][..., 2:]
    l2d = (conf * (pred["kp_2d"] - target["kp_2d"][..., :2]) ** 2).mean()
    metrics["loss_kp_2d"] = l2d
    loss += w.kp_2d * l2d

    if "kp_3d" in target:
        has3d = target.get("has_3d", jnp.ones(target["kp_3d"].shape[:2]))
        # root-center both (pelvis = mean of hips, VIBE convention)
        def center(j):
            pelvis = (j[..., 2:3, :] + j[..., 3:4, :]) / 2
            return j - pelvis
        l3d = (has3d[..., None, None] *
               (center(pred["kp_3d"]) - center(target["kp_3d"])) ** 2).mean()
        metrics["loss_kp_3d"] = l3d
        loss += w.kp_3d * l3d

    if "pose" in target:
        has_smpl = target.get("has_smpl", jnp.ones(target["pose"].shape[:2]))
        lpose = (has_smpl[..., None] *
                 (pred["pose"] - target["pose"]) ** 2).mean()
        lshape = (has_smpl[..., None] *
                  (pred["betas"] - target["betas"]) ** 2).mean()
        metrics["loss_pose"] = lpose
        metrics["loss_shape"] = lshape
        loss += w.pose * lpose + w.shape * lshape

    if disc_params is not None:
        logits = motion_discriminator(disc_params, pred["pose_body_seq"],
                                      disc_dropout, rng)
        # generator wants the discriminator to label it real (index 1)
        ladv = ((logits[:, 0]) ** 2 + (logits[:, 1] - 1.0) ** 2).mean()
        metrics["loss_adv"] = ladv
        loss += w.adv * ladv

    metrics["loss_total"] = loss
    return loss, metrics


def vibe_discriminator_loss(disc_params: Params, real_seq: jnp.ndarray,
                            fake_seq: jnp.ndarray, dropout: float = 0.0,
                            rng=None) -> jnp.ndarray:
    """LSGAN discriminator objective over pose sequences."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    real_logits = motion_discriminator(disc_params, real_seq, dropout, r1)
    fake_logits = motion_discriminator(disc_params,
                                       jax.lax.stop_gradient(fake_seq),
                                       dropout, r2)
    l_real = ((real_logits[:, 1] - 1.0) ** 2 + real_logits[:, 0] ** 2).mean()
    l_fake = ((fake_logits[:, 0] - 1.0) ** 2 + fake_logits[:, 1] ** 2).mean()
    return l_real + l_fake


def make_discriminator_train_step(lr: float = 1e-4, dropout: float = 0.0):
    """dropout: attention-pool score dropout rate at train time (the shipped
    configs use 0.5, config.yaml:47 ATT.DROPOUT default); pass a PRNG key
    per step to activate it."""
    opt = optax.adam(lr)

    @jax.jit
    def step(disc_params, opt_state, real_seq, fake_seq, rng=None):
        loss, g = jax.value_and_grad(vibe_discriminator_loss)(
            disc_params, real_seq, fake_seq, dropout, rng)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(disc_params, upd), opt_state, loss

    return opt, step


# ---------------------------------------------------------------------------
# full trainer (lib/core/trainer.py Trainer.fit/train/validate/evaluate)
# ---------------------------------------------------------------------------

# SPIN-49 -> common-14 gather for the 3D loss / eval joint set: the
# reference stores kp_3d in 'common' order (dataset_3d convert_kps) whose
# hips sit at indices 2/3 — the pelvis convention both the loss and the
# eval root-centering rely on.
_SPIN_TO_COMMON = np.array(
    [25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38])


def init_vibe_train_state(key, smpl, gen_lr: float = 5e-5,
                          disc_lr: float = 1e-4,
                          feat_size: int = 2048,
                          feature_pool: str = "concat",
                          disc_num_layers: int = 1,
                          attention_size: int = 1024,
                          attention_layers: int = 1):
    """Params + optimizer states for generator (GRU + SPIN head) and
    motion discriminator (Trainer.__init__'s get_optimizer pair).

    feature_pool/disc_num_layers/attention_*: discriminator architecture
    knobs; the shipped reference training configs use
    feature_pool='attention', num_layers=2, attention 1024x3
    (VIBE/configs/config.yaml:37-47)."""
    from .hmr import init_hmr_head

    k1, k2, k3 = jax.random.split(key, 3)
    gen_params = {"gru": init_gru(k1, feat_size, feat_size),
                  "head": init_hmr_head(k2, feat_dim=feat_size)}
    disc_params = init_motion_discriminator(
        k3, feature_pool=feature_pool, num_layers=disc_num_layers,
        attention_size=attention_size, attention_layers=attention_layers)
    gen_opt = optax.adam(gen_lr)
    disc_opt = optax.adam(disc_lr)
    return {
        "gen": gen_params, "disc": disc_params,
        "gen_opt": gen_opt.init(gen_params),
        "disc_opt": disc_opt.init(disc_params),
    }, (gen_opt, disc_opt)


def vibe_predict(gen_params: Params, smpl, feats: jnp.ndarray,
                 n_iter: int = 3) -> Dict[str, jnp.ndarray]:
    """(B, T, 2048) features -> (B, T, ...) predictions: theta (85),
    kp_2d (49, 2), kp_3d common-14, verts, pose/betas splits."""
    from .vibe import hmr_forward_from_features, temporal_encoder

    B, T = feats.shape[:2]
    y = temporal_encoder(gen_params["gru"], feats)
    out = hmr_forward_from_features(gen_params["head"], smpl,
                                    y.reshape(B * T, -1), n_iter)
    out = {k: v.reshape((B, T) + v.shape[1:]) for k, v in out.items()}
    theta = out["theta"]
    return {
        "theta": theta,
        "kp_2d": out["kp_2d"],
        "kp_3d": out["kp_3d"][..., _SPIN_TO_COMMON, :],
        "verts": out["verts"],
        "pose": theta[..., 3:75],
        "betas": theta[..., 75:],
        "pose_body_seq": theta[..., 6:75],
    }


def make_vibe_train_step(smpl, w: VibeLossWeights = VibeLossWeights(),
                         gen_lr: float = 5e-5, n_iter: int = 3,
                         disc_dropout: float = 0.0):
    """One jitted program per batch: generator update (supervised +
    adversarial) then discriminator update on AMASS-real vs the fresh
    fake motion (Trainer.train's two backprops, trainer.py:117-247).

    batch keys ((B, T, ...)): 'features', 'kp_2d' (49, 3 w/conf),
    optional 'kp_3d' (common-14), 'pose' (72), 'betas' (10),
    'has_3d'/'has_smpl' (B, T) masks. real_motion: (B', T, 69) AMASS
    body-pose sequences for the discriminator.
    """
    gen_opt = optax.adam(gen_lr)
    disc_opt = optax.adam(w.disc_motion_lr)

    def gen_loss_fn(gen_params, disc_params, batch, rng):
        pred = vibe_predict(gen_params, smpl, batch["features"], n_iter)
        target = {k: batch[k] for k in
                  ("kp_2d", "kp_3d", "pose", "betas", "has_3d", "has_smpl")
                  if k in batch}
        loss, metrics = vibe_generator_loss(pred, target, disc_params, w,
                                            disc_dropout, rng)
        return loss, (metrics, pred["pose_body_seq"])

    @jax.jit
    def step(state, batch, real_motion, rng=None, lr_scale=1.0):
        # lr_scale: the ReduceLROnPlateau multiplier (train.py:119-133
        # builds factor-0.1 plateau schedulers for BOTH optimizers stepped
        # on the same eval metric, trainer.py:322-326). Pass a jnp scalar
        # to avoid retraces.
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        (_, (metrics, fake_seq)), g = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state["gen"], state["disc"], batch,
                                       r1)
        upd, gen_opt_state = gen_opt.update(g, state["gen_opt"])
        upd = jax.tree.map(lambda u: lr_scale * u, upd)
        gen_params = optax.apply_updates(state["gen"], upd)

        d_loss, dg = jax.value_and_grad(vibe_discriminator_loss)(
            state["disc"], real_motion, fake_seq, disc_dropout, r2)
        dupd, disc_opt_state = disc_opt.update(dg, state["disc_opt"])
        dupd = jax.tree.map(lambda u: lr_scale * u, dupd)
        disc_params = optax.apply_updates(state["disc"], dupd)
        metrics = dict(metrics, d_m_disc_loss=d_loss)
        return {"gen": gen_params, "disc": disc_params,
                "gen_opt": gen_opt_state, "disc_opt": disc_opt_state}, \
            metrics

    return step


# ---------------------------------------------------------------------------
# evaluation metrics (lib/utils/eval_utils.py + Trainer.evaluate)
# ---------------------------------------------------------------------------

def compute_accel(joints: np.ndarray) -> np.ndarray:
    """Mean joint acceleration magnitude per frame (eval_utils.py:11-22);
    joints (N, J, 3) along a time axis."""
    vel = joints[1:] - joints[:-1]
    acc = vel[1:] - vel[:-1]
    return np.linalg.norm(acc, axis=2).mean(axis=1)


def compute_error_accel(joints_gt: np.ndarray, joints_pred: np.ndarray
                        ) -> np.ndarray:
    """Acceleration error |a_pred - a_gt| (eval_utils.py:69-97)."""
    accel_gt = joints_gt[:-2] - 2 * joints_gt[1:-1] + joints_gt[2:]
    accel_pred = joints_pred[:-2] - 2 * joints_pred[1:-1] + joints_pred[2:]
    return np.linalg.norm(accel_pred - accel_gt, axis=2).mean(axis=1)


def evaluate_vibe(pred_j3d: np.ndarray, target_j3d: np.ndarray,
                  pred_verts: Optional[np.ndarray] = None,
                  target_verts: Optional[np.ndarray] = None
                  ) -> Dict[str, float]:
    """MPJPE / PA-MPJPE / accel / accel_err (+PVE) in mm over common-14
    joints, pelvis = mean of hips at indices 2/3 (Trainer.evaluate,
    trainer.py:389-437)."""
    from ..geometry.procrustes import similarity_transform_np

    pred = np.asarray(pred_j3d, np.float64)
    gt = np.asarray(target_j3d, np.float64)
    pred = pred - (pred[:, 2:3] + pred[:, 3:4]) / 2
    gt = gt - (gt[:, 2:3] + gt[:, 3:4]) / 2

    mpjpe = np.linalg.norm(pred - gt, axis=-1).mean(axis=-1)
    pa = np.stack([similarity_transform_np(p, g)[0]
                   for p, g in zip(pred, gt)])
    pa_mpjpe = np.linalg.norm(pa - gt, axis=-1).mean(axis=-1)

    m2mm = 1000.0
    out = {
        "mpjpe": float(mpjpe.mean() * m2mm),
        "pa-mpjpe": float(pa_mpjpe.mean() * m2mm),
        "accel": float(compute_accel(pred).mean() * m2mm),
        "accel_err": float(
            compute_error_accel(gt, pred).mean() * m2mm),
    }
    if pred_verts is not None and target_verts is not None:
        out["pve"] = float(np.linalg.norm(
            np.asarray(pred_verts) - np.asarray(target_verts),
            axis=-1).mean() * m2mm)
    return out


def save_vibe_state(path: str, state: dict) -> None:
    """Save the VIBE train state (gen/disc params + optimizer states) —
    the reference's checkpoint payload (Trainer.save_model,
    trainer.py:450-470: gen_state_dict/disc_motion_state_dict + optimizers)."""
    import os

    from ..utils.checkpoint import _flatten_with_paths
    os.makedirs(path, exist_ok=True)
    for k in ("gen", "disc", "gen_opt", "disc_opt"):
        np.savez_compressed(osp.join(path, f"{k}.npz"),
                            **_flatten_with_paths(state[k]))


def load_vibe_state(path: str, state: dict) -> dict:
    """Restore into a template train state (see save_vibe_state)."""
    from ..utils.checkpoint import _restore_tree
    return {k: _restore_tree(state[k],
                             dict(np.load(osp.join(path, f"{k}.npz"))))
            for k in ("gen", "disc", "gen_opt", "disc_opt")}


def vibe_trainer_fit(state, step_fn, smpl,
                     train_batches, valid_batches=None,
                     real_motion_batches=None,
                     epochs: int = 1,
                     lr_patience: int = 5,
                     log_fn=print,
                     debug_viz_every: int = 0,
                     debug_viz_dir: str = "",
                     mpjpe_abort: float = 0.0
                     ) -> Tuple[dict, Dict[str, float]]:
    """Epoch loop: train over batches, validate, evaluate (Trainer.fit,
    trainer.py:314-344). Iterables are callables returning fresh iterators
    (the reference's re-created DataLoader iterators). Returns the final
    state and the last eval dict; performance = PA-MPJPE like the
    reference's scheduler/checkpoint metric.

    debug_viz_every=N emits a pred-vs-GT keypoint panel from the first
    train batch every N epochs into debug_viz_dir — the DEBUG-mode
    visualization hook (trainer.py:233,294 batch_visualize_vid_preds,
    lib/utils/vis.py:324; feature-based training has no video frames, so
    the panel plots the 2D keypoints in crop coordinates instead of
    drawing on the frames).

    lr_patience drives the reference's twin ReduceLROnPlateau schedulers
    (train.py:119-133, factor 0.1, stepped on the eval metric each epoch,
    trainer.py:322-326) as a shared update scale passed into step_fn.
    mpjpe_abort>0 reproduces the `performance > 80` abort
    (trainer.py:342) at the given threshold (off by default: freshly
    initialized nets legitimately start above any such bar)."""
    import inspect

    takes_lr = "lr_scale" in inspect.signature(step_fn).parameters
    lr_scale, n_bad, plateau_best = 1.0, 0, float("inf")
    best = {"pa-mpjpe": float("inf")}
    for epoch in range(epochs):
        real_iter = iter(real_motion_batches()) \
            if real_motion_batches else None
        first_batch = None
        scale_arr = jnp.asarray(lr_scale, jnp.float32)
        for batch in train_batches():
            if first_batch is None:
                first_batch = batch
            if real_iter is None:
                real = batch["pose"][..., 3:] if "pose" in batch else \
                    jnp.zeros(batch["features"].shape[:2] + (69,))
            else:
                try:
                    real = next(real_iter)
                except StopIteration:
                    real_iter = iter(real_motion_batches())
                    real = next(real_iter)
            if takes_lr:
                state, metrics = step_fn(state, batch, real,
                                         lr_scale=scale_arr)
            else:
                state, metrics = step_fn(state, batch, real)
        if (debug_viz_every > 0 and debug_viz_dir
                and epoch % debug_viz_every == 0 and first_batch is not None):
            from ..render.keypoints import render_vibe_debug_panel
            pred = vibe_predict(state["gen"], smpl, first_batch["features"])
            render_vibe_debug_panel(
                osp.join(debug_viz_dir, f"debug_epoch{epoch:04d}.png"),
                np.asarray(pred["kp_2d"][0]),
                np.asarray(first_batch["kp_2d"][0]))
        if valid_batches is None:
            continue
        preds, gts = [], []
        for vb in valid_batches():
            p = vibe_predict(state["gen"], smpl, vb["features"])
            preds.append(np.asarray(p["kp_3d"]).reshape(-1, 14, 3))
            gts.append(np.asarray(vb["kp_3d"]).reshape(-1, 14, 3))
        perf = evaluate_vibe(np.concatenate(preds), np.concatenate(gts))
        log_fn(f"[vibe] epoch {epoch}: " + " ".join(
            f"{k}={v:.2f}" for k, v in perf.items())
            + f" lr_scale={lr_scale:g}")
        if perf["pa-mpjpe"] < best["pa-mpjpe"]:
            best = perf
        # ReduceLROnPlateau(mode=min, factor=0.1, threshold=1e-4)
        p = perf["pa-mpjpe"]
        if p < plateau_best * (1.0 - 1e-4):
            plateau_best, n_bad = p, 0
        else:
            n_bad += 1
            if n_bad > lr_patience:
                lr_scale *= 0.1
                n_bad = 0
                log_fn(f"[vibe] plateau: lr_scale -> {lr_scale:g}")
        if mpjpe_abort > 0 and perf["mpjpe"] > mpjpe_abort:
            log_fn(f"[vibe] MPJPE {perf['mpjpe']:.1f} > {mpjpe_abort}; "
                   "aborting (trainer.py:342)")
            break
    return state, best
