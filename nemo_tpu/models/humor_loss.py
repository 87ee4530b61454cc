"""Full HuMoR training loss + scheduled-sampling step, functional JAX.

Behavioral reference: humor/humor/losses/humor_loss.py:19-391 (HumorLoss —
per-field weighted regression, KL with annealing/cycling, contact BCE +
contact-velocity regularization, SMPL-reconstruction consistency terms) and
humor/humor/models/humor_model.py:32-99 (step) / :500-690
(scheduled_sampling), plus the trainer mechanics of
humor/humor/train/train_humor.py:113-215 (MultiStepLR, NaN-loss/grad skip,
scheduled-sampling schedule :167-174).

TPU-first: the loss is a handful of masked reductions over packed states
(one fused XLA region); scheduled sampling is a lax.scan whose per-step
GT-vs-own-prediction choice is a Bernoulli select, not Python control flow,
so the whole schedule jits once. The reference's gendered SMPL batch
splitting (humor_loss.py:260-293) is an artifact of its per-gender torch
body models; here SMPL terms take one vmapped `smpl_fn` (the repo body
model is the neutral SMPL the rest of the framework uses).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .humor import (HumorConfig, NUM_CONTACTS, Params, STATE_FIELDS,
                    apply_world2local_state, batch_rodrigues,
                    compute_world2aligned_mat, humor_single_step, pack_state,
                    split_state)

# amass_utils.py:22-23 CONTACT_ORDERING -> SMPL joint ids (hips, l/r leg,
# l/r foot, l/r toe, l/r hand)
CONTACT_INDS = (0, 4, 5, 7, 8, 10, 11, 20, 21)
CONTACT_THRESH = 0.5  # humor_loss.py:14


@dataclasses.dataclass(frozen=True)
class HumorLossConfig:
    """Weights mirror HumorLoss.__init__ (humor_loss.py:19-41); a weight of
    0 removes the term. Anneal/cycle semantics: humor_loss.py:122-147."""
    kl_loss: float = 1.0
    kl_loss_anneal_start: int = 0
    kl_loss_anneal_end: int = 0
    kl_loss_cycle_len: int = -1
    regr_trans_loss: float = 1.0
    regr_trans_vel_loss: float = 1.0
    regr_root_orient_loss: float = 1.0
    regr_root_orient_vel_loss: float = 1.0
    regr_pose_loss: float = 1.0
    regr_pose_vel_loss: float = 1.0
    regr_joint_loss: float = 1.0
    regr_joint_vel_loss: float = 1.0
    contacts_loss: float = 0.0
    contacts_vel_loss: float = 0.0
    smpl_joint_loss: float = 0.0
    smpl_mesh_loss: float = 0.0
    smpl_joint_consistency_loss: float = 0.0
    smpl_vert_consistency_loss: float = 0.0

    @property
    def use_kl_cycle(self) -> bool:
        return self.kl_loss_cycle_len > 0

    @property
    def use_kl_anneal(self) -> bool:
        # cycle overrides anneal (humor_loss.py:63-66)
        return (not self.use_kl_cycle
                and self.kl_loss_anneal_end > self.kl_loss_anneal_start)

    @property
    def field_weights(self) -> Dict[str, float]:
        """regr_loss_weight_dict (humor_loss.py:74-86), keyed by the packed
        state's field names. pose_body_vel / verts(+vel) /
        joints_orient_vel do not exist in the 'smpl+joints' state config."""
        return {
            "trans": self.regr_trans_loss,
            "trans_vel": self.regr_trans_vel_loss,
            "root_orient": self.regr_root_orient_loss,
            "root_orient_vel": self.regr_root_orient_vel_loss,
            "pose_body": self.regr_pose_loss,
            "joints": self.regr_joint_loss,
            "joints_vel": self.regr_joint_vel_loss,
        }


def kl_normal(qm, qv, pm, pv) -> jnp.ndarray:
    """Elementwise KL(q || p) between diagonal Gaussians, summed over the
    last dim (humor_loss.py:359-375). Returns (batch,)."""
    el = 0.5 * (jnp.log(pv) - jnp.log(qv) + qv / pv
                + (qm - pm) ** 2 / pv - 1.0)
    return el.sum(-1)


def kl_anneal_weight(lcfg: HumorLossConfig, cur_epoch) -> jnp.ndarray:
    """KL anneal multiplier (humor_loss.py:129-147): linear ramp in
    [anneal_start, anneal_end], or within the first half of each cycle.
    cur_epoch may be traced (int scalar)."""
    cur_epoch = jnp.asarray(cur_epoch)
    if lcfg.use_kl_cycle:
        e = jnp.mod(cur_epoch, lcfg.kl_loss_cycle_len)
        start, end = 0, lcfg.kl_loss_cycle_len // 2
    elif lcfg.use_kl_anneal:
        e = cur_epoch
        start, end = lcfg.kl_loss_anneal_start, lcfg.kl_loss_anneal_end
    else:
        return jnp.asarray(1.0)
    w = (e - start) / max(end - start, 1)
    w = jnp.where(e >= start, w, 0.0)
    return jnp.minimum(w, 1.0)


def humor_loss_terms(
    lcfg: HumorLossConfig,
    pred_state: jnp.ndarray,
    gt_state: jnp.ndarray,
    posterior: Tuple[jnp.ndarray, jnp.ndarray],
    prior: Tuple[jnp.ndarray, jnp.ndarray],
    cur_epoch,
    contact_logits: Optional[jnp.ndarray] = None,
    contacts_gt: Optional[jnp.ndarray] = None,
    smpl_fn: Optional[Callable] = None,
    betas: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """HumorLoss.forward (humor_loss.py:106-348) on packed (B, D) states.

    smpl_fn(trans(B,3), root_orient_aa(B,3), pose_body_aa(B,63), betas)
    -> (joints (B, 22, 3), verts (B, V, 3)) enables the SMPL terms; the
    repo state keeps rotations as axis-angle so no rotmat->aa conversion
    step (:244-249) is needed. Returns (loss, stats) with the reference's
    stat names.
    """
    loss = jnp.asarray(0.0)
    stats: Dict[str, jnp.ndarray] = {}

    if lcfg.kl_loss > 0.0:
        kl = kl_normal(*posterior, *prior).mean()
        stats["kl_loss"] = kl
        aw = kl_anneal_weight(lcfg, cur_epoch)
        loss = loss + aw * lcfg.kl_loss * kl
        stats["kl_anneal_weight"] = aw
        stats["kl_weighted_loss"] = loss

    pred_d, gt_d = split_state(pred_state), split_state(gt_state)
    for name, w in lcfg.field_weights.items():
        if w > 0.0:
            term = ((pred_d[name] - gt_d[name]) ** 2).mean()
            stats[name + "_loss"] = term
            loss = loss + w * term

    if lcfg.contacts_loss > 0.0 and contact_logits is not None \
            and contacts_gt is not None:
        # BCEWithLogits, stable form (:176-184)
        x, y = contact_logits, contacts_gt
        bce = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
        bce = bce.mean()
        stats["contacts_loss"] = bce
        loss = loss + lcfg.contacts_loss * bce
        # confusion-matrix stats (:186-208)
        pred_c = jax.nn.sigmoid(x) > CONTACT_THRESH
        gt_c = contacts_gt > 0.5
        tp = jnp.sum(pred_c & gt_c).astype(jnp.float32)
        fp = jnp.sum(pred_c & ~gt_c).astype(jnp.float32)
        fn = jnp.sum(~pred_c & gt_c).astype(jnp.float32)
        tn = jnp.sum(~pred_c & ~gt_c).astype(jnp.float32)
        stats["contacts_acc"] = (tp + tn) / (tp + fp + fn + tn)
        stats["contacts_pos_acc"] = tp / (tp + fn)
        stats["contacts_neg_acc"] = tn / (tn + fp)

    if lcfg.contacts_vel_loss > 0.0 and contact_logits is not None:
        # predicted contact probability gates squared joint-velocity
        # magnitude at the contact joints (:212-225)
        J = pred_d["joints_vel"].shape[-1] // 3
        vel = pred_d["joints_vel"].reshape(-1, J, 3)
        cvel = vel[:, jnp.asarray(CONTACT_INDS)]
        mag2 = jnp.sum(cvel ** 2, axis=-1)
        term = (jax.nn.sigmoid(contact_logits) * mag2).mean()
        stats["contacts_vel_loss"] = term
        loss = loss + lcfg.contacts_vel_loss * term

    use_smpl = (lcfg.smpl_joint_loss + lcfg.smpl_mesh_loss
                + lcfg.smpl_joint_consistency_loss) > 0.0
    if lcfg.smpl_vert_consistency_loss > 0.0:
        raise ValueError(
            "smpl_vert_consistency_loss needs a 'verts' state field, which "
            "the 'smpl+joints' state config does not carry "
            "(humor_loss.py:330-346)")
    if use_smpl:
        if smpl_fn is None or betas is None:
            raise ValueError("SMPL loss terms need smpl_fn and betas "
                             "(humor_loss.py:229-232)")
        pj, pm_ = smpl_fn(pred_d["trans"], pred_d["root_orient"],
                          pred_d["pose_body"], betas)
        gj, gm = smpl_fn(gt_d["trans"], gt_d["root_orient"],
                         gt_d["pose_body"], betas)
        if lcfg.smpl_joint_loss > 0.0:
            term = ((pj - gj) ** 2).mean()
            stats["smpl_joint_loss"] = term
            loss = loss + lcfg.smpl_joint_loss * term
        if lcfg.smpl_mesh_loss > 0.0:
            term = ((pm_ - gm) ** 2).mean()
            stats["smpl_mesh_loss"] = term
            loss = loss + lcfg.smpl_mesh_loss * term
        if lcfg.smpl_joint_consistency_loss > 0.0:
            J = pred_d["joints"].shape[-1] // 3
            regressed = pred_d["joints"].reshape(-1, J, 3)
            term = ((pj[:, :J] - regressed) ** 2).mean()
            stats["smpl_joint_consistency_loss"] = term
            loss = loss + lcfg.smpl_joint_consistency_loss * term

    if lcfg.kl_loss > 0.0:
        stats["reconstr_weighted_loss"] = loss - stats["kl_weighted_loss"]
    stats["loss"] = loss
    return loss, stats


def humor_full_loss(p: Params, cfg: HumorConfig, lcfg: HumorLossConfig,
                    past: jnp.ndarray, target: jnp.ndarray, key, cur_epoch,
                    contacts_gt: Optional[jnp.ndarray] = None,
                    smpl_fn: Optional[Callable] = None,
                    betas: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Supervised training step loss: single_step forward + HumorLoss
    (humor_model.py step :54-60 fully-supervised branch + :96-99)."""
    out = humor_single_step(p, cfg, past, target, key)
    return humor_loss_terms(lcfg, out["pred"], target, out["posterior"],
                            out["prior"], cur_epoch,
                            contact_logits=out["contacts"],
                            contacts_gt=contacts_gt, smpl_fn=smpl_fn,
                            betas=betas)


def sched_samp_gt_p(epoch, start: int, end: int) -> jnp.ndarray:
    """Probability of feeding GT (vs own prediction) at the given epoch
    (train_humor.py:167-174): 1 before start, linear decay to 0 at end."""
    epoch = jnp.asarray(epoch, jnp.float32)
    frac = (epoch - start) / max(end - start, 1)
    return jnp.clip(1.0 - frac, 0.0, 1.0)


def humor_step_scheduled(p: Params, cfg: HumorConfig, lcfg: HumorLossConfig,
                         x_past: jnp.ndarray, x_t: jnp.ndarray, key,
                         use_gt_p, cur_epoch,
                         contacts_gt: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Scheduled-sampling training step over (B, T, D) transition windows.

    humor_model.py step :61-77 + scheduled_sampling :500-690: scan the T
    transitions; at each step one Bernoulli(use_gt_p) draw (the reference's
    single np.random draw per step, :655) picks the GT past or the model's
    own previous prediction re-expressed in its aligned local frame
    (world2aligned rot/trans + constant trans2joint, :605-625). The carried
    prediction is stop_gradient'ed — the reference's detach_sched_samp
    default — and supervision stays in each step's local frame (local
    supervision, the detached branch of :75-77).

    x_past/x_t: (B, T, D) per-step aligned-local inputs/targets, exactly as
    the AMASS dataset provides them. Loss = HumorLoss over all B*T steps.
    """
    B, T, D = x_past.shape
    k_coin, k_eps = jax.random.split(key)
    coins = jax.random.bernoulli(k_coin, jnp.asarray(use_gt_p), (T,))
    eps_keys = jax.random.split(k_eps, T)
    # constant trans2joint from the first input (scheduled_sampling :523-525)
    d0 = split_state(x_past[:, 0])
    t2j = jnp.concatenate(
        [-d0["joints"][:, :2], jnp.zeros_like(d0["joints"][:, :1])], axis=1)

    def step(carry, inp):
        prev_pred, first = carry
        gt_past, gt_t, coin, k = inp
        past_in = jnp.where(first | coin, gt_past, prev_pred)
        out = humor_single_step(p, cfg, past_in, gt_t, k)
        pred = out["pred"]
        # canonicalize own prediction for the next step (:605-625)
        dp = split_state(pred)
        w2a_rot = compute_world2aligned_mat(batch_rodrigues(
            dp["root_orient"]))
        w2a_trans = jnp.concatenate(
            [-dp["trans"][:, :2], jnp.zeros_like(dp["trans"][:, :1])],
            axis=1)
        nxt = apply_world2local_state(pred, w2a_rot, w2a_trans, t2j)
        nxt = jax.lax.stop_gradient(nxt)  # detach_sched_samp
        contacts = (out["contacts"] if out["contacts"] is not None
                    else jnp.zeros((B, 0)))
        ys = (pred, contacts, out["posterior"][0], out["posterior"][1],
              out["prior"][0], out["prior"][1])
        return (nxt, jnp.zeros_like(first)), ys

    xs = (jnp.swapaxes(x_past, 0, 1), jnp.swapaxes(x_t, 0, 1), coins,
          eps_keys)
    init = (x_past[:, 0], jnp.asarray(True))
    _, (pred, contacts, qm, qv, pm, pv) = jax.lax.scan(step, init, xs)

    flat = lambda a: jnp.swapaxes(a, 0, 1).reshape(B * T, -1)
    cg = contacts_gt.reshape(B * T, -1) if contacts_gt is not None else None
    return humor_loss_terms(
        lcfg, flat(pred), x_t.reshape(B * T, D),
        (flat(qm), flat(qv)), (flat(pm), flat(pv)), cur_epoch,
        contact_logits=flat(contacts) if cfg.pred_contacts else None,
        contacts_gt=cg)


def multistep_lr(lr: float, milestones=(), gamma: float = 1.0
                 ) -> Callable:
    """MultiStepLR(optimizer, milestones, gamma) as an epoch -> lr callable
    (train_humor.py:114). Works on traced epoch scalars."""
    ms = jnp.asarray(sorted(milestones), jnp.int32) if milestones \
        else jnp.zeros((0,), jnp.int32)

    def lr_at(epoch):
        n = jnp.sum(jnp.asarray(epoch) >= ms) if ms.size else 0
        return lr * gamma ** n

    return lr_at


def make_humor_full_train_step(cfg: HumorConfig, lcfg: HumorLossConfig,
                               lr: float = 1e-4, weight_decay: float = 0.0,
                               sched_milestones=(),
                               sched_decay: float = 1.0,
                               sched_samp_start: Optional[int] = None,
                               sched_samp_end: Optional[int] = None):
    """Jitted HuMoR trainer step with the reference trainer's mechanics
    (train_humor.py:84-215): Adam with L2 weight decay, MultiStepLR by
    epoch, scheduled sampling past sched_samp_start, and the NaN-loss /
    NaN-gradient skip (:197-210) as a branchless where on a finite flag.

    Returns (init, step) where init(params) -> opt_state and
    step(params, opt_state, x_past, x_t, key, epoch[, contacts_gt])
    -> (params, opt_state, stats). Supervised mode feeds (B, D) past /
    target; scheduled-sampling mode (when sched_samp_* given) feeds
    (B, T, D) windows.
    """
    import optax

    lr_at = multistep_lr(lr, sched_milestones, sched_decay)
    opt = optax.scale_by_adam()
    use_ss = (sched_samp_start is not None and sched_samp_end is not None
              and sched_samp_start >= 0
              and sched_samp_end >= sched_samp_start)

    def loss_fn(params, x_past, x_t, key, epoch, contacts_gt):
        if use_ss:
            gt_p = sched_samp_gt_p(epoch, sched_samp_start, sched_samp_end)
            return humor_step_scheduled(params, cfg, lcfg, x_past, x_t, key,
                                        gt_p, epoch, contacts_gt)
        return humor_full_loss(params, cfg, lcfg, x_past, x_t, key, epoch,
                               contacts_gt)

    @jax.jit
    def step(params, opt_state, x_past, x_t, key, epoch, contacts_gt=None):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x_past, x_t, key, epoch, contacts_gt)
        if weight_decay > 0.0:  # torch Adam weight_decay = L2 on the grad
            grads = jax.tree.map(lambda g, p_: g + weight_decay * p_,
                                 grads, params)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        safe = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = opt.update(safe, opt_state, params)
        cur_lr = lr_at(epoch)
        params = jax.tree.map(
            lambda p_, u: jnp.where(finite, p_ - cur_lr * u, p_),
            params, updates)
        stats = dict(stats, grad_norm=gnorm, lr=cur_lr,
                     update_skipped=(~finite).astype(jnp.float32))
        return params, opt_state, stats

    def init(params):
        return opt.init(params)

    return init, step
