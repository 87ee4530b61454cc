"""HuMoR: CVAE latent dynamics motion prior, functional JAX.

Behavioral reference: humor/humor/models/humor_model.py:102-1207 —
posterior/prior/decoder MLPs with GroupNorm and latent skip connections
(:178-208, MLP :1209-1244), residual ("delta") decoding with rotation
composition (:445-498), autoregressive roll_out (:785-1020), and
two-Gaussian KL for training.

State layout ('smpl+joints' config, axis-angle rotations):
  trans(3) trans_vel(3) root_orient(3) root_orient_vel(3)
  pose_body(63) joints(66) joints_vel(66)                      -> D = 207

TPU-first: roll_out is a lax.scan (the reference's Python loop over steps);
each step is a few 1024-wide matmuls — MXU-friendly at batch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.rotations import batch_rodrigues, rotmat_to_aa

Params = Dict[str, jnp.ndarray]

# (name, dim, is_rotation) — the 'smpl+joints' data config
STATE_FIELDS = (
    ("trans", 3, False),
    ("trans_vel", 3, False),
    ("root_orient", 3, True),
    ("root_orient_vel", 3, False),
    ("pose_body", 63, True),
    ("joints", 66, False),
    ("joints_vel", 66, False),
)
STATE_DIM = sum(d for _, d, _ in STATE_FIELDS)  # 207
NUM_CONTACTS = 9


@dataclasses.dataclass(frozen=True)
class HumorConfig:
    latent_size: int = 48
    steps_in: int = 1
    conditional_prior: bool = True
    output_delta: bool = True
    pred_contacts: bool = True
    num_groups: int = 16  # GroupNorm groups

    @property
    def input_dim(self) -> int:
        return self.steps_in * STATE_DIM

    @property
    def output_dim(self) -> int:
        return STATE_DIM + (NUM_CONTACTS if self.pred_contacts else 0)


def split_state(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    out, s = {}, 0
    for name, d, _ in STATE_FIELDS:
        out[name] = x[..., s:s + d]
        s += d
    return out


def pack_state(d: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return jnp.concatenate([d[name] for name, _, _ in STATE_FIELDS], axis=-1)


# ---------------------------------------------------------------------------
# MLP with GroupNorm + latent skip (humor_model.py MLP :1209-1244)
# ---------------------------------------------------------------------------

def _group_norm(x: jnp.ndarray, gamma, beta, groups: int,
                eps: float = 1e-5) -> jnp.ndarray:
    B, D = x.shape
    xg = x.reshape(B, groups, D // groups)
    m = xg.mean(axis=2, keepdims=True)
    v = xg.var(axis=2, keepdims=True)
    xg = (xg - m) / jnp.sqrt(v + eps)
    return xg.reshape(B, D) * gamma + beta


def init_mlp(key, layers, num_groups: int = 16,
             skip_size: int = 0) -> Params:
    """layers[0] = in (incl. skip), rest = widths; GroupNorm between."""
    p: Params = {}
    ks = jax.random.split(key, len(layers))
    in_dim = layers[0]
    p["w0"], p["b0"] = _lin_init(ks[0], in_dim, layers[1])
    prev = layers[1]
    for i in range(2, len(layers)):
        p[f"gn{i - 1}_g"] = jnp.ones(prev)
        p[f"gn{i - 1}_b"] = jnp.zeros(prev)
        p[f"w{i - 1}"], p[f"b{i - 1}"] = _lin_init(
            ks[i - 1], prev + skip_size, layers[i])
        prev = layers[i]
    return p


def _lin_init(key, i, o):
    s = 1.0 / np.sqrt(i)
    kw, kb = jax.random.split(key)
    return (jax.random.uniform(kw, (i, o), minval=-s, maxval=s),
            jax.random.uniform(kb, (o,), minval=-s, maxval=s))


def apply_mlp(p: Params, x: jnp.ndarray, n_layers: int, num_groups: int,
              skip_in: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """n_layers = number of Linear layers."""
    x = x @ p["w0"] + p["b0"]
    for i in range(1, n_layers):
        x = _group_norm(x, p[f"gn{i}_g"], p[f"gn{i}_b"], num_groups)
        x = jax.nn.relu(x)
        if skip_in is not None:
            x = jnp.concatenate([x, skip_in], axis=1)
        x = x @ p[f"w{i}"] + p[f"b{i}"]
    return x


# ---------------------------------------------------------------------------
# HuMoR model
# ---------------------------------------------------------------------------

def init_humor(key, cfg: HumorConfig = HumorConfig()) -> Params:
    kp, ke, kd = jax.random.split(key, 3)
    D, L = cfg.input_dim, cfg.latent_size
    params = {
        "encoder": init_mlp(ke, [2 * D, 1024, 1024, 1024, 1024, 2 * L],
                            cfg.num_groups),
        "decoder": init_mlp(kd, [D + L, 1024, 1024, 512, cfg.output_dim],
                            cfg.num_groups, skip_size=L),
    }
    if cfg.conditional_prior:
        params["prior"] = init_mlp(kp, [D, 1024, 1024, 1024, 1024, 2 * L],
                                   cfg.num_groups)
    return params


def humor_posterior(p: Params, cfg: HumorConfig, past: jnp.ndarray,
                    t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    out = apply_mlp(p["encoder"], jnp.concatenate([past, t], axis=1),
                    5, cfg.num_groups)
    mu, logvar = out[:, :cfg.latent_size], out[:, cfg.latent_size:]
    return mu, jnp.exp(logvar)


def humor_prior(p: Params, cfg: HumorConfig, past: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if not cfg.conditional_prior:
        B = past.shape[0]
        return jnp.zeros((B, cfg.latent_size)), jnp.ones((B, cfg.latent_size))
    out = apply_mlp(p["prior"], past, 5, cfg.num_groups)
    mu, logvar = out[:, :cfg.latent_size], out[:, cfg.latent_size:]
    return mu, jnp.exp(logvar)


def _compose_rotation_delta(delta_aa: jnp.ndarray, base_aa: jnp.ndarray
                            ) -> jnp.ndarray:
    """Residual rotation composition (decode :467-480): R_out = dR @ R_in."""
    J = delta_aa.shape[-1] // 3
    dR = batch_rodrigues(delta_aa.reshape(-1, J, 3))
    R = batch_rodrigues(base_aa.reshape(-1, J, 3))
    out = jnp.matmul(dR, R, precision=jax.lax.Precision.HIGHEST)
    return rotmat_to_aa(out).reshape(delta_aa.shape)


def humor_decode(p: Params, cfg: HumorConfig, z: jnp.ndarray,
                 past: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Latent + past -> next state (+contact logits).

    With output_delta, non-rotation fields add the residual and rotation
    fields compose (decode :445-498).
    """
    out = apply_mlp(p["decoder"], jnp.concatenate([past, z], axis=1),
                    4, cfg.num_groups, skip_in=z)
    contacts = out[:, STATE_DIM:] if cfg.pred_contacts else None
    delta = out[:, :STATE_DIM]
    if not cfg.output_delta:
        return delta, contacts

    prev = past[:, -STATE_DIM:]  # most recent step
    d, pv = split_state(delta), split_state(prev)
    nxt = {}
    for name, _, is_rot in STATE_FIELDS:
        if is_rot:
            nxt[name] = _compose_rotation_delta(d[name], pv[name])
        else:
            nxt[name] = d[name] + pv[name]
    return pack_state(nxt), contacts


def humor_single_step(p: Params, cfg: HumorConfig, past: jnp.ndarray,
                      t: jnp.ndarray, key) -> Dict[str, jnp.ndarray]:
    """Training forward (single_step :374-405): posterior sample + decode."""
    qm, qv = humor_posterior(p, cfg, past, t)
    pm, pv = humor_prior(p, cfg, past)
    z = qm + jax.random.normal(key, qm.shape) * jnp.sqrt(qv)
    pred, contacts = humor_decode(p, cfg, z, past)
    return {"pred": pred, "contacts": contacts,
            "posterior": (qm, qv), "prior": (pm, pv), "z": z}


# ---------------------------------------------------------------------------
# World <-> aligned-local frame (humor/utils/transforms.py:17-58 +
# humor_model.py:696-775 apply_world2local_trans)
# ---------------------------------------------------------------------------

def compute_aligned_from_right(body_right: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotation (about world z) aligning body_right (B, 3) to world +x.

    transforms.py:17-31: project to the xy plane, acos the x component,
    axis from the cross product with +x; returns (mat, axis-angle).
    """
    eps = 1e-6
    x_proj = body_right[:, 0:1] / (
        jnp.linalg.norm(body_right[:, :2], axis=1, keepdims=True) + eps)
    angle = jnp.arccos(jnp.clip(x_proj, -1.0, 1.0))
    flat = body_right * jnp.asarray([1.0, 1.0, 0.0])
    x_axis = jnp.asarray([1.0, 0.0, 0.0])
    axis = jnp.cross(flat, jnp.broadcast_to(x_axis, flat.shape))
    aa = axis / (jnp.linalg.norm(axis, axis=1, keepdims=True) + eps) * angle
    return batch_rodrigues(aa), aa


def compute_world2aligned_mat(rot: jnp.ndarray) -> jnp.ndarray:
    """Heading-removal rotation for root orientation matrices (B, 3, 3)
    (transforms.py:33-42: body right = -R[:, :, 0])."""
    mat, _ = compute_aligned_from_right(-rot[:, :, 0])
    return mat


def compute_world2aligned_joints_mat(joints: jnp.ndarray) -> jnp.ndarray:
    """Same from joints (B, J, 3): right = rightUpLeg - leftUpLeg
    (transforms.py:45-58; SMPL_JOINTS left/rightUpLeg = 1/2)."""
    right = joints[:, 2] - joints[:, 1]
    right = right / jnp.linalg.norm(right, axis=1, keepdims=True)
    mat, _ = compute_aligned_from_right(right)
    return mat


def apply_world2local_state(state: jnp.ndarray, rot: jnp.ndarray,
                            trans: jnp.ndarray, trans2joint: jnp.ndarray,
                            invert: bool = False) -> jnp.ndarray:
    """Apply a world->local transform to a packed (B, D) state.

    humor_model.py:696-775 apply_world2local_trans, restated on the packed
    aa-rotation state: root_orient composes (W @ R), trans translates then
    rotates, joints shift by trans + trans2joint then rotate back off the
    trans2joint offset, velocity fields only rotate, pose_body is untouched.
    rot: (B, 3, 3); trans, trans2joint: (B, 3).
    """
    B = state.shape[0]
    W = jnp.swapaxes(rot, 1, 2) if invert else rot
    d = split_state(state)
    out = dict(d)

    R = batch_rodrigues(d["root_orient"])
    out["root_orient"] = rotmat_to_aa(
        jnp.matmul(W, R, precision=jax.lax.Precision.HIGHEST))

    if invert:
        out["trans"] = jnp.einsum("bij,bj->bi", W, d["trans"]) - trans
    else:
        out["trans"] = jnp.einsum("bij,bj->bi", W, d["trans"] + trans)

    J = d["joints"].shape[1] // 3
    pts = d["joints"].reshape(B, J, 3)
    if invert:
        pts = pts + trans2joint[:, None, :]
        pts = jnp.einsum("bij,bkj->bki", W, pts)
        pts = pts - trans2joint[:, None, :] - trans[:, None, :]
    else:
        pts = pts + trans[:, None, :] + trans2joint[:, None, :]
        pts = jnp.einsum("bij,bkj->bki", W, pts)
        pts = pts - trans2joint[:, None, :]
    out["joints"] = pts.reshape(B, J * 3)

    vel = d["joints_vel"].reshape(B, J, 3)
    out["joints_vel"] = jnp.einsum("bij,bkj->bki", W, vel).reshape(B, J * 3)
    out["trans_vel"] = jnp.einsum("bij,bj->bi", W, d["trans_vel"])
    out["root_orient_vel"] = jnp.einsum("bij,bj->bi", W,
                                        d["root_orient_vel"])
    return pack_state(out)


def canonicalize_state(state: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World state -> aligned local frame; returns (local_state, rot, trans)
    with the world2local transform so outputs can be mapped back
    (roll_out's canonicalize_input semantics, humor_model.py:813-837)."""
    d = split_state(state)
    R = batch_rodrigues(d["root_orient"])
    rot = compute_world2aligned_mat(R)
    trans = jnp.concatenate(
        [-d["trans"][:, :2], jnp.zeros_like(d["trans"][:, :1])], axis=1)
    # world-frame trans2joint (:831-834): -(root joint xy + trans offset);
    # equals -local-root-xy of the resulting local state (:867-869).
    t2j_xy = -(d["joints"][:, :2] + trans[:, :2])
    t2j = jnp.concatenate([t2j_xy, jnp.zeros_like(t2j_xy[:, :1])], axis=1)
    return apply_world2local_state(state, rot, trans, t2j), rot, trans


def _trans2joint(state: jnp.ndarray) -> jnp.ndarray:
    """-root-joint xy offset, constant over a rollout
    (humor_model.py:867-869)."""
    d = split_state(state)
    root_xy = d["joints"][:, :2]
    return jnp.concatenate([-root_xy, jnp.zeros_like(root_xy[:, :1])],
                           axis=1)


def humor_roll_out(p: Params, cfg: HumorConfig, x0: jnp.ndarray,
                   num_steps: int, key=None, use_mean: bool = False,
                   z_seq: Optional[jnp.ndarray] = None,
                   canonicalize: bool = False
                   ) -> Dict[str, jnp.ndarray]:
    """Autoregressive rollout sampling the (conditional) prior each step.

    x0: (B, D) initial state. Returns {'states': (B, T, D), 'z': (B, T, L),
    'contacts': (B, T, 9)?} — the reference's roll_out (:785-1020) as one
    lax.scan.

    canonicalize=True reproduces the reference's per-step frame handling
    (:965-1010): x0 is re-expressed in its aligned local frame, the model
    always sees aligned-local inputs, and emitted states are mapped back to
    the world frame through the accumulated world2local transform — so the
    rollout is equivariant to world heading/xy placement, as the prior was
    trained. canonicalize=False is the single-frame rollout (valid when x0
    is already canonical and drift is acceptable / for synthetic tests).
    """
    B = x0.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, num_steps)
    zs = (jnp.swapaxes(z_seq, 0, 1) if z_seq is not None
          else jnp.zeros((num_steps, B, cfg.latent_size)))

    def sample(past, k, z_given):
        pm, pv = humor_prior(p, cfg, past)
        if z_seq is not None:
            z = z_given
        elif use_mean:
            z = pm
        else:
            z = pm + jax.random.normal(k, pm.shape) * jnp.sqrt(pv)
        pred, contacts = humor_decode(p, cfg, z, past)
        return pred, z, (contacts if contacts is not None
                         else jnp.zeros((B, 0))), pm, pv

    if not canonicalize:
        def step(past, inp):
            k, z_given = inp
            pred, z, contacts, pm, pv = sample(past, k, z_given)
            return pred, (pred, z, contacts, pm, pv)

        _, (states, z_out, contacts, pm, pv) = jax.lax.scan(
            step, x0, (keys, zs))
    else:
        x0_local, g_rot, g_trans = canonicalize_state(x0)
        t2j = _trans2joint(x0_local)

        def step(carry, inp):
            past, g_rot, g_trans = carry
            k, z_given = inp
            pred, z, contacts, pm, pv = sample(past, k, z_given)
            # world-frame output through the accumulated transform (:995)
            world = apply_world2local_state(pred, g_rot, g_trans, t2j,
                                            invert=True)
            # heading/xy removal for the next input (:965-975)
            dw = split_state(world)
            g_trans = jnp.concatenate(
                [-dw["trans"][:, :2], jnp.zeros_like(dw["trans"][:, :1])],
                axis=1)
            dp = split_state(pred)
            Rp = batch_rodrigues(dp["root_orient"])
            w2a_rot = compute_world2aligned_mat(Rp)
            w2a_trans = jnp.concatenate(
                [-dp["trans"][:, :2], jnp.zeros_like(dp["trans"][:, :1])],
                axis=1)
            nxt = apply_world2local_state(pred, w2a_rot, w2a_trans, t2j)
            g_rot = jnp.matmul(g_rot, w2a_rot,
                               precision=jax.lax.Precision.HIGHEST)
            return (nxt, g_rot, g_trans), (world, z, contacts, pm, pv)

        # The accumulated transform starts at the x0 canonicalization, i.e.
        # the reference's canonicalize_input + uncanonicalize_output pair
        # (:864-866): outputs come back in the ORIGINAL world frame.
        (_, _, _), (states, z_out, contacts, pm, pv) = jax.lax.scan(
            step, (x0_local, g_rot, g_trans), (keys, zs))

    return {"states": jnp.swapaxes(states, 0, 1),
            "z": jnp.swapaxes(z_out, 0, 1),
            "contacts": jnp.swapaxes(contacts, 0, 1),
            "prior_mean": jnp.swapaxes(pm, 0, 1),
            "prior_var": jnp.swapaxes(pv, 0, 1)}


def humor_infer_seq(p: Params, cfg: HumorConfig, states: jnp.ndarray
                    ) -> Dict[str, jnp.ndarray]:
    """Posterior latents for every transition of (B, T, D) state sequences.

    The core of infer / infer_global_seq (:1064-1207): encode each
    (state_t, state_t+1) pair; also return the conditional prior and the
    per-transition KL — the sequence's 'likelihood under the motion prior'.
    """
    B, T, D = states.shape
    past = states[:, :-1].reshape(B * (T - 1), D)
    nxt = states[:, 1:].reshape(B * (T - 1), D)
    qm, qv = humor_posterior(p, cfg, past, nxt)
    pm, pv = humor_prior(p, cfg, past)
    kl_per = 0.5 * (jnp.log(pv) - jnp.log(qv)
                    + (qv + (qm - pm) ** 2) / pv - 1.0).sum(-1)
    shape = (B, T - 1)
    return {"z_mean": qm.reshape(shape + (-1,)),
            "z_var": qv.reshape(shape + (-1,)),
            "prior_mean": pm.reshape(shape + (-1,)),
            "prior_var": pv.reshape(shape + (-1,)),
            "kl": kl_per.reshape(shape)}


def convert_humor_state_dict(sd: dict, cfg: HumorConfig = HumorConfig()
                             ) -> Params:
    """Convert a torch HuMoR state dict (numpy- or tensor-valued) to our
    layout.

    The reference MLP (humor_model.py:1209-1244) is a ModuleList
    [Linear, (GroupNorm, ReLU, Linear)*]: the k-th Linear sits at index 3k
    and the GroupNorm before it at 3k-2. Module names: encoder / decoder /
    prior_net (humor_model.py:182-208). Linear weights transpose from
    torch's (out, in).
    """
    def get(k):
        for prefix in ("", "module."):
            if prefix + k in sd:
                v = sd[prefix + k]
                return np.asarray(v.detach().cpu().numpy()
                                  if hasattr(v, "detach") else v)
        raise KeyError(k)

    def mlp(name, n_linear):
        p: Params = {}
        for k in range(n_linear):
            p[f"w{k}"] = jnp.asarray(get(f"{name}.net.{3 * k}.weight").T)
            p[f"b{k}"] = jnp.asarray(get(f"{name}.net.{3 * k}.bias"))
            if k >= 1:
                p[f"gn{k}_g"] = jnp.asarray(
                    get(f"{name}.net.{3 * k - 2}.weight"))
                p[f"gn{k}_b"] = jnp.asarray(
                    get(f"{name}.net.{3 * k - 2}.bias"))
        return p

    out = {"encoder": mlp("encoder", 5), "decoder": mlp("decoder", 4)}
    if cfg.conditional_prior:
        out["prior"] = mlp("prior_net", 5)
    return out


def load_humor(path: str, cfg: HumorConfig = HumorConfig()) -> Params:
    """Load a HuMoR checkpoint file ({'model': state_dict, ...} per
    humor/utils/torch.py:29-41, possibly DataParallel-prefixed)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return convert_humor_state_dict(sd, cfg)


def humor_transition_prior_loss(p: Params, cfg: HumorConfig,
                                states: jnp.ndarray) -> jnp.ndarray:
    """Mean KL(posterior || conditional prior) over sequence transitions —
    the dynamics-prior regularizer of the dev variant
    (neural_motion_model_jeff.py:2913-2937's weight_humor_loss term)."""
    return humor_infer_seq(p, cfg, states)["kl"].mean()


def gaussian_kl(qm, qv, pm, pv) -> jnp.ndarray:
    """KL(N(qm, qv) || N(pm, pv)) summed over dims, mean over batch."""
    kl = 0.5 * (jnp.log(pv) - jnp.log(qv) + (qv + (qm - pm) ** 2) / pv - 1.0)
    return jnp.mean(jnp.sum(kl, axis=1))


def humor_train_loss(p: Params, cfg: HumorConfig, past: jnp.ndarray,
                     target: jnp.ndarray, key,
                     kl_weight: float = 4e-4,
                     contacts_gt: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One-step CVAE training loss: state reconstruction MSE + prior KL
    (+BCE on contacts), the core of humor's training step (:32-99)."""
    out = humor_single_step(p, cfg, past, target, key)
    rec = ((out["pred"] - target) ** 2).mean()
    kl = gaussian_kl(*out["posterior"], *out["prior"])
    loss = rec + kl_weight * kl
    metrics = {"rec": rec, "kl": kl}
    if cfg.pred_contacts and contacts_gt is not None:
        logits = out["contacts"]
        bce = jnp.mean(jnp.maximum(logits, 0) - logits * contacts_gt
                       + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        loss = loss + 0.01 * bce
        metrics["contacts_bce"] = bce
    metrics["loss"] = loss
    return loss, metrics


def make_humor_train_step(cfg: HumorConfig, lr: float = 1e-4,
                          kl_weight: float = 4e-4):
    """Jitted (params, opt_state, past, target, key) -> (params, opt_state,
    metrics) CVAE train step (humor train loop :32-99, Adam + grad step).

    Scale-out mirrors the VPoser trainer: feed (past, target) batches from
    data.sharded.batch_iterator (keys "past"/"target", each (B, 69*5) /
    (B, STATE_DIM) packed states), place them dp-sharded and replicate
    params — jit inserts the gradient all-reduce.
    """
    import optax

    opt = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, past, target, key):
        (_, metrics), grads = jax.value_and_grad(
            humor_train_loss, has_aux=True)(params, cfg, past, target, key,
                                            kl_weight)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return opt, step
