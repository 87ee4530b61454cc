"""VPoser (variational pose prior) as a frozen inference-mode JAX module.

Behavioral reference: /root/reference/human_body_prior/models/vposer_model.py
(encoder :68-78, decoder :80-88, encode/decode :90-106) and the loader
/root/reference/human_body_prior/tools/model_loader.py:48-85.

NeMo uses VPoser frozen in eval mode: BatchNorm runs with stored running
stats and Dropout is identity, so the whole model reduces to a fixed chain of
affine ops + LeakyReLU — a pure function of the weights pytree. A converter
ingests the torch checkpoint (V02_05) into this layout; tests use randomly
initialized weights.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.rotations import rot6d_to_rotmat, rotmat_to_aa

Params = Dict[str, jnp.ndarray]

NUM_JOINTS = 21
N_FEATURES = NUM_JOINTS * 3  # 63


@dataclasses.dataclass(frozen=True)
class VPoserConfig:
    num_neurons: int = 512
    latent_dim: int = 32


def init_vposer(key, cfg: VPoserConfig = VPoserConfig()) -> Params:
    """Random init (tests only; real use converts the torch checkpoint)."""
    n, d = cfg.num_neurons, cfg.latent_dim
    ks = jax.random.split(key, 8)

    def lin(k, i, o):
        s = 1.0 / np.sqrt(i)
        kw, kb = jax.random.split(k)
        return (jax.random.uniform(kw, (i, o), minval=-s, maxval=s),
                jax.random.uniform(kb, (o,), minval=-s, maxval=s))

    enc_w1, enc_b1 = lin(ks[0], N_FEATURES, n)
    enc_w2, enc_b2 = lin(ks[1], n, n)
    enc_w3, enc_b3 = lin(ks[2], n, n)
    mu_w, mu_b = lin(ks[3], n, d)
    lv_w, lv_b = lin(ks[4], n, d)
    dec_w1, dec_b1 = lin(ks[5], d, n)
    dec_w2, dec_b2 = lin(ks[6], n, n)
    dec_w3, dec_b3 = lin(ks[7], n, NUM_JOINTS * 6)
    return {
        # BatchNorm1d(63): eval-mode affine from running stats
        "bn0_mean": jnp.zeros(N_FEATURES), "bn0_var": jnp.ones(N_FEATURES),
        "bn0_gamma": jnp.ones(N_FEATURES), "bn0_beta": jnp.zeros(N_FEATURES),
        "enc_w1": enc_w1, "enc_b1": enc_b1,
        "bn1_mean": jnp.zeros(n), "bn1_var": jnp.ones(n),
        "bn1_gamma": jnp.ones(n), "bn1_beta": jnp.zeros(n),
        "enc_w2": enc_w2, "enc_b2": enc_b2,
        "enc_w3": enc_w3, "enc_b3": enc_b3,
        "mu_w": mu_w, "mu_b": mu_b,
        "logvar_w": lv_w, "logvar_b": lv_b,
        "dec_w1": dec_w1, "dec_b1": dec_b1,
        "dec_w2": dec_w2, "dec_b2": dec_b2,
        "dec_w3": dec_w3, "dec_b3": dec_b3,
    }


def _bn(x, mean, var, gamma, beta, eps: float = 1e-5):
    return (x - mean) / jnp.sqrt(var + eps) * gamma + beta


def vposer_encode(p: Params, pose_body: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encoder: 63-d body pose -> Normal(mu, scale) params.

    Returns (mu, scale) with scale = softplus(logvar_head) exactly like
    NormalDistDecoder (vposer_model.py:48-56).
    """
    x = pose_body.reshape(pose_body.shape[0], -1)
    x = _bn(x, p["bn0_mean"], p["bn0_var"], p["bn0_gamma"], p["bn0_beta"])
    x = x @ p["enc_w1"] + p["enc_b1"]
    x = jax.nn.leaky_relu(x, negative_slope=0.01)
    x = _bn(x, p["bn1_mean"], p["bn1_var"], p["bn1_gamma"], p["bn1_beta"])
    # Dropout(0.1) is identity in eval mode.
    x = x @ p["enc_w2"] + p["enc_b2"]
    x = x @ p["enc_w3"] + p["enc_b3"]
    mu = x @ p["mu_w"] + p["mu_b"]
    scale = jax.nn.softplus(x @ p["logvar_w"] + p["logvar_b"])
    return mu, scale


def vposer_decode(p: Params, z: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Decoder: latent -> body pose (vposer_model.py:98-106)."""
    B = z.shape[0]
    x = z @ p["dec_w1"] + p["dec_b1"]
    x = jax.nn.leaky_relu(x, negative_slope=0.01)
    x = x @ p["dec_w2"] + p["dec_b2"]
    x = jax.nn.leaky_relu(x, negative_slope=0.01)
    x = x @ p["dec_w3"] + p["dec_b3"]  # (B, 21*6)
    rotmat = rot6d_to_rotmat(x.reshape(B, NUM_JOINTS, 6))
    aa = rotmat_to_aa(rotmat)
    return {"pose_body": aa.reshape(B, NUM_JOINTS, 3),
            "pose_body_matrot": rotmat.reshape(B, NUM_JOINTS, 9)}


def vposer_kl_to_std_normal(mu: jnp.ndarray, scale: jnp.ndarray
                            ) -> jnp.ndarray:
    """KL(N(mu, scale) || N(0, 1)) summed over latent dims, mean over batch.

    Matches torch.distributions.kl_divergence usage at
    nemo/neural_motion_model.py:2795-2802.
    """
    kl = -jnp.log(scale) + (scale ** 2 + mu ** 2) / 2.0 - 0.5
    return jnp.mean(jnp.sum(kl, axis=1))


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

_TORCH_KEY_MAP = {
    "encoder_net.1": ("bn0_gamma", "bn0_beta", "bn0_mean", "bn0_var"),
    "encoder_net.2": ("enc_w1", "enc_b1"),
    "encoder_net.4": ("bn1_gamma", "bn1_beta", "bn1_mean", "bn1_var"),
    "encoder_net.6": ("enc_w2", "enc_b2"),
    "encoder_net.7": ("enc_w3", "enc_b3"),
    "encoder_net.8.mu": ("mu_w", "mu_b"),
    "encoder_net.8.logvar": ("logvar_w", "logvar_b"),
    "decoder_net.0": ("dec_w1", "dec_b1"),
    "decoder_net.3": ("dec_w2", "dec_b2"),
    "decoder_net.5": ("dec_w3", "dec_b3"),
}


def convert_torch_state_dict(sd: dict) -> Params:
    """Convert a torch VPoser state dict (numpy-valued) to our layout.

    Linear weights are transposed (torch stores (out, in)); BatchNorm running
    stats map to the eval-mode affine parameters. Accepts keys with or
    without the 'vp_model.' prefix the snapshot files carry
    (model_loader.py:56-60).
    """
    def get(k):
        for prefix in ("", "vp_model."):
            if prefix + k in sd:
                v = sd[prefix + k]
                return np.asarray(v.detach().cpu().numpy()
                                  if hasattr(v, "detach") else v)
        raise KeyError(k)

    out: Params = {}
    for tkey, names in _TORCH_KEY_MAP.items():
        if len(names) == 4:  # batchnorm
            g, b, m, v = names
            out[g] = jnp.asarray(get(tkey + ".weight"))
            out[b] = jnp.asarray(get(tkey + ".bias"))
            out[m] = jnp.asarray(get(tkey + ".running_mean"))
            out[v] = jnp.asarray(get(tkey + ".running_var"))
        else:
            w, b = names
            out[w] = jnp.asarray(get(tkey + ".weight").T)
            out[b] = jnp.asarray(get(tkey + ".bias"))
    return out


def load_vposer(ckpt_dir_or_file: str) -> Params:
    """Load a V02_05-style VPoser snapshot directory or .ckpt file."""
    import os
    path = ckpt_dir_or_file
    if os.path.isdir(path):
        snap = os.path.join(path, "snapshots")
        cands = sorted(os.listdir(snap)) if os.path.isdir(snap) else []
        if not cands:
            raise FileNotFoundError(f"no snapshots under {path}")
        path = os.path.join(snap, cands[-1])
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return convert_torch_state_dict(sd)
