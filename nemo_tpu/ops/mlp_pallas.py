"""Fused MotionNet MLP as Pallas TPU kernels (VMEM-resident weights).

The bench profile at the 1089 steps/s operating point puts the network
MLP dots (modules/networks.py:_dot — the reference's MotionNet forward,
neural_motion_model.py:106-148) at 282 us of the ~1.0 ms step (fwd 90 +
bwd 192): at (512, 1000) x (1000, 1000) shapes XLA's 3-pass-bf16 dots,
bias/relu fusions, and the backward's explicit transposes reach only
~23 TF/s of the 66 TF/s 3-pass peak.

This module runs the WHOLE MotionNet in two kernels (one fwd, one bwd,
glued by custom_vjp):

  * trunk (3 linear+relu layers) + BOTH heads in one launch — the
    rotation and translation heads concatenate into a single
    (H, 144+3) output matmul, so the B x H activation is read once;
  * all weights, biases and activations VMEM-resident for the whole
    launch (~17 MB at H=1024 padded — vmem_limit raised);
  * hidden/IO dims padded to lane multiples once at parameter-prep time
    (H 1000 -> 1024), NOT per step;
  * the backward computes dL/dW via dot_general contractions over the
    batch axis directly from VMEM — no transposed copies of the (B, H)
    activations ever hit HBM;
  * contraction precision mirrors modules/networks.py:net_precision
    (HIGHEST default; NEMO_TPU_NET_PRECISION=high -> 3-pass bf16 like
    the bench default; =bf16 -> single-pass bf16 operands).

Enabled by NEMO_TPU_NET_FUSED=1 (quality: gradients are pinned against
the XLA path in tests/test_mlp_pallas.py; same contraction precision,
so differences are FMA-ordering-level).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _prec():
    name = os.environ.get("NEMO_TPU_NET_PRECISION", "highest").upper()
    if name == "BF16":
        return "BF16"
    return getattr(jax.lax.Precision, name)


def _kdot(a, b, prec, dims=None):
    """In-kernel matmul with the module's precision policy. dims follows
    dot_general dimension_numbers (contract, batch) or None for plain
    (a @ b).

    Mosaic only lowers DEFAULT/HIGHEST dot precisions (and its DEFAULT
    is bf16x1 — measured 2.3e-3 rel err, same as explicit bf16 casts).
    XLA's HIGH (the NEMO_TPU_NET_PRECISION=high bench default, bf16x3,
     1.3e-5 rel err) is emulated with an explicit hi/lo bf16 operand
    split and three DEFAULT-precision passes, dropping the lo*lo term —
    the standard bf16x3 algorithm XLA itself uses."""
    if dims is None:
        dims = (((1,), (0,)), ((), ()))
    # explicit DEFAULT on the bf16 passes: the package __init__ sets the
    # global matmul default to HIGHEST, which Mosaic rejects on bf16
    # operands ("Bad lhs type": contract_precision fp32 x bf16 vectors)
    _default = jax.lax.Precision.DEFAULT
    if prec == "BF16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32, precision=_default)
    if prec == jax.lax.Precision.HIGH:
        f32, bf = jnp.float32, jnp.bfloat16
        a_hi = a.astype(bf)
        a_lo = (a - a_hi.astype(f32)).astype(bf)
        b_hi = b.astype(bf)
        b_lo = (b - b_hi.astype(f32)).astype(bf)

        def d(x, y):
            return jax.lax.dot_general(x, y, dims,
                                       preferred_element_type=f32,
                                       precision=_default)

        return d(a_hi, b_hi) + d(a_lo, b_hi) + d(a_hi, b_lo)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                wo_ref, bo_ref, out_ref, h1_ref, h2_ref, z_ref, *, prec):
    x = x_ref[:, :]
    h1 = jnp.maximum(_kdot(x, w1_ref[:, :], prec) + b1_ref[0], 0.0)
    h2 = jnp.maximum(_kdot(h1, w2_ref[:, :], prec) + b2_ref[0], 0.0)
    # trunk's last linear has no relu; apply_motion_net relus on top —
    # one relu either way (networks.py:82-85,128)
    z = jnp.maximum(_kdot(h2, w3_ref[:, :], prec) + b3_ref[0], 0.0)
    out_ref[:, :] = _kdot(z, wo_ref[:, :], prec) + bo_ref[0]
    h1_ref[:, :] = h1
    h2_ref[:, :] = h2
    z_ref[:, :] = z


def _bwd_kernel(gout_ref, x_ref, h1_ref, h2_ref, z_ref,
                w1_ref, w2_ref, w3_ref, wo_ref,
                gx_ref, gw1_ref, gb1_ref, gw2_ref, gb2_ref,
                gw3_ref, gb3_ref, gwo_ref, gbo_ref, *, prec):
    # dL/dA contractions: g @ W^T as dot_general over W's LAST axis;
    # dL/dW contractions: act^T @ g as dot_general over the batch axis —
    # neither materializes a transpose.
    g_wt = (((1,), (1,)), ((), ()))      # (B, N) x (M, N) -> (B, M)
    at_g = (((0,), (0,)), ((), ()))      # (B, M) x (B, N) -> (M, N)
    gout = gout_ref[:, :]
    x, h1, h2, z = x_ref[:, :], h1_ref[:, :], h2_ref[:, :], z_ref[:, :]

    gwo_ref[:, :] = _kdot(z, gout, prec, at_g)
    gbo_ref[0] = jnp.sum(gout, axis=0)
    gz = _kdot(gout, wo_ref[:, :], prec, g_wt) * (z > 0.0)
    gw3_ref[:, :] = _kdot(h2, gz, prec, at_g)
    gb3_ref[0] = jnp.sum(gz, axis=0)
    gh2 = _kdot(gz, w3_ref[:, :], prec, g_wt) * (h2 > 0.0)
    gw2_ref[:, :] = _kdot(h1, gh2, prec, at_g)
    gb2_ref[0] = jnp.sum(gh2, axis=0)
    gh1 = _kdot(gh2, w2_ref[:, :], prec, g_wt) * (h1 > 0.0)
    gw1_ref[:, :] = _kdot(x, gh1, prec, at_g)
    gb1_ref[0] = jnp.sum(gh1, axis=0)
    gx_ref[:, :] = _kdot(gh1, w1_ref[:, :], prec, g_wt)


def _vmem():
    # ~20 MB live at the bench shape (weights 9.5 + activations); the
    # default 16 MB scoped-VMEM limit is just too small
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024)}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mlp(padded_params, x, prec_name):
    out, _, _, _ = _mlp_fwd_impl(padded_params, x, prec_name)
    return out


def _mlp_fwd_impl(p, x, prec_name):
    B, Dp = x.shape
    Hp = p["W2"].shape[0]
    Op = p["Wo"].shape[1]
    prec = (prec_name if prec_name == "BF16"
            else getattr(jax.lax.Precision, prec_name))
    kernel = functools.partial(_fwd_kernel, prec=prec)
    out, h1, h2, z = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, Op), jnp.float32),
                   jax.ShapeDtypeStruct((B, Hp), jnp.float32),
                   jax.ShapeDtypeStruct((B, Hp), jnp.float32),
                   jax.ShapeDtypeStruct((B, Hp), jnp.float32)),
        **_vmem(),
    )(x, p["W1"], p["b1"], p["W2"], p["b2"], p["W3"], p["b3"],
      p["Wo"], p["bo"])
    return out, h1, h2, z


def _mlp_vjp_fwd(p, x, prec_name):
    out, h1, h2, z = _mlp_fwd_impl(p, x, prec_name)
    return out, (p, x, h1, h2, z)


def _mlp_vjp_bwd(prec_name, res, gout):
    p, x, h1, h2, z = res
    B, Dp = x.shape
    Hp = p["W2"].shape[0]
    Op = p["Wo"].shape[1]
    prec = (prec_name if prec_name == "BF16"
            else getattr(jax.lax.Precision, prec_name))
    kernel = functools.partial(_bwd_kernel, prec=prec)
    f32 = jnp.float32
    (gx, gw1, gb1, gw2, gb2, gw3, gb3, gwo, gbo) = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, Dp), f32),
                   jax.ShapeDtypeStruct((Dp, Hp), f32),
                   jax.ShapeDtypeStruct((1, Hp), f32),
                   jax.ShapeDtypeStruct((Hp, Hp), f32),
                   jax.ShapeDtypeStruct((1, Hp), f32),
                   jax.ShapeDtypeStruct((Hp, Hp), f32),
                   jax.ShapeDtypeStruct((1, Hp), f32),
                   jax.ShapeDtypeStruct((Hp, Op), f32),
                   jax.ShapeDtypeStruct((1, Op), f32)),
        **_vmem(),
    )(gout, x, h1, h2, z, p["W1"], p["W2"], p["W3"], p["Wo"])
    gp = {"W1": gw1, "b1": gb1, "W2": gw2, "b2": gb2,
          "W3": gw3, "b3": gb3, "Wo": gwo, "bo": gbo}
    return gp, gx


_mlp.defvjp(_mlp_vjp_fwd, _mlp_vjp_bwd)


def pad_motion_net_params(p: Dict, input_dim: int, n_joints: int,
                          n_linear_out: int = 3) -> Dict:
    """Lane-pad a MotionNet param pytree ONCE for the fused kernels.

    trunk W1/W2/W3 pad to (Dp, Hp)/(Hp, Hp); the rotation and linear
    heads concatenate into one (Hp, Op) output matmul. Zero padding is
    exact: padded input columns are zero, so padded hidden units stay
    zero through relu and contribute nothing downstream.

    Returns a dict of padded jnp arrays + the static meta needed to
    unpad. Differentiable w.r.t. p (pure pads/concats), so it can sit
    inside the jitted step with grads flowing back to the raw pytree.
    """
    t = p["trunk"]
    H = t["W2"].shape[0]
    Dp = _pad_to(max(input_dim, 8), 128)
    Hp = _pad_to(H, 128)
    rot_out = p["W_rot"].shape[1]
    O = rot_out + n_linear_out
    Op = _pad_to(O, 128)

    def pad(a, r, c):
        return jnp.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1])))

    def padb(b, c):
        return jnp.pad(b, (0, c - b.shape[0]))[None]

    Wo = jnp.concatenate([p["W_rot"], p["W_lin"]], axis=1)
    bo = jnp.concatenate([p["b_rot"], p["b_lin"]])
    return {"W1": pad(t["W1"], Dp, Hp), "b1": padb(t["b1"], Hp),
            "W2": pad(t["W2"], Hp, Hp), "b2": padb(t["b2"], Hp),
            "W3": pad(t["W3"], Hp, Hp), "b3": padb(t["b3"], Hp),
            "Wo": pad(Wo, Hp, Op), "bo": padb(bo, Op)}


def motion_net_mlp(p: Dict, x: jnp.ndarray, n_joints: int,
                   n_linear_out: int = 3
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused (rot6d, trans) = MotionNet(x) through the Pallas kernels.

    p: the RAW init_motion_net pytree (padding happens inside and is
    differentiable, so optimizer state shapes are unchanged). x: (B, D).
    Returns rot6d (B, n_joints*6), trans (B, n_linear_out) — identical
    contract to the jnp path in apply_motion_net (networks.py:119-137).
    """
    B, D = x.shape
    padded = pad_motion_net_params(p, D, n_joints, n_linear_out)
    Dp = padded["W1"].shape[0]
    Bp = _pad_to(B, 8)
    xp = jnp.pad(x, ((0, Bp - B), (0, Dp - D)))
    prec = _prec()
    prec_name = prec if prec == "BF16" else prec.name
    out = _mlp(padded, xp, prec_name)[:B]
    rot_out = n_joints * 6
    return out[:, :rot_out], out[:, rot_out:rot_out + n_linear_out]


def mlp_pallas_available() -> bool:
    """Fused MotionNet path gate: Pallas + TPU + NEMO_TPU_NET_FUSED=1."""
    if os.environ.get("NEMO_TPU_NET_FUSED", "0") != "1":
        return False
    return _HAS_PALLAS and jax.default_backend() == "tpu"
