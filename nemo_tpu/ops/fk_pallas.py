"""Kinematic-chain composition as a single Pallas TPU kernel.

After the fused skinning kernel (lbs_pallas.py), the fit step is
kernel-LAUNCH bound in forward kinematics: the level-parallel XLA chain
costs ~50 small kernels per call (gathers, (B,n,3,3) matmuls, concats),
~1.4 ms fwd+bwd at batch 512, × 3 calls per step. This kernel walks the
whole 24-joint tree inside ONE program (batch rides the 128-lane dimension,
rotation components ride sublanes), with a matching hand-derived backward —
2 launches instead of ~100.

Op: fk_compose(R_l (B, J, 3, 3), t_l (B, J, 3)) -> (R_g, t_g) with
    R_g[j] = R_g[parent(j)] @ R_l[j]
    t_g[j] = R_g[parent(j)] @ t_l[j] + t_g[parent(j)]
(the rest-pose epilogue t_rel = t_g - R_g @ rest stays outside — it is one
einsum). parents is static.

Backward (reverse accumulation over the tree, children before parents):
    gR_g[p] += gR_g[j] @ R_l[j]^T + g_tg[j] ⊗ t_l[j]
    gR_l[j]  = R_g[p]^T @ gR_g[j]
    gt_l[j]  = R_g[p]^T @ g_tg[j]
    gt_g[p] += g_tg[j]
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

HI = jax.lax.Precision.HIGHEST

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _topo_order(parents) -> Tuple[int, ...]:
    parents = np.asarray(parents)
    depth = np.zeros(len(parents), np.int64)
    for i in range(1, len(parents)):
        depth[i] = depth[parents[i]] + 1
    return tuple(int(i) for i in np.argsort(depth, kind="stable") if i != 0)


# ---------------------------------------------------------------------------
# XLA fallback (also the parity oracle): plain per-joint chain
# ---------------------------------------------------------------------------

def _fk_xla(R_l: jnp.ndarray, t_l: jnp.ndarray, parents
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    parents = np.asarray(parents)
    Rs = {0: R_l[:, 0]}
    ts = {0: t_l[:, 0]}
    for j in _topo_order(parents):
        p = int(parents[j])
        Rs[j] = jnp.matmul(Rs[p], R_l[:, j], precision=HI)
        ts[j] = jnp.einsum('bik,bk->bi', Rs[p], t_l[:, j],
                           precision=HI) + ts[p]
    J = R_l.shape[1]
    R_g = jnp.stack([Rs[j] for j in range(J)], axis=1)
    t_g = jnp.stack([ts[j] for j in range(J)], axis=1)
    return R_g, t_g


# ---------------------------------------------------------------------------
# Pallas kernels: lanes = batch tile, sublanes = rotation components
# ---------------------------------------------------------------------------

def _mat9_mul(a_rows, b_rows):
    """3x3 product on component rows: lists of 9 (TB,) vectors."""
    c = []
    for i in range(3):
        for k in range(3):
            c.append(a_rows[3 * i + 0] * b_rows[0 + k]
                     + a_rows[3 * i + 1] * b_rows[3 + k]
                     + a_rows[3 * i + 2] * b_rows[6 + k])
    return c


def _mat9_vec(a_rows, v_rows):
    """R @ v on component rows: 9 rows x 3 rows -> 3 rows."""
    return [a_rows[3 * i] * v_rows[0] + a_rows[3 * i + 1] * v_rows[1]
            + a_rows[3 * i + 2] * v_rows[2] for i in range(3)]


def _mat9T_mul(a_rows, b_rows):
    """A^T @ B on component rows."""
    c = []
    for i in range(3):
        for k in range(3):
            c.append(a_rows[3 * 0 + i] * b_rows[0 + k]
                     + a_rows[3 * 1 + i] * b_rows[3 + k]
                     + a_rows[3 * 2 + i] * b_rows[6 + k])
    return c


def _mat9T_vec(a_rows, v_rows):
    return [a_rows[i] * v_rows[0] + a_rows[3 + i] * v_rows[1]
            + a_rows[6 + i] * v_rows[2] for i in range(3)]


def _read_rows(ref, j, n):
    return [ref[j, c, :] for c in range(n)]


def _write_rows(ref, j, rows):
    for c, r in enumerate(rows):
        ref[j, c, :] = r


def _fk_fwd_kernel(rl_ref, tl_ref, rg_ref, tg_ref, *, parents, order):
    """Blocks: rl (J, 9, TB), tl (J, 3, TB) -> rg (J, 9, TB), tg (J, 3, TB).

    The tree walk is a static unrolled loop; everything lives in VMEM.
    """
    _write_rows(rg_ref, 0, _read_rows(rl_ref, 0, 9))
    _write_rows(tg_ref, 0, _read_rows(tl_ref, 0, 3))
    for j in order:
        p = int(parents[j])
        Rp = _read_rows(rg_ref, p, 9)
        Rl = _read_rows(rl_ref, j, 9)
        tl = _read_rows(tl_ref, j, 3)
        tp = _read_rows(tg_ref, p, 3)
        _write_rows(rg_ref, j, _mat9_mul(Rp, Rl))
        tv = _mat9_vec(Rp, tl)
        _write_rows(tg_ref, j, [tv[i] + tp[i] for i in range(3)])


def _fk_bwd_kernel(rl_ref, tl_ref, rg_ref, grg_ref, gtg_ref,
                   grl_ref, gtl_ref, *, parents, order):
    """Reverse accumulation. grg/gtg blocks are consumed as running
    accumulators via VMEM scratch copies; outputs grl/gtl mirror rl/tl."""
    def body(acc_r_ref, acc_t_ref):
        for j in range(rl_ref.shape[0]):
            _write_rows(acc_r_ref, j, _read_rows(grg_ref, j, 9))
            _write_rows(acc_t_ref, j, _read_rows(gtg_ref, j, 3))
        for j in reversed(order):
            p = int(parents[j])
            gR = _read_rows(acc_r_ref, j, 9)
            gt = _read_rows(acc_t_ref, j, 3)
            Rl = _read_rows(rl_ref, j, 9)
            tl = _read_rows(tl_ref, j, 3)
            Rp = _read_rows(rg_ref, p, 9)

            # gR_g[p] += gR @ Rl^T + gt ⊗ tl
            gRp = _read_rows(acc_r_ref, p, 9)
            add = []
            for i in range(3):
                for k in range(3):
                    # (gR @ Rl^T)[i,k] = sum_m gR[i,m] Rl[k,m]
                    add.append(gR[3 * i + 0] * Rl[3 * k + 0]
                               + gR[3 * i + 1] * Rl[3 * k + 1]
                               + gR[3 * i + 2] * Rl[3 * k + 2]
                               + gt[i] * tl[k])
            _write_rows(acc_r_ref, p, [gRp[c] + add[c] for c in range(9)])

            # gt_g[p] += gt
            gtp = _read_rows(acc_t_ref, p, 3)
            _write_rows(acc_t_ref, p, [gtp[i] + gt[i] for i in range(3)])

            # gR_l[j] = Rp^T @ gR ; gt_l[j] = Rp^T @ gt
            _write_rows(grl_ref, j, _mat9T_mul(Rp, gR))
            _write_rows(gtl_ref, j, _mat9T_vec(Rp, gt))

        _write_rows(grl_ref, 0, _read_rows(acc_r_ref, 0, 9))
        _write_rows(gtl_ref, 0, _read_rows(acc_t_ref, 0, 3))

    J = rl_ref.shape[0]
    TB = rl_ref.shape[2]
    pl.run_scoped(body,
                  acc_r_ref=pltpu.VMEM((J, 9, TB), jnp.float32),
                  acc_t_ref=pltpu.VMEM((J, 3, TB), jnp.float32))


def _to_kernel_layout(R_l, t_l, tb):
    """(B, J, 3, 3)/(B, J, 3) -> padded (J, 9, Bp)/(J, 3, Bp)."""
    B, J = R_l.shape[:2]
    pad_b = (-B) % tb
    r = jnp.pad(R_l.reshape(B, J, 9), ((0, pad_b), (0, 0), (0, 0)))
    t = jnp.pad(t_l, ((0, pad_b), (0, 0), (0, 0)))
    return (r.transpose(1, 2, 0), t.transpose(1, 2, 0), B + pad_b)


def _from_kernel_layout(r_t, t_t, B):
    J = r_t.shape[0]
    R = r_t.transpose(2, 0, 1)[:B].reshape(B, J, 3, 3)
    t = t_t.transpose(2, 0, 1)[:B]
    return R, t


def _fk_fwd_pallas(R_l, t_l, parents, tb: int = 256):
    J = R_l.shape[1]
    rl_t, tl_t, Bp = _to_kernel_layout(R_l, t_l, tb)
    order = _topo_order(parents)
    kernel = functools.partial(_fk_fwd_kernel, parents=np.asarray(parents),
                               order=order)
    rg_t, tg_t = pl.pallas_call(
        kernel,
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((J, 9, tb), lambda bi: (0, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 3, tb), lambda bi: (0, 0, bi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((J, 9, tb), lambda bi: (0, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 3, tb), lambda bi: (0, 0, bi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((J, 9, Bp), jnp.float32),
            jax.ShapeDtypeStruct((J, 3, Bp), jnp.float32),
        ],
    )(rl_t, tl_t)
    return _from_kernel_layout(rg_t, tg_t, R_l.shape[0])


def _fk_bwd_pallas(R_l, t_l, R_g, gR_g, gt_g, parents, tb: int = 256):
    J = R_l.shape[1]
    B = R_l.shape[0]
    rl_t, tl_t, Bp = _to_kernel_layout(R_l, t_l, tb)
    rg_t, _, _ = _to_kernel_layout(R_g, t_l, tb)
    grg_t, gtg_t, _ = _to_kernel_layout(gR_g, gt_g, tb)
    order = _topo_order(parents)
    kernel = functools.partial(_fk_bwd_kernel, parents=np.asarray(parents),
                               order=order)
    spec9 = pl.BlockSpec((J, 9, tb), lambda bi: (0, 0, bi),
                         memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((J, 3, tb), lambda bi: (0, 0, bi),
                         memory_space=pltpu.VMEM)
    grl_t, gtl_t = pl.pallas_call(
        kernel,
        grid=(Bp // tb,),
        in_specs=[spec9, spec3, spec9, spec9, spec3],
        out_specs=[spec9, spec3],
        out_shape=[
            jax.ShapeDtypeStruct((J, 9, Bp), jnp.float32),
            jax.ShapeDtypeStruct((J, 3, Bp), jnp.float32),
        ],
    )(rl_t, tl_t, rg_t, grg_t, gtg_t)
    return _from_kernel_layout(grl_t, gtl_t, B)


def _bwd_xla(R_l, t_l, R_g, gR_g, gt_g, parents):
    """Reference backward (host-derivable, used on CPU)."""
    parents = np.asarray(parents)
    J = R_l.shape[1]
    accR = [gR_g[:, j] for j in range(J)]
    acct = [gt_g[:, j] for j in range(J)]
    gRl = [None] * J
    gtl = [None] * J
    for j in reversed(_topo_order(parents)):
        p = int(parents[j])
        Rp = R_g[:, p]
        accR[p] = accR[p] + jnp.matmul(
            accR[j], jnp.swapaxes(R_l[:, j], -1, -2), precision=HI) \
            + jnp.einsum('bi,bk->bik', acct[j], t_l[:, j])
        gRl[j] = jnp.matmul(jnp.swapaxes(Rp, -1, -2), accR[j], precision=HI)
        gtl[j] = jnp.einsum('bki,bk->bi', Rp, acct[j], precision=HI)
        acct[p] = acct[p] + acct[j]
    gRl[0] = accR[0]
    gtl[0] = acct[0]
    return jnp.stack(gRl, axis=1), jnp.stack(gtl, axis=1)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    return _HAS_PALLAS and jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fk_compose(R_l: jnp.ndarray, t_l: jnp.ndarray, parents: tuple
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compose local (R, t) transforms over a static kinematic tree.

    R_l: (B, J, 3, 3) local rotations; t_l: (B, J, 3) local offsets;
    parents: tuple of ints (static), parents[0] ignored for the root.
    Returns (R_global, t_global), each (B, J, ...).
    """
    if _use_pallas():
        return _fk_fwd_pallas(R_l, t_l, parents)
    return _fk_xla(R_l, t_l, parents)


def _fk_fwd(R_l, t_l, parents):
    out = fk_compose(R_l, t_l, parents)
    return out, (R_l, t_l, out[0])


def _fk_bwd(parents, res, g):
    R_l, t_l, R_g = res
    gR_g, gt_g = g
    if _use_pallas():
        return _fk_bwd_pallas(R_l, t_l, R_g, gR_g, gt_g, parents)
    return _bwd_xla(R_l, t_l, R_g, gR_g, gt_g, parents)


fk_compose.defvjp(_fk_fwd, _fk_bwd)
