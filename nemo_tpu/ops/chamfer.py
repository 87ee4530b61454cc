"""Chamfer distance: Pallas TPU kernel + pure-XLA fallback + custom VJP.

Behavioral reference: humor/humor/utils/chamfer_distance/ — the reference's
ONLY native component, a CUDA brute-force bidirectional nearest-neighbor
search with forward + backward kernels (chamfer_distance.cu), used by the
HuMoR RGB-D fitting loss.

TPU-first formulation: ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b, so the hot op is
an (N, M) matmul that belongs on the MXU, followed by a running min over M
tiles. The Pallas kernel fuses the matmul with the min-reduction so the
(N, M) distance matrix never hits HBM; the XLA fallback (lax.scan over M
chunks) is used on CPU and for the backward residuals.

The custom VJP mirrors the CUDA backward: grad flows to each point and its
matched nearest neighbor (2*(a - b*) and the scatter onto B).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# XLA implementation (chunked running min; works on any backend)
# ---------------------------------------------------------------------------

def _nn_one_way_xla(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 1024
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each a: (min squared distance to b, argmin index). a: (N, 3)."""
    N = a.shape[0]
    M = b.shape[0]
    chunk = min(chunk, M)
    pad = (-M) % chunk
    if pad:
        b = jnp.concatenate([b, jnp.full((pad, b.shape[1]), 1e30,
                                         dtype=b.dtype)], axis=0)
    Mp = b.shape[0]
    b = b.reshape(Mp // chunk, chunk, -1)
    a_sq = jnp.sum(a * a, axis=-1)                      # (N,)

    def body(carry, bc_i):
        best, best_idx, offset = carry
        bc = bc_i
        b_sq = jnp.sum(bc * bc, axis=-1)                # (chunk,)
        dots = jnp.matmul(a, bc.T, precision=HI)        # (N, chunk)
        d = a_sq[:, None] + b_sq[None, :] - 2.0 * dots
        idx = jnp.argmin(d, axis=1)
        val = jnp.min(d, axis=1)
        take = val < best
        best = jnp.where(take, val, best)
        best_idx = jnp.where(take, idx + offset, best_idx)
        return (best, best_idx, offset + chunk), None

    init = (jnp.full((N,), jnp.inf, a.dtype),
            jnp.zeros((N,), jnp.int32), jnp.asarray(0, jnp.int32))
    (best, best_idx, _), _ = jax.lax.scan(body, init, b)
    return best, best_idx


# ---------------------------------------------------------------------------
# Pallas TPU kernel: fused distance + running min over M tiles
# ---------------------------------------------------------------------------

def _chamfer_kernel(a_ref, b_ref, min_ref, idx_ref, *, tile_m: int,
                    m_total: int):
    """Grid dim 0 tiles N. Full b is in VMEM; loop M tiles with running min.

    a_ref: (TILE_N, 3); b_ref: (M_padded, 3); outputs (TILE_N,) min / idx.
    """
    import jax.lax as lax

    a = a_ref[:, :]                                    # (TN, 3)
    a_sq = jnp.sum(a * a, axis=1)                      # (TN,)
    n_tiles = m_total // tile_m

    def body(j, carry):
        best, best_idx = carry
        b = b_ref[pl.ds(j * tile_m, tile_m), :]        # (TM, 3)
        b_sq = jnp.sum(b * b, axis=1)                  # (TM,)
        dots = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        d = a_sq[:, None] + b_sq[None, :] - 2.0 * dots  # (TN, TM)
        local_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
        local_val = jnp.min(d, axis=1)
        take = local_val < best
        best = jnp.where(take, local_val, best)
        best_idx = jnp.where(take, local_idx + j * tile_m, best_idx)
        return best, best_idx

    best = jnp.full((a.shape[0],), jnp.inf, jnp.float32)
    best_idx = jnp.zeros((a.shape[0],), jnp.int32)
    best, best_idx = lax.fori_loop(0, n_tiles, body, (best, best_idx))
    min_ref[:, :] = best.reshape(min_ref.shape)
    idx_ref[:, :] = best_idx.reshape(idx_ref.shape)


try:  # Pallas is TPU-only in practice; import guarded for CPU test runs.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _nn_one_way_pallas(a: jnp.ndarray, b: jnp.ndarray,
                       tile_n: int = 1024, tile_m: int = 256
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N, M = a.shape[0], b.shape[0]
    pad_n = (-N) % tile_n
    pad_m = (-M) % tile_m
    a_p = jnp.pad(a, ((0, pad_n), (0, 0)))
    # pad B with far-away sentinels so padded rows never win the min
    b_p = jnp.concatenate(
        [b, jnp.full((pad_m, b.shape[1]), 1e15, b.dtype)], axis=0) \
        if pad_m else b
    Np, Mp = a_p.shape[0], b_p.shape[0]

    kernel = functools.partial(_chamfer_kernel, tile_m=tile_m, m_total=Mp)
    n_tiles = Np // tile_n
    # Each program writes its tile as an (8, tile_n//8... ) — Mosaic wants
    # output blocks whose last two dims are multiples of (8, 128), so the
    # (Np,) result is laid out as (n_tiles*8, tile_n//8) with (8, tile_n//8)
    # blocks (tile_n = 1024 -> (8, 128) blocks).
    sub = tile_n // 128
    mins, idxs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, a.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, b.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * sub, 128), jnp.int32),
        ],
    )(a_p, b_p)
    return mins.reshape(-1)[:N], idxs.reshape(-1)[:N]


def nn_one_way(a: jnp.ndarray, b: jnp.ndarray, use_pallas: bool = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(min squared distances, argmin indices) from each a to the set b."""
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and jax.default_backend() == "tpu"
    if use_pallas:
        return _nn_one_way_pallas(a, b)
    return _nn_one_way_xla(a, b)


# ---------------------------------------------------------------------------
# public op with custom VJP (matches the CUDA ext's semantics)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def chamfer_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional squared chamfer distances.

    Args:
      xyz1: (N, 3), xyz2: (M, 3).
    Returns:
      (dist1 (N,), dist2 (M,)): per-point min squared distance to the other
      set — the forward surface of chamfer_distance.cu (which also returns
      indices; use nn_one_way for those).
    """
    d1, _ = nn_one_way(xyz1, xyz2)
    d2, _ = nn_one_way(xyz2, xyz1)
    return d1, d2


def _chamfer_fwd(xyz1, xyz2):
    d1, i1 = nn_one_way(xyz1, xyz2)
    d2, i2 = nn_one_way(xyz2, xyz1)
    return (d1, d2), (xyz1, xyz2, i1, i2)


def _chamfer_bwd(res, g):
    xyz1, xyz2, i1, i2 = res
    g1, g2 = g
    # d1[n] = ||x1[n] - x2[i1[n]]||^2:
    #   d/dx1[n] = 2 (x1[n] - x2[i1[n]]);   d/dx2[i1[n]] -= same
    diff1 = 2.0 * (xyz1 - xyz2[i1])                     # (N, 3)
    diff2 = 2.0 * (xyz2 - xyz1[i2])                     # (M, 3)
    grad1 = g1[:, None] * diff1
    grad2 = g2[:, None] * diff2
    # scatter the cross terms
    gx1 = grad1.at[i2].add(-grad2)
    gx2 = grad2.at[i1].add(-grad1)
    return gx1, gx2


chamfer_distance.defvjp(_chamfer_fwd, _chamfer_bwd)


def chamfer_loss(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Scalar symmetric chamfer loss (mean of both directions)."""
    d1, d2 = chamfer_distance(xyz1, xyz2)
    return d1.mean() + d2.mean()
