"""Fused LBS skinning as a Pallas TPU kernel (vertex-major layout).

The hot tensor op of the whole framework: posing the 6890-vertex SMPL mesh
at batch 512, three times per optimization step when the VPoser v2v prior is
active. XLA's best contraction order materializes the blended per-vertex
transform matrices M = W·A — (B, V, 12) ≈ 169 MB read+written per forward —
so the step is HBM-bound at ~4.8 ms. This kernel keeps M in VMEM per tile
and fuses pose-blendshape matmul + matrix blending + transform, cutting HBM
traffic to [posedirs read + verts write] ≈ 60 MB per forward.

Layout: vertex-major ("_t") — the vertex axis rides the 128-wide lane
dimension:
    posedirs_t: (207, 3, V)    v_shaped_t: (3, V)    W_t: (24, V)
    output verts_t: (B, 3, V)
Downstream consumers (L1 v2v loss, joint regressors) are contraction-based
and layout-agnostic, so nothing ever transposes back to (B, V, 3).

Custom VJP: backward is a second Pallas kernel producing gradients for the
pose features and the bone transforms (and v_shaped for the betas chain);
W/posedirs are frozen model constants.

Behavioral reference for the math: human_body_prior/body_model/lbs.py:
164-260 (pose blendshapes + skinning), identical to body/smpl.py's XLA path.
"""

from __future__ import annotations

import functools

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


# ---------------------------------------------------------------------------
# XLA reference implementation (any backend; also the parity oracle)
# ---------------------------------------------------------------------------

def _skin_verts_t_xla(pf: jnp.ndarray, A34: jnp.ndarray,
                      v_shaped_t: jnp.ndarray, posedirs_t: jnp.ndarray,
                      W_t: jnp.ndarray) -> jnp.ndarray:
    """verts_t (B, 3, V) from pf (B, 207), A34 (B, 24, 12),
    v_shaped_t (3, V), posedirs_t (207, 3, V), W_t (24, V)."""
    B = pf.shape[0]
    V = v_shaped_t.shape[-1]
    offsets = jnp.einsum('bp,pkv->bkv', pf, posedirs_t, precision=HI)
    vposed = offsets + v_shaped_t                      # (B, 3, V)
    vph = jnp.concatenate(
        [vposed, jnp.ones((B, 1, V), vposed.dtype)], axis=1)  # (B, 4, V)
    # M_t[b, i*4+k, v] = sum_j A34[b, j, i*4+k] W_t[j, v]
    M_t = jnp.einsum('bjl,jv->blv', A34, W_t, precision=HI)   # (B, 12, V)
    M4 = M_t.reshape(B, 3, 4, V)
    return jnp.einsum('bikv,bkv->biv', M4, vph, precision=HI)


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(pf_ref, a34_ref, vsh_ref, pd_ref, w_ref, out_ref,
                *, tb: int, tv: int):
    """Grid (nB, nV), fully vectorized — no per-batch loop. Blocks:
    pf (TB, 207), a34 (12, TB, 24) [component-plane-major A^T], vsh (3, TV),
    pd (3, 207, TV), w (24, TV), out (TB, 3, TV).

    Each of the 12 transform components l = i*4+k is blended for the whole
    batch tile with one MXU matmul: M_l (TB, TV) = A_l @ W.

    When the tables are bf16 (tile_tables dtype, opt-in) every dot runs
    bf16xbf16 on the MXU with f32 accumulation; all elementwise math and
    the output stay f32."""
    pf = pf_ref[:, :]
    w = w_ref[0]                                        # (24, TV)
    vsh = vsh_ref[0]                                    # (3, TV)
    # bf16 operands need DEFAULT contract precision (the package-global
    # 'highest' would ask Mosaic for an fp32 contraction over bf16 inputs)
    prec = (jax.lax.Precision.DEFAULT if w.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)

    # vph planes (TB, TV) per coordinate k
    vp = [jnp.dot(pf, pd_ref[0, k], preferred_element_type=jnp.float32,
                  precision=prec)
          + vsh[k] for k in range(3)]

    def m_plane(l):
        return jnp.dot(a34_ref[l], w, preferred_element_type=jnp.float32,
                       precision=prec)

    for i in range(3):
        acc = m_plane(i * 4 + 3)                        # translation
        for k in range(3):
            acc = acc + m_plane(i * 4 + k) * vp[k]
        out_ref[:, i, :] = acc.astype(out_ref.dtype)


def skin_io_dtype():
    """Mesh-output dtype knob (NEMO_TPU_SKIN_IO_BF16=1 -> bf16). The fwd
    kernels and the v2v L1 reduce run at HBM peak in-scan; bf16 meshes
    halve that traffic. The v2v loss upcasts the difference to f32 before
    reducing, and the bwd kernel upcasts the (then-bf16) cotangent."""
    import os
    return (jnp.bfloat16 if os.environ.get("NEMO_TPU_SKIN_IO_BF16",
                                           "0") == "1" else jnp.float32)


def _compiler_params(tb: int, semantics=None):
    """dimension_semantics hints (fwd grid is fully parallel; the bwd
    accumulates over the vertex dim) + scoped-VMEM headroom for batch
    tiles past 128 (the default 16 MB limit OOMs the tb=256 backward)."""
    kw = {}
    if semantics is not None:
        kw["dimension_semantics"] = semantics
    if tb > 128:
        kw["vmem_limit_bytes"] = 64 * 1024 * 1024
    if not kw:
        return {}
    return {"compiler_params": pltpu.CompilerParams(**kw)}


def _fwd_pallas(pf, A34, v_shaped_t, pd_tiles, w_tiles, V,
                tb: int = 0, keep_pad: bool = False) -> jnp.ndarray:
    """pd_tiles (nv, 3, 207, tv), w_tiles (nv, 24, tv) pre-tiled host-side
    (tile_tables); only the per-call tensors are padded here."""
    tb = tb or min(_default_tb(), pf.shape[0])
    B = pf.shape[0]
    nv, _, _, tv = pd_tiles.shape
    Vp = nv * tv
    pad_b = (-B) % tb
    Bp = B + pad_b

    cdt = pd_tiles.dtype  # bf16 tables -> bf16 MXU operands
    pf_p = jnp.pad(pf.astype(cdt), ((0, pad_b), (0, 0)))
    # (B, 24, 12) -> (12, B, 24) component-plane-major: each plane l is a
    # contiguous (B, 24) matrix the kernel matmuls independently (Mosaic
    # supports neither lane-split reshapes nor strided sublane slices).
    A_p = jnp.pad(A34.astype(cdt).transpose(2, 0, 1),
                  ((0, 0), (0, pad_b), (0, 0)))
    vsh_p = jnp.pad(v_shaped_t, ((0, 0), (0, Vp - V)))
    vsh_tiles = vsh_p.reshape(3, nv, tv).transpose(1, 0, 2)     # (nv, 3, tv)

    kernel = functools.partial(_fwd_kernel, tb=tb, tv=tv)
    # grid (nv, nB): batch innermost, so the (pd, w, vsh) blocks are
    # constant across the inner steps and stream from HBM once per vertex
    # tile instead of once per (batch, vertex) pair — the fwd kernel runs
    # at HBM peak in-scan and the tables were most of its traffic.
    out = pl.pallas_call(
        kernel,
        grid=(nv, Bp // tb),
        in_specs=[
            pl.BlockSpec((tb, 207), lambda vi, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, 24), lambda vi, bi: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tv), lambda vi, bi: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 207, tv), lambda vi, bi: (vi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, tv), lambda vi, bi: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 3, tv), lambda vi, bi: (bi, 0, vi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 3, Vp), skin_io_dtype()),
        **_compiler_params(tb, ("parallel", "parallel")),
    )(pf_p, A_p, vsh_tiles, pd_tiles, w_tiles)
    # Lane pads are exactly zero (w_tiles pad columns zero every m_plane,
    # including the translation), so padded consumers are safe.
    return out[:B] if keep_pad else out[:B, :, :V]


# ---------------------------------------------------------------------------
# Pallas backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(pf_ref, a34_ref, vsh_ref, pd_ref, w_ref, g_ref,
                gpf_ref, ga_ref, gvsh_ref, *, tb: int, tv: int,
                vp_ref=None):
    """Grid (nB, nV) with V innermost, fully vectorized; accumulates over V
    tiles into g_pf (TB, 207) and g_A (12, TB, 24); g_vsh gets a per-(bi,vi)
    block summed on the host.

    vp_ref: optional stored posed-vertex planes (TB, 3, TV) from the fused
    v2v forward (table dtype). When given, the three K=207 pf@pd dots that
    recompute vp — 34% of this kernel's MXU work — are skipped. Exactness:
    vp is stored in the table dtype cdt, and vp only ever enters this kernel
    through gm = (g * vp).astype(cdt); for sign cotangents g in {-1, 0, 1}
    the cast commutes with the flip, so the stored-vp path is BIT-IDENTICAL
    to the recompute path (asserted by test_vp_residual_bwd_bit_exact)."""
    vi = pl.program_id(1)

    pf = pf_ref[:, :]
    w = w_ref[0]                                        # (24, TV)
    vsh = vsh_ref[0]                                    # (3, TV)

    @pl.when(vi == 0)
    def _():
        gpf_ref[:, :] = jnp.zeros_like(gpf_ref)
        ga_ref[:, :, :] = jnp.zeros_like(ga_ref)

    cdt = w_ref.dtype  # bf16 tables -> bf16 MXU operands, f32 accumulate
    prec = (jax.lax.Precision.DEFAULT if cdt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    if vp_ref is not None:
        vp = [vp_ref[:, k, :].astype(jnp.float32) for k in range(3)]
    else:
        vp = [jnp.dot(pf, pd_ref[0, k], preferred_element_type=jnp.float32,
                      precision=prec)
              + vsh[k] for k in range(3)]               # (TB, TV) x3
    # the cotangent arrives in the fwd output dtype (bf16 when the io
    # knob is on) — upcast for the elementwise math, accumulate f32
    g = [g_ref[:, i, :].astype(jnp.float32) for i in range(3)]

    # g_A planes: gA_l = gm_l @ w^T with gm_{i*4+k} = g_i * vph_k
    for i in range(3):
        for k in range(4):
            gm = g[i] * vp[k] if k < 3 else g[i]
            ga_ref[i * 4 + k] += jax.lax.dot_general(
                gm.astype(cdt), w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                         # (TB, 24)

    def m_plane(l):
        return jnp.dot(a34_ref[l], w, preferred_element_type=jnp.float32,
                       precision=prec)

    gvp = [m_plane(0 + k) * g[0] + m_plane(4 + k) * g[1]
           + m_plane(8 + k) * g[2] for k in range(3)]   # (TB, TV) x3

    # g_pf (TB, 207) += sum_k gvp_k @ pd_k^T
    acc = gpf_ref[:, :]
    for k in range(3):
        acc = acc + jax.lax.dot_general(
            gvp[k].astype(cdt), pd_ref[0, k],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)
    gpf_ref[:, :] = acc

    for k in range(3):
        gvsh_ref[0, 0, k, :] = jnp.sum(gvp[k], axis=0)


def _bwd_kernel_vp(pf_ref, a34_ref, vsh_ref, pd_ref, w_ref, g_ref, vp_ref,
                   gpf_ref, ga_ref, gvsh_ref, *, tb: int, tv: int):
    _bwd_kernel(pf_ref, a34_ref, vsh_ref, pd_ref, w_ref, g_ref,
                gpf_ref, ga_ref, gvsh_ref, tb=tb, tv=tv, vp_ref=vp_ref)


def _bwd_pallas(pf, A34, v_shaped_t, pd_tiles, w_tiles, V, g,
                tb: int = 0, vp=None):
    tb = tb or min(_default_tb(), pf.shape[0])
    B = pf.shape[0]
    nv, _, _, tv = pd_tiles.shape
    Vp = nv * tv
    pad_b = (-B) % tb
    Bp = B + pad_b

    cdt = pd_tiles.dtype
    pf_p = jnp.pad(pf.astype(cdt), ((0, pad_b), (0, 0)))
    A_p = jnp.pad(A34.astype(cdt).transpose(2, 0, 1),
                  ((0, 0), (0, pad_b), (0, 0)))
    vsh_p = jnp.pad(v_shaped_t, ((0, 0), (0, Vp - V)))
    vsh_tiles = vsh_p.reshape(3, nv, tv).transpose(1, 0, 2)
    # g may arrive already lane-padded (skin_verts_t_padded cotangent)
    g_p = jnp.pad(g, ((0, pad_b), (0, 0), (0, Vp - g.shape[-1])))

    in_specs = [
            pl.BlockSpec((tb, 207), lambda bi, vi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, 24), lambda bi, vi: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tv), lambda bi, vi: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 207, tv), lambda bi, vi: (vi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, tv), lambda bi, vi: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 3, tv), lambda bi, vi: (bi, 0, vi),
                         memory_space=pltpu.VMEM),
    ]
    operands = [pf_p, A_p, vsh_tiles, pd_tiles, w_tiles, g_p]
    if vp is not None:
        # stored posed-vertex planes (Bp, 3, Vp) in the table dtype —
        # same block shape/index map as the cotangent
        in_specs.append(pl.BlockSpec((tb, 3, tv), lambda bi, vi: (bi, 0, vi),
                                     memory_space=pltpu.VMEM))
        operands.append(vp)
        kernel = functools.partial(_bwd_kernel_vp, tb=tb, tv=tv)
    else:
        kernel = functools.partial(_bwd_kernel, tb=tb, tv=tv)
    gpf, ga, gvsh_tiles = pl.pallas_call(
        kernel,
        grid=(Bp // tb, nv),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tb, 207), lambda bi, vi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, 24), lambda bi, vi: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, tv), lambda bi, vi: (bi, vi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 207), jnp.float32),
            jax.ShapeDtypeStruct((12, Bp, 24), jnp.float32),
            jax.ShapeDtypeStruct((Bp // tb, nv, 3, tv), jnp.float32),
        ],
        **_compiler_params(tb, ("parallel", "arbitrary")),
    )(*operands)

    gvsh = gvsh_tiles.sum(axis=0).transpose(1, 0, 2).reshape(3, Vp)[:, :V]
    ga_b = ga.transpose(1, 2, 0)[:B]                    # (B, 24, 12)
    return gpf[:B], ga_b, gvsh


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    return _HAS_PALLAS and jax.default_backend() == "tpu"


CANONICAL_TV = 512


def _default_tv() -> int:
    """Vertex-tile knob (NEMO_TPU_SKIN_TV, default 512); bigger tiles mean
    fewer grid steps with wider lanes per dot."""
    import os
    return int(os.environ.get("NEMO_TPU_SKIN_TV", str(CANONICAL_TV)))


def _default_tb() -> int:
    """Batch-tile knob (NEMO_TPU_SKIN_TB, default 128). Larger tiles mean
    fewer grid steps with 4x the MXU work each — the backward kernel is
    per-op-overhead-bound at tb=128 (30 small dots per grid step)."""
    import os
    return int(os.environ.get("NEMO_TPU_SKIN_TB", "128"))


def skin_tables_dtype():
    """Kernel-table dtype knob: NEMO_TPU_SKIN_BF16=1 stores posedirs/weights
    in bf16 so every skinning dot runs bf16xbf16 on the MXU with f32
    accumulation (half the table HBM traffic, ~6x MXU rate vs multi-pass
    f32). Off by default — opt-in, parity-gated (~1e-2 on verts)."""
    import os
    return (jnp.bfloat16 if os.environ.get("NEMO_TPU_SKIN_BF16", "0") == "1"
            else jnp.float32)


def tile_tables(posedirs_t: np.ndarray, W_t: np.ndarray,
                tv: int = 0, dtype=None):
    """Pre-tile the frozen model tables into kernel layout (host, once).

    Returns (pd_tiles (nv, 3, 207, tv), w_tiles (nv, 24, tv), V) with the
    vertex axis padded to a tile multiple. Re-tiling 17 MB of posedirs per
    call inside jit costs more than the kernel itself — these live in the
    SMPLModel instead. dtype=None uses skin_tables_dtype() (f32 unless
    NEMO_TPU_SKIN_BF16=1).
    """
    posedirs_t = np.asarray(posedirs_t)
    W_t = np.asarray(W_t)
    tv = tv or _default_tv()
    dtype = skin_tables_dtype() if dtype is None else dtype
    V = posedirs_t.shape[-1]
    pad_v = (-V) % tv
    pd_p = np.pad(posedirs_t, ((0, 0), (0, 0), (0, pad_v)))
    w_p = np.pad(W_t, ((0, 0), (0, pad_v)))
    nv = (V + pad_v) // tv
    pd_tiles = np.ascontiguousarray(
        pd_p.reshape(207, 3, nv, tv).transpose(2, 1, 0, 3))
    w_tiles = np.ascontiguousarray(
        w_p.reshape(24, nv, tv).transpose(1, 0, 2))
    if dtype != jnp.float32:
        pd_tiles = jnp.asarray(pd_tiles, dtype)
        w_tiles = jnp.asarray(w_tiles, dtype)
    return pd_tiles, w_tiles, V


def _untile(pd_tiles, w_tiles, V):
    """Kernel layout -> logical (posedirs_t (207, 3, V), W_t (24, V))."""
    nv, _, _, tv = pd_tiles.shape
    pd = pd_tiles.transpose(2, 1, 0, 3).reshape(207, 3, nv * tv)[..., :V]
    w = w_tiles.transpose(1, 0, 2).reshape(24, nv * tv)[:, :V]
    return pd, w


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def skin_verts_t(V: int, pf: jnp.ndarray, A34: jnp.ndarray,
                 v_shaped_t: jnp.ndarray, pd_tiles: jnp.ndarray,
                 w_tiles: jnp.ndarray) -> jnp.ndarray:
    """Pose-blendshape + skinning, vertex-major: returns verts_t (B, 3, V).

    V: true vertex count (static).
    pf: (B, 207) pose features (rotmats - I, body joints).
    A34: (B, 24, 12) top-3-rows of the FK relative transforms.
    v_shaped_t: (3, V); pd_tiles/w_tiles: pre-tiled tables (tile_tables).
    """
    if _use_pallas():
        return _fwd_pallas(pf, A34, v_shaped_t, pd_tiles, w_tiles, V)
    pd, w = _untile(pd_tiles, w_tiles, V)
    return _skin_verts_t_xla(pf, A34, v_shaped_t, pd, w).astype(
        skin_io_dtype())


def _skin_fwd(V, pf, A34, v_shaped_t, pd_tiles, w_tiles):
    out = skin_verts_t(V, pf, A34, v_shaped_t, pd_tiles, w_tiles)
    return out, (pf, A34, v_shaped_t, pd_tiles, w_tiles)


def _skin_bwd(V, res, g):
    pf, A34, v_shaped_t, pd_tiles, w_tiles = res
    if _use_pallas():
        gpf, ga, gvsh = _bwd_pallas(pf, A34, v_shaped_t, pd_tiles, w_tiles,
                                    V, g)
    else:
        pd, w = _untile(pd_tiles, w_tiles, V)
        gpf, ga, gvsh = _bwd_xla(pf, A34, v_shaped_t, pd, w,
                                 g.astype(jnp.float32))
    # frozen model constants get zero grads
    return (gpf, ga, gvsh, jnp.zeros_like(pd_tiles),
            jnp.zeros_like(w_tiles))


def _bwd_xla(pf, A34, v_shaped_t, posedirs_t, W_t, g):
    B = pf.shape[0]
    offsets = jnp.einsum('bp,pkv->bkv', pf, posedirs_t, precision=HI)
    vposed = offsets + v_shaped_t
    vph = jnp.concatenate(
        [vposed, jnp.ones((B, 1, vposed.shape[-1]), vposed.dtype)], axis=1)
    M_t = jnp.einsum('bjl,jv->blv', A34, W_t, precision=HI)
    M4 = M_t.reshape(B, 3, 4, M_t.shape[-1])

    gM4 = jnp.einsum('biv,bkv->bikv', g, vph)
    ga = jnp.einsum('bikv,jv->bjik', gM4, W_t, precision=HI).reshape(
        B, 24, 12)
    gvposed = jnp.einsum('bikv,biv->bkv', M4[:, :, :3], g, precision=HI)
    gpf = jnp.einsum('bkv,pkv->bp', gvposed, posedirs_t, precision=HI)
    gvsh = gvposed.sum(axis=0)
    return gpf, ga, gvsh


skin_verts_t.defvjp(_skin_fwd, _skin_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def skin_verts_t_padded(V: int, pf: jnp.ndarray, A34: jnp.ndarray,
                        v_shaped_t: jnp.ndarray, pd_tiles: jnp.ndarray,
                        w_tiles: jnp.ndarray) -> jnp.ndarray:
    """skin_verts_t without the final lane slice: returns (B, 3, Vp) where
    Vp = nv*tv >= V and lanes [V:] are exactly zero.

    For difference/reduction consumers (the VPoser v2v L1) the pad lanes
    cancel, and skipping the (B, 3, V) slice saves ~42 MB of copy per call
    forward plus the matching pad of the cotangent backward — 4 sliced
    tensors per optimization step with the v2v prior active. Normalize sums
    by the true V, not out.shape[-1].
    """
    nv, _, _, tv = pd_tiles.shape
    if _use_pallas():
        return _fwd_pallas(pf, A34, v_shaped_t, pd_tiles, w_tiles, V,
                           keep_pad=True)
    pd, w = _untile(pd_tiles, w_tiles, V)
    out = _skin_verts_t_xla(pf, A34, v_shaped_t, pd, w).astype(
        skin_io_dtype())
    return jnp.pad(out, ((0, 0), (0, 0), (0, nv * tv - V)))


def _skin_fwd_padded(V, pf, A34, v_shaped_t, pd_tiles, w_tiles):
    out = skin_verts_t_padded(V, pf, A34, v_shaped_t, pd_tiles, w_tiles)
    return out, (pf, A34, v_shaped_t, pd_tiles, w_tiles)


def _skin_bwd_padded(V, res, g):
    pf, A34, v_shaped_t, pd_tiles, w_tiles = res
    if _use_pallas():
        gpf, ga, gvsh = _bwd_pallas(pf, A34, v_shaped_t, pd_tiles, w_tiles,
                                    V, g)
    else:
        pd, w = _untile(pd_tiles, w_tiles, V)
        gpf, ga, gvsh = _bwd_xla(pf, A34, v_shaped_t, pd, w,
                                 g[..., :V].astype(jnp.float32))
    return (gpf, ga, gvsh, jnp.zeros_like(pd_tiles),
            jnp.zeros_like(w_tiles))


skin_verts_t_padded.defvjp(_skin_fwd_padded, _skin_bwd_padded)


# ---------------------------------------------------------------------------
# fused v2v L1: both skinnings + |diff| reduction in one kernel
# ---------------------------------------------------------------------------

def _v2v_fwd_kernel(pf_o_ref, a_o_ref, pf_r_ref, a_r_ref, vsh_ref, pd_ref,
                    w_ref, sign_ref, psum_ref, *, tb: int, tv: int,
                    vp_ref=None):
    """Per (vi, bi) tile: skin BOTH pose sets, emit sign(rec - orig) (bf16)
    and the partial sum of |rec - orig| — the meshes never touch HBM.
    Math identical to two _fwd_kernel invocations + abs-reduce.

    vp_ref: optional extra output storing the ORIG-side posed-vertex planes
    (TB, 3, TV) in the table dtype, consumed by the vp-residual backward
    (_bwd_kernel's vp_ref) so it can skip recomputing them."""
    w = w_ref[0]
    vsh = vsh_ref[0]
    prec = (jax.lax.Precision.DEFAULT if w.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)

    def side(pf_ref, a_ref):
        pf = pf_ref[:, :]
        vp = [jnp.dot(pf, pd_ref[0, k], preferred_element_type=jnp.float32,
                      precision=prec) + vsh[k] for k in range(3)]

        def m_plane(l):
            return jnp.dot(a_ref[l], w, preferred_element_type=jnp.float32,
                           precision=prec)
        outs = []
        for i in range(3):
            acc = m_plane(i * 4 + 3)
            for k in range(3):
                acc = acc + m_plane(i * 4 + k) * vp[k]
            outs.append(acc)
        return outs, vp

    o, vp_o = side(pf_o_ref, a_o_ref)
    r, _ = side(pf_r_ref, a_r_ref)
    if vp_ref is not None:
        for k in range(3):
            vp_ref[:, k, :] = vp_o[k].astype(vp_ref.dtype)
    total = jnp.zeros((), jnp.float32)
    for i in range(3):
        diff = r[i] - o[i]
        sign_ref[:, i, :] = jnp.sign(diff).astype(sign_ref.dtype)
        total = total + jnp.sum(jnp.abs(diff))
    # scalar partial in an (8, 128) tile (TPU min block granularity;
    # iota+where — .at[].set lowers to scatter, unsupported in Mosaic)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    psum_ref[0, 0] = jnp.where((row == 0) & (col == 0), total, 0.0)


def _v2v_fwd_kernel_vp(pf_o_ref, a_o_ref, pf_r_ref, a_r_ref, vsh_ref,
                       pd_ref, w_ref, sign_ref, psum_ref, vp_ref, *,
                       tb: int, tv: int):
    _v2v_fwd_kernel(pf_o_ref, a_o_ref, pf_r_ref, a_r_ref, vsh_ref, pd_ref,
                    w_ref, sign_ref, psum_ref, tb=tb, tv=tv, vp_ref=vp_ref)


def _v2v_fwd_pallas(pf_o, A_o, pf_r, A_r, v_shaped_t, pd_tiles, w_tiles, V,
                    tb: int = 0, want_vp: bool = False):
    tb = tb or min(_default_tb(), pf_o.shape[0])
    B = pf_o.shape[0]
    nv, _, _, tv = pd_tiles.shape
    Vp = nv * tv
    pad_b = (-B) % tb
    Bp = B + pad_b

    cdt = pd_tiles.dtype
    prep_pf = lambda pf: jnp.pad(pf.astype(cdt), ((0, pad_b), (0, 0)))
    prep_a = lambda A: jnp.pad(A.astype(cdt).transpose(2, 0, 1),
                               ((0, 0), (0, pad_b), (0, 0)))
    vsh_p = jnp.pad(v_shaped_t, ((0, 0), (0, Vp - V)))
    vsh_tiles = vsh_p.reshape(3, nv, tv).transpose(1, 0, 2)

    out_specs = [
            pl.BlockSpec((tb, 3, tv), lambda vi, bi: (bi, 0, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda vi, bi: (vi, bi, 0, 0),
                         memory_space=pltpu.VMEM),
    ]
    out_shape = [
            jax.ShapeDtypeStruct((Bp, 3, Vp), jnp.bfloat16),
            jax.ShapeDtypeStruct((nv, Bp // tb, 8, 128), jnp.float32),
    ]
    if want_vp:
        out_specs.append(pl.BlockSpec((tb, 3, tv),
                                      lambda vi, bi: (bi, 0, vi),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((Bp, 3, Vp), cdt))
        kernel = functools.partial(_v2v_fwd_kernel_vp, tb=tb, tv=tv)
    else:
        kernel = functools.partial(_v2v_fwd_kernel, tb=tb, tv=tv)
    outs = pl.pallas_call(
        kernel,
        grid=(nv, Bp // tb),
        in_specs=[
            pl.BlockSpec((tb, 207), lambda vi, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, 24), lambda vi, bi: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 207), lambda vi, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, 24), lambda vi, bi: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tv), lambda vi, bi: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 207, tv), lambda vi, bi: (vi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, tv), lambda vi, bi: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        **_compiler_params(tb, ("parallel", "parallel")),
    )(prep_pf(pf_o), prep_a(A_o), prep_pf(pf_r), prep_a(A_r),
      vsh_tiles, pd_tiles, w_tiles)
    if want_vp:
        sign, psum, vp = outs
        return psum.sum(), sign[:B], vp      # vp stays lane/batch-padded
    sign, psum = outs
    return psum.sum(), sign[:B], None


def _v2v_fwdbwd_kernel(pf_o_ref, a_o_ref, pf_r_ref, a_r_ref, vsh_ref,
                       pd_ref, w_ref, psum_ref, gpf_ref, ga_ref, gvsh_ref,
                       *, tb: int, tv: int):
    """One pass = fwd AND bwd of the v2v-L1 objective. Grid (nB, nV) with V
    innermost (accumulation): skin BOTH pose sets, reduce |rec - orig|, and
    produce the orig-side gradients with the raw sign(rec - orig) cotangent
    — neither mesh NOR the sign tensor ever reaches HBM, and the vp /
    m_plane intermediates feed the fwd and bwd math once instead of being
    recomputed by a second kernel (the separate pair re-streams the tables
    and redoes 909 of 2727 MAC-units/tile).

    Outputs match _v2v_fwd_kernel + _bwd_kernel(sign) bit-for-bit on
    total/gpf/gA (accumulation orders and dot shapes kept exactly); gvsh
    may differ in the last bits of its batch reduction (~5e-7 absolute on
    O(1) values) because the compiler fuses its multiply-adds differently
    across the two program contexts (test_fused_vjp_bit_exact)."""
    vi = pl.program_id(1)
    pf_o = pf_o_ref[:, :]
    pf_r = pf_r_ref[:, :]
    w = w_ref[0]                                        # (24, TV)
    vsh = vsh_ref[0]                                    # (3, TV)
    cdt = w_ref.dtype
    prec = (jax.lax.Precision.DEFAULT if cdt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)

    @pl.when(vi == 0)
    def _():
        gpf_ref[:, :] = jnp.zeros_like(gpf_ref)
        ga_ref[:, :, :] = jnp.zeros_like(ga_ref)

    def vp_side(pf):
        return [jnp.dot(pf, pd_ref[0, k], preferred_element_type=jnp.float32,
                        precision=prec) + vsh[k] for k in range(3)]

    vp_o = vp_side(pf_o)
    vp_r = vp_side(pf_r)

    def m_plane(a_ref, l):
        return jnp.dot(a_ref[l], w, preferred_element_type=jnp.float32,
                       precision=prec)

    total = jnp.zeros((), jnp.float32)
    mo_saved, g = [], []
    for i in range(3):
        mo = [m_plane(a_o_ref, i * 4 + k) for k in range(4)]
        o_i = mo[3]
        for k in range(3):
            o_i = o_i + mo[k] * vp_o[k]
        r_i = m_plane(a_r_ref, i * 4 + 3)
        for k in range(3):
            r_i = r_i + m_plane(a_r_ref, i * 4 + k) * vp_r[k]
        diff = r_i - o_i
        total = total + jnp.sum(jnp.abs(diff))
        g_i = jnp.sign(diff)
        for k in range(4):
            gm = g_i * vp_o[k] if k < 3 else g_i
            ga_ref[i * 4 + k] += jax.lax.dot_general(
                gm.astype(cdt), w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                         # (TB, 24)
        mo_saved.append(mo)
        g.append(g_i)

    # same expression SHAPE as _bwd_kernel's gvp (one fused sum, not a
    # loop-carried accumulator) so the rounding is bit-identical
    gvp = [mo_saved[0][k] * g[0] + mo_saved[1][k] * g[1]
           + mo_saved[2][k] * g[2] for k in range(3)]

    acc = gpf_ref[:, :]
    for k in range(3):
        acc = acc + jax.lax.dot_general(
            gvp[k].astype(cdt), pd_ref[0, k],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)
    gpf_ref[:, :] = acc
    for k in range(3):
        gvsh_ref[0, 0, k, :] = jnp.sum(gvp[k], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    psum_ref[0, 0] = jnp.where((row == 0) & (col == 0), total, 0.0)


def _v2v_fwdbwd_pallas(pf_o, A_o, pf_r, A_r, v_shaped_t, pd_tiles, w_tiles,
                       V, tb: int = 0):
    """Returns (total, gpf (B, 207), gA (B, 24, 12), gvsh (3, V)) — the
    loss AND its unscaled orig-side gradients in one kernel launch."""
    tb = tb or min(_default_tb(), pf_o.shape[0])
    B = pf_o.shape[0]
    nv, _, _, tv = pd_tiles.shape
    Vp = nv * tv
    pad_b = (-B) % tb
    Bp = B + pad_b

    cdt = pd_tiles.dtype
    prep_pf = lambda pf: jnp.pad(pf.astype(cdt), ((0, pad_b), (0, 0)))
    prep_a = lambda A: jnp.pad(A.astype(cdt).transpose(2, 0, 1),
                               ((0, 0), (0, pad_b), (0, 0)))
    vsh_p = jnp.pad(v_shaped_t, ((0, 0), (0, Vp - V)))
    vsh_tiles = vsh_p.reshape(3, nv, tv).transpose(1, 0, 2)

    kernel = functools.partial(_v2v_fwdbwd_kernel, tb=tb, tv=tv)
    psum, gpf, ga, gvsh_tiles = pl.pallas_call(
        kernel,
        grid=(Bp // tb, nv),
        in_specs=[
            pl.BlockSpec((tb, 207), lambda bi, vi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, 24), lambda bi, vi: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 207), lambda bi, vi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, 24), lambda bi, vi: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tv), lambda bi, vi: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 207, tv), lambda bi, vi: (vi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, tv), lambda bi, vi: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda bi, vi: (bi, vi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 207), lambda bi, vi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, 24), lambda bi, vi: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, tv), lambda bi, vi: (bi, vi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp // tb, nv, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 207), jnp.float32),
            jax.ShapeDtypeStruct((12, Bp, 24), jnp.float32),
            jax.ShapeDtypeStruct((Bp // tb, nv, 3, tv), jnp.float32),
        ],
        **_compiler_params(tb, ("parallel", "arbitrary")),
    )(prep_pf(pf_o), prep_a(A_o), prep_pf(pf_r), prep_a(A_r),
      vsh_tiles, pd_tiles, w_tiles)

    gvsh = gvsh_tiles.sum(axis=0).transpose(1, 0, 2).reshape(3, Vp)[:, :V]
    ga_b = ga.transpose(1, 2, 0)[:B]                    # (B, 24, 12)
    return psum.sum(), gpf[:B], ga_b, gvsh


def _fused_vjp_on() -> bool:
    """NEMO_TPU_SKIN_FUSED_VJP=1: differentiated skin_v2v_l1 calls run the
    one-pass fwd+bwd kernel instead of the fwd-kernel + sign-tensor +
    bwd-kernel pair. Gradients match bit-for-bit on gpf/gA and to last
    reduction bits on gvsh (compiler FMA-fusion context), so this is
    purely a perf knob — no quality gate needed. Default ON: measured
    1085.5 vs 734.6 steps/s (+48%) on the v5e bench; set =0 to fall back
    to the pair."""
    import os
    return os.environ.get("NEMO_TPU_SKIN_FUSED_VJP", "1") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def skin_v2v_l1(V: int, pf_o: jnp.ndarray, A_o: jnp.ndarray,
                v_shaped_t: jnp.ndarray, pd_tiles: jnp.ndarray,
                w_tiles: jnp.ndarray, pf_r: jnp.ndarray,
                A_r: jnp.ndarray) -> jnp.ndarray:
    """sum |skin(pf_r, A_r) - skin(pf_o, A_o)| without materializing either
    mesh (the VPoser v2v objective, vposer_loss :2786-2793). The rec side
    (pf_r, A_r) is a constant — zero gradients, matching the reference's
    detached reconstruction. Backward reuses the standard skinning bwd
    kernel with the stored sign tensor as the cotangent (the VJP is linear
    in g), scaled by -g_hat on its tiny outputs."""
    if _use_pallas():
        total, _, _ = _v2v_fwd_pallas(pf_o, A_o, pf_r, A_r, v_shaped_t,
                                      pd_tiles, w_tiles, V)
        return total
    pd, w = _untile(pd_tiles, w_tiles, V)
    o = _skin_verts_t_xla(pf_o, A_o, v_shaped_t, pd, w)
    r = _skin_verts_t_xla(pf_r, A_r, v_shaped_t, pd, w)
    return jnp.abs(r - o).sum()


def _vp_residual_on() -> bool:
    """NEMO_TPU_SKIN_VP_RES=1: the fused v2v forward stores the orig-side
    posed-vertex planes (table dtype) so the backward skips recomputing
    them (3 K=207 dots = 34% of its MXU work) at the cost of one
    (B, 3, V) HBM round-trip. Bit-identical gradients either way (see
    _bwd_kernel docstring)."""
    import os
    return os.environ.get("NEMO_TPU_SKIN_VP_RES", "0") == "1"


def _v2v_fwd(V, pf_o, A_o, v_shaped_t, pd_tiles, w_tiles, pf_r, A_r):
    fused = None
    if _use_pallas():
        if _fused_vjp_on():
            total, gpf, ga, gvsh = _v2v_fwdbwd_pallas(
                pf_o, A_o, pf_r, A_r, v_shaped_t, pd_tiles, w_tiles, V)
            fused = (gpf, ga, gvsh)
            sign = vp = None
        else:
            total, sign, vp = _v2v_fwd_pallas(pf_o, A_o, pf_r, A_r,
                                              v_shaped_t, pd_tiles, w_tiles,
                                              V, want_vp=_vp_residual_on())
    else:
        pd, w = _untile(pd_tiles, w_tiles, V)
        o = _skin_verts_t_xla(pf_o, A_o, v_shaped_t, pd, w)
        r = _skin_verts_t_xla(pf_r, A_r, v_shaped_t, pd, w)
        diff = r - o
        total = jnp.abs(diff).sum()
        sign = jnp.sign(diff)
        vp = None
    return total, (pf_o, A_o, v_shaped_t, pd_tiles, w_tiles, sign, vp,
                   fused)


def _v2v_bwd(V, res, ghat):
    pf_o, A_o, v_shaped_t, pd_tiles, w_tiles, sign, vp, fused = res
    # d total / d orig = -sign(rec - orig); the skinning VJP is linear in
    # the cotangent, so run it on the raw sign and scale the small outputs
    if fused is not None:
        gpf, ga, gvsh = fused
    elif _use_pallas():
        gpf, ga, gvsh = _bwd_pallas(pf_o, A_o, v_shaped_t, pd_tiles,
                                    w_tiles, V, sign, vp=vp)
    else:
        pd, w = _untile(pd_tiles, w_tiles, V)
        gpf, ga, gvsh = _bwd_xla(pf_o, A_o, v_shaped_t, pd, w,
                                 sign.astype(jnp.float32))
    s = -ghat
    return (gpf * s, ga * s, gvsh * s, jnp.zeros_like(pd_tiles),
            jnp.zeros_like(w_tiles), jnp.zeros_like(pf_o),
            jnp.zeros_like(A_o))


skin_v2v_l1.defvjp(_v2v_fwd, _v2v_bwd)
