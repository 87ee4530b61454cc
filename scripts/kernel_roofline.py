#!/usr/bin/env python
"""Roofline microbenchmark for the fused skinning kernels (TPU).

Times skin_verts_t forward / backward at the production shape (B=512,
V=6890) across table dtypes (f32 vs the opt-in bf16 mode) and batch-tile
sizes, reports achieved HBM GB/s and MXU GFLOP/s against v5e peaks
(819 GB/s, ~197 TFLOP/s bf16 / ~49 TFLOP/s fp32-via-3-pass), and parity of
bf16 vs f32 outputs/gradients.

Run on the real chip:  python scripts/kernel_roofline.py
(Addresses VERDICT r1 "roofline the skinning kernel with numbers".)
"""

import argparse
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# append (not prepend: PYTHONPATH=repo shadows a module the TPU plugin
# loads and breaks backend discovery) the repo root for nemo_tpu
sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))

from nemo_tpu.ops import lbs_pallas  # noqa: E402

V5E_HBM_GBS = 819.0
V5E_BF16_GFLOPS = 197e3
V5E_F32_GFLOPS = 49e3


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def traffic_bytes(B, V, nv, tv, tb, table_bytes, io_bytes=4, bwd=False):
    """HBM bytes per kernel call. Tables are re-read once per batch tile
    (grid nB x nV); pf/A34/vsh/out move once."""
    n_b = (B + tb - 1) // tb
    tables = n_b * (nv * tv) * (3 * 207 + 24) * table_bytes
    vsh = n_b * 3 * nv * tv * 4
    pf = B * 207 * table_bytes  # cast host-side to the table dtype
    a34 = B * 12 * 24 * table_bytes
    out = B * 3 * nv * tv * io_bytes
    if not bwd:
        return tables + vsh + pf + a34 + out
    g = B * 3 * nv * tv * 4
    gpf = B * 207 * 4 * 1  # accumulated, written once per batch tile row
    ga = B * 12 * 24 * 4
    gvsh = n_b * nv * 3 * tv * 4
    return tables + vsh + pf + a34 + g + gpf + ga + gvsh


def flops_fwd(B, V, nv, tv):
    Vp = nv * tv
    return B * Vp * 2 * (3 * 207 + 12 * 24) + B * Vp * 6


def flops_bwd(B, V, nv, tv):
    Vp = nv * tv
    # vp (3x207) + m_plane (12x24) + ga (12 dots K=TV into 24)
    # + gpf (3 dots K=TV into 207)
    return B * Vp * 2 * (3 * 207 + 12 * 24 + 12 * 24 + 3 * 207) \
        + B * Vp * 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--V", type=int, default=6890)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tv", type=int, default=512)
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--tbs", default="128,256")
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    B, V = args.B, args.V
    rng = np.random.default_rng(0)
    posedirs_t = rng.normal(size=(207, 3, V)).astype(np.float32) * 1e-2
    W_t = rng.dirichlet(np.ones(24), size=V).astype(np.float32).T
    vsh_t = jnp.asarray(rng.normal(size=(3, V)).astype(np.float32))
    pf = jnp.asarray(rng.normal(size=(B, 207)).astype(np.float32) * 0.3)
    A34 = jnp.asarray(rng.normal(size=(B, 24, 12)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, 3, V)).astype(np.float32))

    results = {}
    all_dtypes = {"f32": jnp.float32, "bf16": jnp.bfloat16}
    for dname in args.dtypes.split(","):
        dtype = all_dtypes[dname]
        for tb in [int(x) for x in args.tbs.split(",")]:
            pd_tiles, w_tiles, _ = lbs_pallas.tile_tables(
                posedirs_t, W_t, tv=args.tv, dtype=dtype)
            pd_tiles = jnp.asarray(pd_tiles)
            w_tiles = jnp.asarray(w_tiles)
            nv, _, _, tv = pd_tiles.shape
            tbytes = 2 if dtype == jnp.bfloat16 else 4

            fwd = jax.jit(lambda pf, a: lbs_pallas._fwd_pallas(
                pf, a, vsh_t, pd_tiles, w_tiles, V, tb=tb))
            bwd = jax.jit(lambda pf, a, g: lbs_pallas._bwd_pallas(
                pf, a, vsh_t, pd_tiles, w_tiles, V, g, tb=tb))

            t_f = timeit(fwd, pf, A34, iters=args.iters)
            t_b = timeit(bwd, pf, A34, g, iters=args.iters)
            bf = traffic_bytes(B, V, nv, tv, tb, tbytes)
            bb = traffic_bytes(B, V, nv, tv, tb, tbytes, bwd=True)
            ff, fb = flops_fwd(B, V, nv, tv), flops_bwd(B, V, nv, tv)
            peak = V5E_BF16_GFLOPS if dtype == jnp.bfloat16 \
                else V5E_F32_GFLOPS
            for tag, t, byt, fl in [("fwd", t_f, bf, ff),
                                    ("bwd", t_b, bb, fb)]:
                gbs = byt / t / 1e9
                gfs = fl / t / 1e9
                print(f"{dname} tb={tb} {tag}: {t * 1e6:8.1f} us  "
                      f"{gbs:6.1f} GB/s ({100 * gbs / V5E_HBM_GBS:4.1f}% "
                      f"HBM)  {gfs / 1e3:6.2f} TF/s "
                      f"({100 * gfs / peak:4.1f}% MXU-{dname})")
            results[(dname, tb)] = (fwd(pf, A34), bwd(pf, A34, g))

    # parity: bf16 vs f32 at tb=128
    if ("f32", 128) not in results or ("bf16", 128) not in results:
        return
    o32, g32 = results[("f32", 128)]
    o16, g16 = results[("bf16", 128)]
    s = float(jnp.abs(o32).max())
    err = float(jnp.abs(o16 - o32).max()) / s
    print(f"bf16 fwd max rel err: {err:.2e}")
    for name, a, b in zip(("gpf", "gA34", "gvsh"), g16, g32):
        sb = float(jnp.abs(b).max()) or 1.0
        print(f"bf16 bwd {name} max rel err: "
              f"{float(jnp.abs(a - b).max()) / sb:.2e}")


if __name__ == "__main__":
    main()
