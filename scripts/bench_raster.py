#!/usr/bin/env python
"""Rasterizer shoot-out on real hardware: scan vs binned-XLA vs Pallas.

Renders the full synthetic SMPL mesh (6890 verts, nearest-neighbor faces)
at 480x640 and reports per-frame wall times with N frames batched per
dispatch — the axon tunnel costs ~25 ms per host->device dispatch, so
single-call timings measure the tunnel, not the rasterizer (CLAUDE.md's
microbenchmark rule). Offline-rendering throughput only — the fit step
never rasterizes.

Reference points (v5e, N=8): pallas 6.24 ms/frame (streaming-DMA
default with count-bounded folds; 10.2 in gather mode at the
no-overflow faces_per_tile=4096), binned 81.0, scan 94.2.

  python scripts/bench_raster.py [--iters 5] [--frames 8] [--hw 480x640]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--hw", type=str, default="480x640")
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split("x"))
    N = args.frames

    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.ops.raster_pallas import rasterize_triangles_pallas
    from nemo_tpu.render.mesh import (rasterize_triangles,
                                      rasterize_triangles_binned)

    model = synthetic_smpl_model()
    faces = np.asarray(model.faces)
    verts = np.asarray(model.v_template).copy()
    verts -= verts.mean(0)
    verts[:, 2] += 2.5
    vs = jnp.asarray(np.stack([verts + 0.01 * i for i in range(N)],
                              dtype=np.float32))
    foc, ctr = 500.0, (W / 2.0, H / 2.0)
    print(f"mesh: {verts.shape[0]} verts, {faces.shape[0]} faces; "
          f"{H}x{W}; {N} frames/dispatch; backend={jax.default_backend()}")

    def many(fn):
        return jax.jit(lambda vs: [fn(vs[i])[0] for i in range(N)])

    def timeit(fn, iters):
        jax.block_until_ready(fn(vs))          # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(fn(vs))
        return (time.perf_counter() - t0) / iters / N

    runs = [
        ("pallas (32x128 tiles)", many(lambda v: rasterize_triangles_pallas(
            v, faces, foc, ctr, (H, W))), args.iters),
        ("binned (64x64 tiles) ", many(lambda v: rasterize_triangles_binned(
            v, faces, foc, ctr, (H, W))), args.iters),
        ("scan                 ", many(lambda v: rasterize_triangles(
            v, faces, foc, ctr, (H, W))), max(1, args.iters // 2)),
    ]
    base = None
    for name, fn, iters in runs:
        dt = timeit(fn, iters)
        base = base or dt
        print(f"{name}: {dt * 1e3:8.2f} ms/frame  ({dt / base:.2f}x pallas)")


if __name__ == "__main__":
    main()
