#!/usr/bin/env python
"""Measured same-host anchor for vs_baseline: torch reference twin vs jax.

bench.py's `vs_baseline` divides by an ESTIMATED 5 steps/s for the torch
reference on a GPU (no GPU exists on this box, and the reference publishes
no numbers). This script removes the estimate from one axis: it times the
SAME main-stage optimization step on the SAME host CPU twice —

  (a) torch: tests/torch_twin.py's TorchNemoV2.fit_loss + backward +
      the reference's per-group Adams. The twin is pinned to the literal
      reference code by tests/test_reference_import_oracle.py (leaf
      modules imported from /root/reference) and to the jax side by
      tests/test_reference_twin.py, so its step IS the reference's step
      numerics, minus the proprietary asset files.
  (b) jax (CPU backend): the production NemoFitter main-stage scan.

Both run the bench workload shape (NemoV2, batch 512, h=1000, 6890-vertex
SMPL, 8 views x 120 frames). The printed ratio is a MEASURED same-silicon
framework comparison (eager torch vs compiled XLA); it does NOT replace
the GPU baseline estimate — it bounds the framework-efficiency component
of it. Results are recorded in BASELINE.md.

Usage (takes several minutes on one core; do not run alongside the TPU):
  python scripts/bench_twin_cpu.py [--torch_steps 5] [--jax_steps 50]
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.append(osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                         "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_steps", type=int, default=10)
    ap.add_argument("--jax_steps", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--num_vertices", type=int, default=6890)
    ap.add_argument("--h_dim", type=int, default=1000)
    args = ap.parse_args()

    import jax
    # Same silicon on both sides: force the CPU backend before first use
    # (env vars are too late here — the axon TPU plugin wins; CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    # One core on this host; pin torch so the ratio is stable (ADVICE r4).
    torch.set_num_threads(1)

    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.data import synthetic_problem
    from nemo_tpu.fit import NemoConfig, NemoFitter, build_assets, init_params
    from nemo_tpu.priors import init_vposer, synthetic_gmm_prior
    from torch_twin import TorchNemoV2

    cfg = NemoConfig(
        model_version=2, h_dim=args.h_dim, instance_code_size=5,
        phase_rbf_dim=100, rbf_kernel="quadratic",
        monotonic_network_n_nodes=200, phase_init="rand",
        batch_size=args.batch_size, loss="mse_robust",
        weight_vp_loss=10.0, weight_vp_z_loss=1.0, weight_gmm_loss=1.0,
        lr_factor=0.5, n_steps=2000, warmup_step=300, opt_cam_step=1000,
        label_type="gt",
    )
    model = synthetic_smpl_model(num_vertices=args.num_vertices, seed=0)
    bundle, _ = synthetic_problem(model, num_views=8, num_frames=120, seed=0)
    gmm = synthetic_gmm_prior(8)
    vposer = init_vposer(jax.random.PRNGKey(7))
    assets = build_assets(bundle, model, cfg, gmm=gmm, vposer=vposer)

    # ---- torch side: the reference's step, as the eager loop runs it ----
    params_np = jax.tree_util.tree_map(
        np.asarray, init_params(jax.random.PRNGKey(0), cfg,
                                assets.num_views, assets.img_d0))
    twin = TorchNemoV2(cfg, model,
                       {k: np.asarray(v) for k, v in vposer.items()},
                       gmm,
                       np.asarray(assets.points2d_gt),
                       np.asarray(assets.bbox_diag),
                       assets.img_d0, assets.img_d1)
    twin.set_params(params_np)
    topts = twin.make_optimizers()
    rng = np.random.RandomState(0)

    def torch_step(i):
        vi = torch.as_tensor(
            rng.randint(0, assets.num_views, size=cfg.batch_size)).long()
        fi = torch.as_tensor(
            rng.randint(0, assets.num_frames, size=cfg.batch_size)).long()
        for o in topts:
            o.zero_grad()
        loss, _ = twin.fit_loss(vi, fi)
        loss.backward()
        for o in topts:
            o.step()
        return float(loss)

    torch_step(0)  # warm lazy allocs
    torch_times = []
    for i in range(args.torch_steps):
        t0 = time.perf_counter()
        torch_step(1 + i)
        torch_times.append(time.perf_counter() - t0)
    torch_dt = float(np.median(torch_times))

    # ---- jax side: the production main-stage scan, compiled once ----
    fitter = NemoFitter(cfg, assets, seed=0)
    run = fitter._stage_scan("main", args.jax_steps)
    st = fitter.state
    carry = (st.params, st.opt_state, st.plateau, st.key)
    jax.block_until_ready(run(carry))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run(carry))
    jax_dt = (time.perf_counter() - t0) / args.jax_steps

    print(json.dumps({
        "host": "cpu (same core both sides)",
        "shape": {"batch": cfg.batch_size, "verts": args.num_vertices,
                  "h_dim": args.h_dim, "views": 8, "frames": 120},
        "torch_ms_per_step": round(torch_dt * 1e3, 1),
        "torch_ms_per_step_min": round(min(torch_times) * 1e3, 1),
        "torch_ms_per_step_max": round(max(torch_times) * 1e3, 1),
        "torch_steps_per_sec": round(1.0 / torch_dt, 3),
        "jax_cpu_ms_per_step": round(jax_dt * 1e3, 1),
        "jax_cpu_steps_per_sec": round(1.0 / jax_dt, 3),
        "jax_over_torch_same_host": round(torch_dt / jax_dt, 2),
        "torch_threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    sys.exit(main())
