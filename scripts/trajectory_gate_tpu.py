#!/usr/bin/env python
"""Paired same-PRNG per-step trajectory gate on the TPU at the bench shape.

The precision-knob ACCEPT decision (docs/precision_knobs.md) leans on the
step-matched trajectory instrument: final fit values are basin-lottery noise
(8-seed spread 11.7-27.6x), but the per-step loss trajectory under identical
PRNG batch streams is tightly coupled and detects real numeric degradation.
Until round 5 that instrument had only run on CPU at 150 steps; this script
runs it ON THE TPU at the full bench workload shape.

For each seed, runs warmup -> camera -> N main steps twice in one process —
(a) all-f32 HIGHEST, (b) bench defaults (NEMO_TPU_SKIN_BF16=1,
NEMO_TPU_NET_PRECISION=high) — with the SAME PRNG key threading (identical
batch streams), collects the per-step kp_loss curves of the main stage, and
reports the median/p90/max per-step relative delta. Curves are saved to an
npz next to the JSON line. Verdict recorded in docs/precision_knobs.md.

  python scripts/trajectory_gate_tpu.py [--seeds 0] [--steps 600]
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))

# --pair precision: the knob comparison the ACCEPT decision defends.
# --pair unroll_control: a CHAOS CONTROL — both sides all-f32 HIGHEST,
#   differing only in the scan unroll factor (a schedule-only change whose
#   per-step math differs at most by XLA fusion/reassociation order, i.e.
#   ulps). If this pair decorrelates over the horizon too, the horizon is
#   beyond the workload's Lyapunov coupling window and per-step deltas
#   there measure chaos, not knob-induced degradation.
PAIRS = {
    "precision": (
        ("f32", {"NEMO_TPU_SKIN_BF16": "0",
                 "NEMO_TPU_NET_PRECISION": "highest"}),
        ("bench", {"NEMO_TPU_SKIN_BF16": "1",
                   "NEMO_TPU_NET_PRECISION": "high"}),
    ),
    "unroll_control": (
        ("f32", {"NEMO_TPU_SKIN_BF16": "0",
                 "NEMO_TPU_NET_PRECISION": "highest",
                 "NEMO_TPU_SCAN_UNROLL": "1"}),
        ("bench", {"NEMO_TPU_SKIN_BF16": "0",
                   "NEMO_TPU_NET_PRECISION": "highest",
                   "NEMO_TPU_SCAN_UNROLL": "4"}),
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--pair", choices=sorted(PAIRS), default="precision")
    ap.add_argument("--out_npz", type=str, default="/tmp/trajectory_gate.npz")
    args = ap.parse_args()
    MODES = PAIRS[args.pair]

    import jax
    import numpy as np

    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.data import synthetic_problem
    from nemo_tpu.fit import NemoConfig, NemoFitter, build_assets
    from nemo_tpu.priors import init_vposer, synthetic_gmm_prior

    cfg = NemoConfig(
        model_version=2, h_dim=1000, instance_code_size=5,
        phase_rbf_dim=100, rbf_kernel="quadratic",
        monotonic_network_n_nodes=200, phase_init="rand",
        batch_size=512, loss="mse_robust",
        weight_vp_loss=10.0, weight_vp_z_loss=1.0, weight_gmm_loss=1.0,
        lr_factor=0.5, n_steps=args.steps, warmup_step=100, opt_cam_step=100,
        label_type="gt",
    )
    model = synthetic_smpl_model(num_vertices=6890, seed=0)

    curves = {}
    summary = {}
    for seed in args.seeds:
        bundle, _ = synthetic_problem(model, num_views=8, num_frames=120,
                                      seed=seed)
        for mode, env in MODES:
            os.environ.update(env)
            assets = build_assets(bundle, model, cfg,
                                  gmm=synthetic_gmm_prior(8),
                                  vposer=init_vposer(jax.random.PRNGKey(7)))
            fitter = NemoFitter(cfg, assets, seed=seed)  # same seed => same
            t0 = time.perf_counter()                     # PRNG batch stream
            fitter.warmup()
            fitter.opt_cam()
            fm = fitter.fit(steps=args.steps)
            curve = np.asarray(fm["kp_loss"], np.float64)
            curves[f"kp_{mode}_s{seed}"] = curve
            print(f"[gate] seed={seed} mode={mode}: final kp="
                  f"{curve[-1]:.4f} ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
        a = curves[f"kp_bench_s{seed}"]
        b = curves[f"kp_f32_s{seed}"]
        rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-12)
        summary[seed] = {
            "median_rel": float(np.median(rel)),
            "p90_rel": float(np.percentile(rel, 90)),
            "max_rel": float(rel.max()),
            "final_rel": float(rel[-1]),
            "final_f32": float(b[-1]), "final_bench": float(a[-1]),
        }

    np.savez(args.out_npz, **curves)
    print(json.dumps({
        "pair": args.pair,
        "steps": args.steps,
        "device": jax.devices()[0].device_kind,
        "per_seed": {str(s): v for s, v in summary.items()},
        "curves_npz": args.out_npz,
    }))


if __name__ == "__main__":
    sys.exit(main())
