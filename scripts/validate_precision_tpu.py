#!/usr/bin/env python
"""Multi-seed TPU quality validation of the bench-default precision knobs.

For each seed, runs the full 3-stage fit (warmup -> camera -> 600 main
steps) at the bench workload shape twice — (a) all-f32 HIGHEST and (b) the
bench defaults NEMO_TPU_SKIN_BF16=1 + NEMO_TPU_NET_PRECISION=high — in ONE
process (the axon tunnel handshake is per-process, and the knobs are read
at trace time so fresh fitters pick up env changes). Prints a JSON table of
final full-grid eval kp_loss per (mode, seed) plus per-seed ratios.
Results are recorded in docs/precision_knobs.md.

  python scripts/validate_precision_tpu.py [--seeds 0 1 2] [--steps 600]
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))

MODES = (
    ("f32", {"NEMO_TPU_SKIN_BF16": "0", "NEMO_TPU_NET_PRECISION": "highest"}),
    ("bench", {"NEMO_TPU_SKIN_BF16": "1", "NEMO_TPU_NET_PRECISION": "high"}),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--steps", type=int, default=600)
    args = ap.parse_args()

    import jax

    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.data import synthetic_problem
    from nemo_tpu.fit import NemoConfig, NemoFitter, build_assets
    from nemo_tpu.priors import init_vposer, synthetic_gmm_prior

    # bench.py's reference workload shape, with a fit-length schedule
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

    table = {m: {} for m, _ in MODES}
    for seed in args.seeds:
        bundle, _ = synthetic_problem(model, num_views=8, num_frames=120,
                                      seed=seed)
        for mode, env in MODES:
            os.environ.update(env)
            # assets rebuilt per mode: the skinning-table dtype is chosen
            # at build; fresh fitter closures re-trace under the new env
            assets = build_assets(bundle, model, cfg,
                                  gmm=synthetic_gmm_prior(8),
                                  vposer=init_vposer(jax.random.PRNGKey(7)))
            fitter = NemoFitter(cfg, assets, seed=seed)
            t0 = time.perf_counter()
            fitter.warmup()
            fitter.opt_cam()
            fitter.fit(steps=args.steps)
            final = fitter.eval_loss()
            kp = float(final["kp_loss"])
            table[mode][seed] = kp
            print(f"[validate] seed={seed} mode={mode}: kp_loss={kp:.4f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

    ratios = {s: table["bench"][s] / table["f32"][s] for s in args.seeds}
    med = sorted(ratios.values())[len(ratios) // 2]
    print(json.dumps({
        "steps": args.steps,
        "kp_loss_f32": table["f32"],
        "kp_loss_bench": table["bench"],
        "ratio_bench_over_f32": {s: round(r, 4) for s, r in ratios.items()},
        "ratio_median": round(med, 4),
        "ratio_max": round(max(ratios.values()), 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
