#!/usr/bin/env python
"""Fan-out throughput: aggregate optimization steps/s when S independent
fits share one chip via the vmapped seed axis (nemo_tpu.parallel.
fit_many_seeds — the SLURM-array replacement).

The single-fit step is shape-bound (small K=24/207 contractions at
M=128 batch tiles — see bench.py's MFU and scripts/kernel_roofline.py);
vmapping S fits multiplies the M dimension by S, amortizing pipeline
overhead. This measures how much of that headroom the fan-out recovers.

  python scripts/bench_fanout.py [--seeds 1 2 4 8] [--steps 100]
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=512)
    args = ap.parse_args()

    import os
    os.environ.setdefault("NEMO_TPU_SKIN_BF16", "1")
    os.environ.setdefault("NEMO_TPU_NET_PRECISION", "high")

    import jax
    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.data import synthetic_problem
    from nemo_tpu.fit import NemoConfig, build_assets
    from nemo_tpu.parallel import make_fanout
    from nemo_tpu.priors import init_vposer, synthetic_gmm_prior

    cfg = NemoConfig(
        model_version=2, h_dim=1000, instance_code_size=5,
        phase_rbf_dim=100, rbf_kernel="quadratic",
        monotonic_network_n_nodes=200, phase_init="rand",
        batch_size=args.batch_size, loss="mse_robust",
        weight_vp_loss=10.0, weight_vp_z_loss=1.0, weight_gmm_loss=1.0,
        lr_factor=0.5, label_type="gt",
    )
    model = synthetic_smpl_model(num_vertices=6890, seed=0)
    bundle, _ = synthetic_problem(model, num_views=8, num_frames=120, seed=0)
    assets = build_assets(bundle, model, cfg,
                          gmm=synthetic_gmm_prior(8),
                          vposer=init_vposer(jax.random.PRNGKey(7)))

    results = []
    for S in args.seeds:
        fan, inputs = make_fanout(cfg, assets, S, steps=args.steps)
        jax.block_until_ready(fan(*inputs))   # compile + warm run
        t0 = time.perf_counter()
        _, losses = fan(*inputs)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        agg = S * args.steps / dt
        results.append({"seeds": S, "steps_per_sec_aggregate": round(agg, 1),
                        "steps_per_sec_per_fit": round(agg / S, 1)})
        print(json.dumps(results[-1]))
    print(json.dumps({"metric": "fanout_aggregate_steps_per_sec",
                      "results": results}))


if __name__ == "__main__":
    sys.exit(main())
