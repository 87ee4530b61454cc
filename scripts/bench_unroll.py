#!/usr/bin/env python
"""Paired same-session measurement of NEMO_TPU_SCAN_UNROLL on the bench.

Runs bench.py's workload (bench-default knobs) and times the 500-step
main-stage scan at each requested unroll factor IN ONE PROCESS (one axon
handshake; the knob is read at trace time, so a fresh NemoFitter per
factor picks up the env change). Prints one JSON line with steps/s per
factor. Verdict recorded in ROADMAP.md.

  python scripts/bench_unroll.py [--factors 1 2 4] [--steps 500]
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--steps", type=int, default=500)
    args = ap.parse_args()

    os.environ.setdefault("NEMO_TPU_SKIN_BF16", "1")
    os.environ.setdefault("NEMO_TPU_NET_PRECISION", "high")

    import jax

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
        lr_factor=0.5, n_steps=2000, warmup_step=300, opt_cam_step=1000,
        label_type="gt",
    )
    model = synthetic_smpl_model(num_vertices=6890, seed=0)
    bundle, _ = synthetic_problem(model, num_views=8, num_frames=120, seed=0)
    assets = build_assets(bundle, model, cfg,
                          gmm=synthetic_gmm_prior(8),
                          vposer=init_vposer(jax.random.PRNGKey(7)))

    out = {}
    for factor in args.factors:
        os.environ["NEMO_TPU_SCAN_UNROLL"] = str(factor)
        fitter = NemoFitter(cfg, assets, seed=0)
        run = fitter._stage_scan("main", args.steps)
        st = fitter.state
        carry = (st.params, st.opt_state, st.plateau, st.key)
        jax.block_until_ready(run(carry))  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry))
        dt = time.perf_counter() - t0
        out[factor] = round(args.steps / dt, 1)
        print(f"[unroll] factor={factor}: {out[factor]} steps/s", flush=True)

    print(json.dumps({"steps": args.steps,
                      "steps_per_sec_by_unroll": out}))


if __name__ == "__main__":
    sys.exit(main())
