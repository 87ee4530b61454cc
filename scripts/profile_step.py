#!/usr/bin/env python
"""Profile the main-fit optimization step and print the device-kernel
breakdown (top ops by total device time over a 50-step scan).

Runs the bench workload (NemoV2, batch 512, full SMPL, VPoser+GMM) under
jax.profiler.trace and aggregates the perfetto trace events host-side.

  python scripts/profile_step.py [--steps 50] [--skin_bf16]
"""

import argparse
import glob
import gzip
import json
import os
import os.path as osp
import sys
import time

sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))


def summarize_trace(trace_dir, top=20):
    files = glob.glob(osp.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print(f"no trace files under {trace_dir}")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    # device-track events: pid names containing 'TPU' / 'device'
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "Device" in n or "device" in n}
    totals, counts = {}, {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0)
        totals[name] = totals.get(name, 0) + dur
        counts[name] = counts.get(name, 0) + 1
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    grand = sum(totals.values())
    print(f"total device time: {grand / 1e3:.2f} ms "
          f"across {len(totals)} distinct ops")
    for name, us in ranked:
        print(f"{us / 1e3:9.3f} ms  x{counts[name]:<5d} "
              f"{100 * us / max(grand, 1):5.1f}%  {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--skin_bf16", action="store_true")
    ap.add_argument("--trace_dir", default="/tmp/nemo_step_trace")
    args = ap.parse_args()
    if args.skin_bf16:
        os.environ["NEMO_TPU_SKIN_BF16"] = "1"

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
    assets = build_assets(bundle, model, cfg, gmm=synthetic_gmm_prior(8),
                          vposer=init_vposer(jax.random.PRNGKey(7)))
    fitter = NemoFitter(cfg, assets, seed=0)
    fitter.warmup(2)
    fitter.opt_cam(2)
    fitter.fit(steps=2, chunk=2)

    run = fitter._stage_scan("main", args.steps)
    st = fitter.state
    carry = (st.params, st.opt_state, st.plateau, st.key)
    out = run(carry)  # compile
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        out = run(carry)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt * 1e3:.1f} ms "
          f"({dt / args.steps * 1e3:.3f} ms/step, "
          f"{args.steps / dt:.1f} steps/s)")
    summarize_trace(args.trace_dir)


if __name__ == "__main__":
    main()
