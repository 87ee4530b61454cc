#!/usr/bin/env python
"""Benchmark: NeMo fit optimization-step throughput on one chip.

Runs the reference workload shape (BASELINE.md: NemoV2, batch 512, h_dim
1000, RBF 100, 8 views) on a synthetic bundle at full SMPL scale (6890
vertices) with the VPoser + GMM priors active, and reports optimization
steps/second for the main fit stage.

Baseline: the PyTorch reference runs this loop at roughly 3-6 steps/s on a
single GPU (each step: 3 SMPL forwards at batch 512 + per-step host syncs;
no published numbers exist — BASELINE.md). vs_baseline uses 5 steps/s as the
reference point; the north star is >= 10x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


# ESTIMATE, not a measurement: the reference publishes no throughput numbers
# and no GPU exists on this box to run it (see BASELINE.md). Derived from
# tqdm-style step pacing of comparable single-GPU torch fit loops; every
# "vs_baseline"/"~50x" figure downstream inherits this caveat.
REFERENCE_STEPS_PER_SEC = 5.0

# bf16 MXU peak by device kind (the bench default runs skinning tables and
# network matmuls in bf16-class passes, so bf16 peak is the MFU denominator;
# the f32 fraction of the step makes the reported MFU slightly conservative).
# v5e is 197 TF/s bf16 (394 is its INT8 number — round-3 fix; consistent
# with the round-2 roofline's ~49 TF/s 6-pass-f32 rate = 197/4).
_BF16_PEAK_FLOPS = {
    "TPU v5e": 197e12, "TPU v5 lite": 197e12, "TPU v5litepod": 197e12,
    "TPU v5p": 459e12, "TPU v5": 459e12,
    "TPU v4": 275e12, "TPU v6e": 918e12, "TPU v6 lite": 918e12,
}


def step_flops(cfg, num_vertices: int, params, vposer) -> float:
    """Analytic FLOPs of ONE main-stage optimization step.

    Counts the terms that dominate the roofline (ROADMAP profile):
      * skinning pose-offset matmuls (B, 207) @ (207, 3V): two forwards
        (predicted mesh + VPoser-reconstructed mesh inside the fused
        v2v-L1 kernel) + one backward (the reconstruction side; the
        predicted side is detached in the v2v prior)
      * skinning transform composes W(V, 24) @ A(B, 24, 16) and the
        per-vertex affine apply, same three passes
      * every dense layer (MotionNet trunk/heads, RBF, VPoser enc/dec)
        at 6*B*m*n (forward + input-grad + weight-grad matmuls)
    Elementwise work (rotations, losses, Adam) is bandwidth- not
    FLOP-bound and intentionally excluded.
    """
    B = cfg.batch_size
    V = num_vertices
    f = 0.0
    f += 3 * 2.0 * B * 207 * 3 * V          # pose-offset matmuls
    f += 3 * 2.0 * B * 24 * 16 * V          # T = W @ A composes
    f += 3 * 2.0 * B * V * 12               # affine vertex transform
    for tree in (params.get("motion"), params.get("rbf"), vposer):
        if tree is None:
            continue
        for leaf in jax.tree_util.tree_leaves(tree):
            a = np.asarray(leaf)
            if a.ndim == 2 and min(a.shape) > 1:
                f += 6.0 * B * a.shape[0] * a.shape[1]
    return f


def main():
    import os
    # Recommended production setting: bf16 skinning tables (f32 accumulate).
    # Parity-gated (tests/test_lbs_pallas.py::test_bf16_tables_parity) and
    # quality-validated (tests/test_fit.py::test_skin_bf16_quality, final
    # kp_loss within 10% of f32 on synthetic-GT fits; measured delta ~0).
    # f32 reference point on this chip: 248.9 steps/s (ROADMAP).
    os.environ.setdefault("NEMO_TPU_SKIN_BF16", "1")
    # Network MLPs at 3-pass-bf16 matmul precision (geometry stays
    # HIGHEST). Quality-validated on TPU: 600-step fits end at kp_loss
    # 1485.4 (highest) vs 1490.2 (high), a 0.3% delta within run noise.
    os.environ.setdefault("NEMO_TPU_NET_PRECISION", "high")
    # 4-step scan unroll: measured +3.4% on v5e (ROADMAP round-5 sweep:
    # 1092.4 -> 1129.1 steps/s; x2 +1.8%, x5 +2.7%, x8 falls back).
    # Schedule-only change: identical math modulo XLA reassociation (bit-
    # identical for ~19 TPU steps, then chaotic divergence like any ulp
    # perturbation — measured, docs/precision_knobs.md trajectory gate).
    os.environ.setdefault("NEMO_TPU_SCAN_UNROLL", "4")

    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.data import synthetic_problem
    from nemo_tpu.fit import NemoConfig, NemoFitter, build_assets
    from nemo_tpu.priors import init_vposer, synthetic_gmm_prior

    # Reference workload shape (run_scripts_examples/nemomocap-example.sh)
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
    fitter = NemoFitter(cfg, assets, seed=0)

    # Warm the compile caches with tiny stage runs.
    fitter.warmup(2)
    fitter.opt_cam(2)
    fitter.fit(steps=2, chunk=2)

    # Timed run: >=3 independent full 500-step main-stage chunks, fully
    # on-device; median is the headline, min/max bound the run-to-run noise
    # floor (VERDICT r4 item 3: single-shot deltas of a few percent were
    # uninterpretable).
    n_timed = 500
    n_repeats = int(os.environ.get("NEMO_TPU_BENCH_REPEATS", "3"))
    run = fitter._stage_scan("main", n_timed)
    st = fitter.state
    carry = (st.params, st.opt_state, st.plateau, st.key)
    # compile
    out = run(carry)
    jax.block_until_ready(out)
    rates = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        out = run(carry)
        jax.block_until_ready(out)
        rates.append(n_timed / (time.perf_counter() - t0))

    steps_per_sec = float(np.median(rates))

    # Whole-step MFU (VERDICT r2 item 7): analytic FLOPs x measured rate
    # against the chip's bf16 peak. The step is SHAPE-bound (small K=24/207
    # contractions at M=128 tiles — kernel_roofline.py), so low MFU here is
    # a property of the workload, not unexhausted headroom.
    vposer = assets.vposer
    flops = step_flops(cfg, model.num_vertices, fitter.state.params, vposer)
    achieved = flops * steps_per_sec
    kind = jax.devices()[0].device_kind
    peak = _BF16_PEAK_FLOPS.get(kind)
    print(json.dumps({
        "metric": "nemo_v2_fit_steps_per_sec_batch512",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
        "repeats": n_repeats,
        "steps_per_sec_min": round(min(rates), 2),
        "steps_per_sec_max": round(max(rates), 2),
        "flops_per_step": round(flops),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu_pct": (round(100 * achieved / peak, 2) if peak else None),
        "device_kind": kind,
    }))


if __name__ == "__main__":
    sys.exit(main())
