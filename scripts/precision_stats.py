"""Paired statistics for the precision-knob validation runs.

Reads one or more JSON lines produced by validate_precision_tpu.py
(the final json.dumps of each run), pools the per-seed pairs, and
reports median/IQR of the bench/f32 ratio, a paired sign test, and a
Wilcoxon signed-rank test on log-ratios. Pure numpy/scipy — safe to
run while a jax process owns the core.

Usage:
  python scripts/precision_stats.py runs.jsonl [more.jsonl ...]
Each input file holds whole-run JSON objects, one per line (grep the
'{' line out of the validate log).
"""

import json
import sys

import numpy as np
from scipy import stats


def main(paths):
    f32, bench = {}, {}
    for path in paths:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                run = json.loads(line)
                f32.update(run["kp_loss_f32"])
                bench.update(run["kp_loss_bench"])
    seeds = sorted(f32, key=int)
    a = np.array([f32[s] for s in seeds])        # all-f32 finals
    b = np.array([bench[s] for s in seeds])      # bench-default finals
    ratio = b / a
    logr = np.log(ratio)
    n = len(seeds)
    worse = int((ratio > 1).sum())
    sign_p = stats.binomtest(worse, n, 0.5).pvalue
    wil = stats.wilcoxon(logr)
    q1, med, q3 = np.percentile(ratio, [25, 50, 75])
    out = {
        "n": n,
        "seeds": [int(s) for s in seeds],
        "ratio_median": round(float(med), 4),
        "ratio_iqr": [round(float(q1), 4), round(float(q3), 4)],
        "ratio_geomean": round(float(np.exp(logr.mean())), 4),
        "bench_worse_count": worse,
        "sign_test_p": round(float(sign_p), 4),
        "wilcoxon_p": round(float(wil.pvalue), 4),
        "f32_within_spread_max_over_min": round(float(a.max() / a.min()), 2),
        "bench_within_spread_max_over_min": round(float(b.max() / b.min()), 2),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:] or sys.exit("need at least one jsonl path"))
