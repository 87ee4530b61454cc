"""CLI: fit a suite of actions (the reference's 5-action NeMo-MoCap sweep).

The reference fans out one SLURM job per action
(run_scripts_examples/nemomocap-example.sh:60-82). Here the suite runs
sequentially on one chip — each action's whole fit is a handful of on-device
scans — or, for same-shape multi-seed sweeps, via the vmapped fan-out
(nemo_tpu.parallel.fit_many_seeds).

Usage:
  python -m nemo_tpu.cli.fit_suite --bundles a.npz b.npz c.npz \
      --default_config configs/default-v2.yml --out_dir out/suite
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys


def _final_total_loss(run_root: str) -> float:
    """Best (latest) run dir's final total_loss from its metrics.jsonl."""
    import json
    import os
    runs = sorted(d for d in os.listdir(run_root)
                  if osp.isdir(osp.join(run_root, d)))
    if not runs:
        return float("inf")
    path = osp.join(run_root, runs[-1], "metrics.jsonl")
    final = float("inf")
    try:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("phase") == "final":
                    final = float(rec.get("total_loss", final))
    except OSError:
        pass
    return final


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--bundles", nargs="+", required=True)
    parser.add_argument("--out_dir", type=str, default="out/suite")
    parser.add_argument("--seeds", type=int, default=1,
                        help=">1 fits each action once per seed (the "
                             "reference launcher's seed grid, nemo-run.sh) "
                             "and records the best by final total loss; "
                             "same-shape MAIN-stage-only sweeps can instead "
                             "use the vmapped nemo_tpu.parallel."
                             "fit_many_seeds")
    args, passthrough = parser.parse_known_args(argv)

    from .fit import main as fit_main

    best_by_action = {}
    for bundle in args.bundles:
        name = osp.splitext(osp.basename(bundle))[0]
        best = (float("inf"), None)
        for seed in range(args.seeds):
            out = osp.join(args.out_dir, name) if args.seeds == 1 else \
                osp.join(args.out_dir, name, f"seed{seed}")
            print(f"\n=== action: {name} seed: {seed} ===")
            rc = fit_main(["--bundle", bundle, "--out_dir", out,
                           "--seed", str(seed)] + passthrough)
            if rc != 0:
                return rc
            loss = _final_total_loss(out)
            if loss < best[0]:
                best = (loss, out)
        best_by_action[name] = best
        if args.seeds > 1:
            print(f"[suite] {name}: best seed run {best[1]} "
                  f"(total_loss {best[0]:.4f})")
            with open(osp.join(args.out_dir, name, "best.txt"), "w") as f:
                f.write(f"{best[1]}\n{best[0]}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
