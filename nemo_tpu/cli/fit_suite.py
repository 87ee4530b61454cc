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


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--bundles", nargs="+", required=True)
    parser.add_argument("--out_dir", type=str, default="out/suite")
    parser.add_argument("--seeds", type=int, default=1,
                        help=">1 fits each action with multiple seeds via "
                             "the vmapped fan-out and keeps the best")
    args, passthrough = parser.parse_known_args(argv)

    from .fit import main as fit_main

    for bundle in args.bundles:
        name = osp.splitext(osp.basename(bundle))[0]
        out = osp.join(args.out_dir, name)
        print(f"\n=== action: {name} ===")
        rc = fit_main(["--bundle", bundle, "--out_dir", out] + passthrough)
        if rc != 0:
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
