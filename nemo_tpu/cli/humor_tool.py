"""CLI: HuMoR training / init-state prior / fitting-eval drivers.

The reference splits these across three scripts:
  * humor/humor/train/train_humor.py        -> `train`
  * humor/humor/train/train_state_prior.py  -> `train-state-prior`
  * humor/humor/fitting/eval_fitting_3d.py  -> `fit-eval`

Usage:
  python -m nemo_tpu.cli.humor_tool train --synthetic 2048 --epochs 3 \
      --batch_size 64 --out /tmp/humor_run [--sched_samp_start 1 \
      --sched_samp_end 3] [--kl_loss 4e-4 ...]
  python -m nemo_tpu.cli.humor_tool train-state-prior \
      --states states.npy --gmm_comps 12 --out /tmp/prior_out
  python -m nemo_tpu.cli.humor_tool fit-eval --results res_root \
      --out /tmp/eval_quant [--synthetic_assets | --smpl_path SMPL.npz] \
      [--stages]

`train --synthetic N` draws smooth synthetic state sequences so the full
loop (scheduled sampling, LR schedule, NaN guard, JSONL stats, params
checkpoint) runs end-to-end without AMASS on disk; with real data, feed
shards whose rows are (T+1)-frame aligned-local state windows via
--shards (data.sharded layout, key 'states').
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train the HuMoR CVAE")
    t.add_argument("--shards", type=str, default="",
                   help="sharded dataset dir with 'states' (B, T+1, 207)")
    t.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic sequences instead of shards")
    t.add_argument("--seq_len", type=int, default=6,
                   help="transitions per window (synthetic mode)")
    t.add_argument("--epochs", type=int, default=2)
    t.add_argument("--batch_size", type=int, default=64)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--decay", type=float, default=0.0)
    t.add_argument("--sched_milestones", type=int, nargs="*", default=[])
    t.add_argument("--sched_decay", type=float, default=0.1)
    t.add_argument("--sched_samp_start", type=int, default=None)
    t.add_argument("--sched_samp_end", type=int, default=None)
    t.add_argument("--kl_loss", type=float, default=4e-4)
    t.add_argument("--kl_loss_anneal_start", type=int, default=0)
    t.add_argument("--kl_loss_anneal_end", type=int, default=0)
    t.add_argument("--kl_loss_cycle_len", type=int, default=-1)
    t.add_argument("--contacts_loss", type=float, default=0.01)
    t.add_argument("--contacts_vel_loss", type=float, default=0.0)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--out", type=str, required=True)

    s = sub.add_parser("train-state-prior",
                       help="fit the init-state GMM (EM)")
    s.add_argument("--states", type=str, default="",
                   help=".npy of (N, 138) init states; synthetic if empty")
    s.add_argument("--synthetic", type=int, default=4000)
    s.add_argument("--gmm_comps", type=int, default=12)
    s.add_argument("--iters", type=int, default=100)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--out", type=str, required=True)

    e = sub.add_parser("fit-eval",
                       help="quant eval of fitting result dirs -> CSVs")
    e.add_argument("--results", type=str, required=True)
    e.add_argument("--out", type=str, required=True)
    e.add_argument("--smpl_path", type=str, default="")
    e.add_argument("--synthetic_assets", action="store_true", default=False)
    e.add_argument("--stages", action="store_true", default=False,
                   help="also evaluate stage*_results.npz like "
                        "--quant-stages")
    return p


def _synthetic_windows(rng, n, t, state_dim):
    """Smooth random walks as stand-in aligned-local state windows."""
    x0 = rng.standard_normal((n, 1, state_dim)) * 0.3
    steps = rng.standard_normal((n, t, state_dim)) * 0.05
    return np.cumsum(np.concatenate([x0, steps], axis=1),
                     axis=1).astype(np.float32)


def cmd_train(args) -> int:
    import jax
    import jax.numpy as jnp
    from ..models.humor import (HumorConfig, NUM_CONTACTS, STATE_DIM,
                                init_humor)
    from ..models.humor_loss import (HumorLossConfig,
                                     make_humor_full_train_step)

    os.makedirs(args.out, exist_ok=True)
    cfg = HumorConfig()
    lcfg = HumorLossConfig(
        kl_loss=args.kl_loss,
        kl_loss_anneal_start=args.kl_loss_anneal_start,
        kl_loss_anneal_end=args.kl_loss_anneal_end,
        kl_loss_cycle_len=args.kl_loss_cycle_len,
        contacts_loss=args.contacts_loss,
        contacts_vel_loss=args.contacts_vel_loss)
    use_ss = args.sched_samp_start is not None \
        and args.sched_samp_end is not None

    key = jax.random.PRNGKey(args.seed)
    key, kp = jax.random.split(key)
    params = init_humor(kp, cfg)
    init, step = make_humor_full_train_step(
        cfg, lcfg, lr=args.lr, weight_decay=args.decay,
        sched_milestones=tuple(args.sched_milestones),
        sched_decay=args.sched_decay,
        sched_samp_start=args.sched_samp_start,
        sched_samp_end=args.sched_samp_end)
    opt_state = init(params)

    if args.shards:
        from ..data.sharded import ShardedDataset, batch_iterator
        ds = ShardedDataset(args.shards)
        n_batches = max(1, len(ds) // args.batch_size)

        def epoch_batches(epoch):
            it = batch_iterator(ds, args.batch_size, seed=epoch)
            for _ in range(n_batches):
                yield next(it)["states"]
    else:
        n = args.synthetic or 2048
        rng = np.random.default_rng(args.seed)
        windows = _synthetic_windows(rng, n, args.seq_len, STATE_DIM)
        n_batches = max(1, n // args.batch_size)

        def epoch_batches(epoch):
            order = np.random.default_rng(epoch).permutation(n)
            for i in range(n_batches):
                yield windows[order[i * args.batch_size:
                                    (i + 1) * args.batch_size]]

    log_path = osp.join(args.out, "train_stats.jsonl")
    with open(log_path, "w") as logf:
        for epoch in range(args.epochs):
            t0 = time.time()
            agg, cnt = {}, 0
            for win in epoch_batches(epoch):
                win = jnp.asarray(win)
                if use_ss:
                    x_past, x_t = win[:, :-1], win[:, 1:]
                else:  # fully-supervised per-transition batching
                    x_past = win[:, :-1].reshape(-1, win.shape[-1])
                    x_t = win[:, 1:].reshape(-1, win.shape[-1])
                key, kb = jax.random.split(key)
                params, opt_state, stats = step(params, opt_state, x_past,
                                                x_t, kb, epoch)
                for k, v in stats.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
                cnt += 1
            row = {k: v / cnt for k, v in agg.items()}
            row.update(epoch=epoch, sec=round(time.time() - t0, 2))
            logf.write(json.dumps(row) + "\n")
            logf.flush()
            print(f"[humor-train] epoch {epoch}: "
                  f"loss={row.get('loss', float('nan')):.4f} "
                  f"kl={row.get('kl_loss', float('nan')):.4f} "
                  f"lr={row.get('lr', float('nan')):.2e} "
                  f"skipped={row.get('update_skipped', 0.0):.2f}")

    ckpt = osp.join(args.out, "humor_params.npz")
    flat = {f"{m}.{k}": np.asarray(v) for m, sub in params.items()
            for k, v in sub.items()}
    np.savez(ckpt, **flat)
    print(f"[humor-train] params -> {ckpt}, stats -> {log_path}")
    return 0


def cmd_train_state_prior(args) -> int:
    import jax
    import jax.numpy as jnp
    from ..models.humor_state_prior import (fit_state_prior_gmm,
                                            save_state_prior_gmm)

    os.makedirs(args.out, exist_ok=True)
    if args.states:
        states = np.load(args.states)
    else:
        rng = np.random.default_rng(args.seed)
        centers = rng.standard_normal((args.gmm_comps, 138)) * 2.0
        comp = rng.integers(0, args.gmm_comps, args.synthetic)
        states = (centers[comp]
                  + rng.standard_normal((args.synthetic, 138)) * 0.3)
    print(f"[state-prior] fitting GMM({args.gmm_comps}) to "
          f"{states.shape} states...")
    gmm, ll = fit_state_prior_gmm(jnp.asarray(states, jnp.float32),
                                  n_components=args.gmm_comps,
                                  n_iter=args.iters,
                                  key=jax.random.PRNGKey(args.seed))
    out = osp.join(args.out, "prior_gmm.npz")
    save_state_prior_gmm(out, gmm)
    # the reference prints the fitted shapes (train_state_prior.py:118-121)
    print(np.asarray(gmm["weights"]).shape)
    print(np.asarray(gmm["means"]).shape)
    print(np.asarray(gmm["covariances"]).shape)
    print(f"[state-prior] mean log-lik {float(ll[-1]):.4f} -> {out}")
    return 0


def cmd_fit_eval(args) -> int:
    import jax.numpy as jnp
    from ..body.assets import load_smpl_npz, synthetic_smpl_model
    from ..body.smpl import smpl_forward
    from ..models.humor_fit_eval import eval_fitting_results_dirs

    model = (load_smpl_npz(args.smpl_path) if args.smpl_path
             else synthetic_smpl_model())

    def smpl_fn(trans, root_orient, pose_body, betas):
        T = trans.shape[0]
        body = np.zeros((T, 69), np.float32)
        body[:, :63] = pose_body  # 21 SMPL-H body joints; hands stay zero
        verts, _, fk = smpl_forward(
            model, jnp.asarray(betas[:, :10], jnp.float32),  # 10-beta SMPL
            jnp.asarray(body), jnp.asarray(root_orient, jnp.float32),
            pose2rot=True, transl=jnp.asarray(trans, jnp.float32),
            want_fk_joints=True)
        # fk joints are SMPL tree order; humor eval uses the first 22
        return np.asarray(fk), np.asarray(verts)

    seqs = eval_fitting_results_dirs(args.results, args.out, smpl_fn,
                                     eval_stages=args.stages)
    print(f"[fit-eval] evaluated {len(seqs)} sequences -> {args.out}")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "train":
        return cmd_train(args)
    if args.cmd == "train-state-prior":
        return cmd_train_state_prior(args)
    return cmd_fit_eval(args)


if __name__ == "__main__":
    sys.exit(main())
