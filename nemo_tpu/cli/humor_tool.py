"""CLI: HuMoR training / init-state prior / fitting-eval drivers.

The reference splits these across four scripts:
  * humor/humor/train/train_humor.py           -> `train`
  * humor/humor/train/train_state_prior.py     -> `train-state-prior`
  * humor/humor/fitting/eval_fitting_3d.py     -> `fit-eval`
  * humor/humor/scripts/process_amass_data.py  -> `process-amass`

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
--shards (data.sharded layout, key 'states'), or point --amass at a
`process-amass` output tree (windows assembled + canonicalized on the
fly per --amass_split/--amass_stride).

  python -m nemo_tpu.cli.humor_tool process-amass --amass_root raw/ \
      --out processed/ [--datasets CMU KIT] [--smpl_path SMPL.npz] \
      [--cleanup_backup removed/]
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
    t.add_argument("--amass", type=str, default="",
                   help="processed AMASS root (process-amass output); "
                        "windows assembled per --amass_split/--amass_stride")
    t.add_argument("--amass_split", type=str, default="train",
                   choices=["train", "val", "test", "all"])
    t.add_argument("--amass_stride", type=int, default=10)
    t.add_argument("--amass_max_windows", type=int, default=0)
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

    fr = sub.add_parser(
        "fit-rgb",
        help="RGB video fitting driver: OpenPose keypoints -> 3-stage "
             "HuMoR MotionOptimizer per overlapping subsequence -> "
             "stitched final_results (run_fitting.py data_type=RGB)")
    fr.add_argument("--joints2d", type=str, required=True,
                    help="dir of OpenPose *_keypoints.json")
    fr.add_argument("--out", type=str, required=True)
    fr.add_argument("--img_dir", type=str, default="")
    fr.add_argument("--masks", type=str, default="")
    fr.add_argument("--mask_joints", action="store_true", default=False)
    fr.add_argument("--planercnn", type=str, default="")
    fr.add_argument("--intrinsics", type=str, default="",
                    help="json 3x3 camera matrix; default: the reference's "
                         "DEFAULT_FOCAL_LEN at the image center")
    fr.add_argument("--im_dim", type=int, nargs=2, default=[1920, 1080])
    fr.add_argument("--seq_len", type=int, default=60)
    fr.add_argument("--overlap_len", type=int, default=10)
    fr.add_argument("--smpl_path", type=str, default="")
    fr.add_argument("--humor_ckpt", type=str, default="",
                    help="humor params (.npz from `train` or torch ckpt); "
                         "default: random init (smoke/debug)")
    fr.add_argument("--init_motion_prior", type=str, default="",
                    help="dir with prior_gmm.npz")
    fr.add_argument("--latent_size", type=int, default=48)
    fr.add_argument("--steps", type=int, nargs=3, default=[30, 80, 70],
                    metavar=("S1", "S2", "S3"))
    fr.add_argument("--lr", type=float, default=1e-2)
    fr.add_argument("--cam_t", type=float, nargs=3, default=[0.0, 0.0, 2.5])
    fr.add_argument("--seed", type=int, default=0)

    vz = sub.add_parser(
        "viz-fit",
        help="Render fitting result dirs: camera-view mesh overlay video "
             "per sequence (+ observed 2D joints, + canonical prior-frame "
             "view) — the fitting/viz_fitting_rgb.py surface on the "
             "framework render stack")
    vz.add_argument("--results", type=str, required=True,
                    help="results_out dir (per-seq dirs / final_results)")
    vz.add_argument("--out", type=str, required=True)
    vz.add_argument("--final_only", action="store_true", default=False,
                    help="only visualize final_results (--viz-final-only)")
    vz.add_argument("--obs_2d", action="store_true", default=False,
                    help="draw observed joints2d over the frames "
                         "(--viz-obs-2d)")
    vz.add_argument("--prior_frame", action="store_true", default=False,
                    help="also render the *_prior.npz canonical-frame "
                         "motion (--viz-prior-frame)")
    vz.add_argument("--im_dim", type=int, nargs=2, default=[1280, 720],
                    metavar=("W", "H"),
                    help="render size (--viz-render-width/height)")
    vz.add_argument("--fps", type=float, default=30.0)
    vz.add_argument("--every", type=int, default=1)
    vz.add_argument("--max_seqs", type=int, default=0)
    vz.add_argument("--smpl_path", type=str, default="")
    vz.add_argument("--method", type=str, default="auto",
                    choices=["auto", "raster", "splat"])
    vz.add_argument("--no_bg", action="store_true", default=False,
                    help="white background instead of the video frames "
                         "(--viz-no-bg)")

    fp = sub.add_parser(
        "fit-prox",
        help="PROX fitting driver: RGB keypoints (+ optional RGB-D depth "
             "point clouds) -> 3-stage HuMoR fit per subsequence -> "
             "result dirs + eval CSVs (run_fitting.py data_type="
             "PROX-RGB/PROX-RGBD, fit_prox.cfg / fit_proxd.cfg)")
    fp.add_argument("--prox", type=str, required=True,
                    help="PROX root (qualitative/ or quantitative/ inside)")
    fp.add_argument("--out", type=str, required=True)
    fp.add_argument("--quant", action="store_true", default=False)
    fp.add_argument("--split", type=str, default="train")
    fp.add_argument("--recording", type=str, default="")
    fp.add_argument("--seq_len", type=int, default=60)
    fp.add_argument("--max_seqs", type=int, default=0)
    fp.add_argument("--rgbd", action="store_true", default=False,
                    help="use depth point clouds (PROX-RGBD / fit_proxd)")
    fp.add_argument("--mask_joints", action="store_true", default=False)
    fp.add_argument("--max_pts", type=int, default=4096)
    fp.add_argument("--smpl_path", type=str, default="")
    fp.add_argument("--humor_ckpt", type=str, default="")
    fp.add_argument("--init_motion_prior", type=str, default="")
    fp.add_argument("--latent_size", type=int, default=48)
    fp.add_argument("--steps", type=int, nargs=3, default=[30, 70, 70],
                    metavar=("S1", "S2", "S3"))
    fp.add_argument("--lr", type=float, default=1e-2)
    fp.add_argument("--seed", type=int, default=0)
    fp.add_argument("--no_eval", action="store_true", default=False)

    fa = sub.add_parser(
        "fit-amass",
        help="3D fitting on processed AMASS: noisy/partial observations "
             "(amass_fit_observations) -> 3-stage HuMoR fit with the "
             "obs3d energies -> result dirs + eval CSV family "
             "(run_fitting.py data_type=AMASS + eval_fitting_3d.py)")
    fa.add_argument("--amass", type=str, required=True,
                    help="processed AMASS root (process-amass output) or "
                         "a single sequence npz")
    fa.add_argument("--out", type=str, required=True)
    fa.add_argument("--split", type=str, default="test",
                    choices=["train", "val", "test", "all"])
    fa.add_argument("--seq_len", type=int, default=60)
    fa.add_argument("--max_seqs", type=int, default=0)
    fa.add_argument("--obs", type=str, nargs="+", default=["verts"],
                    choices=["joints", "verts", "points"],
                    help="observation modalities (--amass-use-*)")
    fa.add_argument("--root_only", action="store_true", default=False)
    fa.add_argument("--noise_std", type=float, default=0.0)
    fa.add_argument("--make_partial", action="store_true", default=False)
    fa.add_argument("--partial_height", type=float, default=0.9)
    fa.add_argument("--drop_middle", action="store_true", default=False)
    fa.add_argument("--num_samp_pts", type=int, default=512)
    fa.add_argument("--smpl_path", type=str, default="")
    fa.add_argument("--humor_ckpt", type=str, default="")
    fa.add_argument("--init_motion_prior", type=str, default="")
    fa.add_argument("--latent_size", type=int, default=48)
    fa.add_argument("--steps", type=int, nargs=3, default=[30, 70, 70],
                    metavar=("S1", "S2", "S3"))
    fa.add_argument("--lr", type=float, default=1e-2)
    fa.add_argument("--seed", type=int, default=0)
    fa.add_argument("--no_eval", action="store_true", default=False,
                    help="skip the eval_fitting_3d CSV pass")

    pa = sub.add_parser(
        "process-amass",
        help="raw AMASS -> per-sequence training npz "
             "(humor/scripts/process_amass_data.py)")
    pa.add_argument("--amass_root", type=str, required=True)
    pa.add_argument("--out", type=str, required=True)
    pa.add_argument("--datasets", type=str, nargs="*", default=[],
                    help="subset of AMASS dataset dirs (default: all)")
    pa.add_argument("--smpl_path", type=str, default="")
    pa.add_argument("--synthetic_assets", action="store_true", default=False)
    pa.add_argument("--cleanup_backup", type=str, default="",
                    help="after processing, move treadmill/skating clips "
                         "to this backup dir (cleanup_amass_data.py)")
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
    elif args.amass:
        from ..data.amass_process import load_amass_windows
        windows = load_amass_windows(
            args.amass, args.seq_len + 1, split=args.amass_split,
            stride=args.amass_stride, canonicalize=True,
            max_windows=args.amass_max_windows)
        if windows.shape[0] == 0:
            print("[humor_tool] no windows found under", args.amass)
            return 1
        print(f"[humor_tool] {windows.shape[0]} AMASS windows "
              f"({args.amass_split}, T={args.seq_len + 1})")
        n = windows.shape[0]
        n_batches = max(1, n // args.batch_size)

        def epoch_batches(epoch):
            order = np.random.default_rng(epoch).permutation(n)
            for i in range(n_batches):
                yield windows[order[i * args.batch_size:
                                    (i + 1) * args.batch_size]]
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


def _load_humor_params(path: str, cfg, key):
    """Humor params from a `train` npz (flat 'module.key' arrays), a torch
    checkpoint (load_humor), or random init when path is empty."""
    import jax.numpy as jnp
    from ..models.humor import init_humor, load_humor
    if not path:
        return init_humor(key, cfg)
    if path.endswith(".npz"):
        flat = np.load(path)
        params = {}
        for name in flat.files:
            m, k = name.split(".", 1)
            params.setdefault(m, {})[k] = jnp.asarray(flat[name])
        return params
    return load_humor(path, cfg)


def cmd_fit_rgb(args) -> int:
    import jax
    import jax.numpy as jnp

    from ..body.assets import load_smpl_npz, synthetic_smpl_model
    from ..body.smpl import smpl_forward
    from ..data.humor_rgb import DEFAULT_FOCAL_LEN, load_rgb_video_observations
    from ..models.humor import HumorConfig
    from ..models.humor_fit import (MotionOptConfig, humor_motion_fit,
                                    load_init_motion_prior)
    from ..models.humor_fit_eval import (save_fitting_results,
                                         stitch_rgb_results)

    os.makedirs(args.out, exist_ok=True)
    W, H = args.im_dim
    if args.intrinsics:
        with open(args.intrinsics) as f:
            cam_mat = np.array(json.load(f))
    else:
        # DEFAULT_FOCAL_LEN at the image center (run_fitting.py:169-172)
        cam_mat = np.array([[DEFAULT_FOCAL_LEN[0], 0.0, W / 2.0],
                            [0.0, DEFAULT_FOCAL_LEN[1], H / 2.0],
                            [0.0, 0.0, 1.0]])

    vid_name = osp.basename(osp.normpath(args.joints2d))
    obs_list = load_rgb_video_observations(
        args.joints2d, cam_mat, seq_len=args.seq_len,
        overlap_len=args.overlap_len,
        img_path=args.img_dir or None, masks_path=args.masks or None,
        mask_joints=args.mask_joints,
        planercnn_path=args.planercnn or None, video_name=vid_name)
    if not obs_list:
        print("[fit-rgb] no keypoint frames found under", args.joints2d)
        return 1
    print(f"[fit-rgb] {len(obs_list)} subsequences of "
          f"{obs_list[0]['joints2d'].shape[0]} frames")

    model = (load_smpl_npz(args.smpl_path) if args.smpl_path
             else synthetic_smpl_model())
    hcfg = HumorConfig(latent_size=args.latent_size)
    key = jax.random.PRNGKey(args.seed)
    hp = _load_humor_params(args.humor_ckpt, hcfg, key)
    init_prior = (load_init_motion_prior(args.init_motion_prior)
                  if args.init_motion_prior else None)
    cfg = MotionOptConfig(steps_stage1=args.steps[0],
                          steps_stage2=args.steps[1],
                          steps_stage3=args.steps[2], lr=args.lr)
    focal = float(cam_mat[0, 0])
    center = jnp.asarray([cam_mat[0, 2], cam_mat[1, 2]], jnp.float32)
    cam_t = jnp.asarray(args.cam_t, jnp.float32)

    res_root = osp.join(args.out, "results_out")
    res_dirs, intervals = [], []
    for obs in obs_list:
        T = obs["joints2d"].shape[0]
        kp2d = jnp.asarray(obs["joints2d"], jnp.float32)
        init_pose = jnp.zeros((T, 72), jnp.float32)
        key, kf = jax.random.split(key)
        fit = humor_motion_fit(
            model, hp, hcfg, kp2d, init_pose, cam_t, center,
            focal_length=focal, cfg=cfg, init_motion_prior=init_prior,
            obs3d={"floor_plane": jnp.asarray(obs["floor_plane"],
                                              jnp.float32)}, key=kf)
        pose = np.asarray(fit["pose"])
        stage3 = {"betas": np.asarray(fit["betas"]).reshape(-1),
                  "trans": np.asarray(fit["trans"]),
                  "root_orient": pose[:, :3],
                  "pose_body": pose[:, 3:66],
                  "floor_plane": np.asarray(obs["floor_plane"],
                                            np.float64)}
        observations = {"joints2d": np.asarray(obs["joints2d"])}
        if "img_paths" in obs:
            observations["img_paths"] = np.asarray(obs["img_paths"])
        rd = osp.join(res_root, obs["name"])
        save_fitting_results(
            rd, stage3, gt={"cam_mtx": cam_mat},
            observations=observations,
            optim_bm=args.smpl_path or "synthetic",
            gt_bm=args.smpl_path or "synthetic")
        res_dirs.append(rd)
        intervals.append(obs["seq_interval"])
        print(f"[fit-rgb] {obs['name']}: "
              f"stage3 loss {float(np.asarray(fit['stage3_loss'])[-1]):.4f}"
              f" -> {rd}")

    def smpl_joints_fn(pose_body, betas, root_orient, trans):
        n = np.asarray(pose_body).shape[0]
        body = np.zeros((n, 69), np.float32)
        body[:, :63] = np.asarray(pose_body)
        _, _, fk = smpl_forward(
            model, jnp.asarray(np.asarray(betas)[:, :10], jnp.float32),
            jnp.asarray(body), jnp.asarray(root_orient, jnp.float32),
            pose2rot=True, transl=jnp.asarray(trans, jnp.float32),
            want_vertices=False, want_fk_joints=True)
        return np.asarray(fk)[:, :22]

    final = stitch_rgb_results(intervals, res_dirs, res_root,
                               smpl_joints_fn=smpl_joints_fn)
    print(f"[fit-rgb] stitched -> {final}")
    return 0


def _draw_pts2d(img: np.ndarray, pts: np.ndarray, color=(1.0, 0.2, 0.2),
                r: int = 3) -> None:
    """Stamp confident 2D keypoints into an (H, W, 3) float image in place
    (the viz-obs-2d overlay, viz_fitting_rgb.py)."""
    H, W, _ = img.shape
    for p in np.asarray(pts).reshape(-1, pts.shape[-1]):
        x, y = p[0], p[1]
        conf = p[2] if pts.shape[-1] > 2 else 1.0
        if conf <= 0 or not np.isfinite([x, y]).all():
            continue
        xi, yi = int(round(float(x))), int(round(float(y)))
        if 0 <= xi < W and 0 <= yi < H:
            img[max(0, yi - r):yi + r + 1,
                max(0, xi - r):xi + r + 1] = color


def cmd_viz_fit(args) -> int:
    import shutil

    import jax.numpy as jnp

    from ..body.assets import load_smpl_npz, synthetic_smpl_model
    from ..body.smpl import smpl_forward
    from ..data.video import frames_to_video
    from ..geometry.camera import Camera
    from ..models.humor_fit_eval import (GT_RES_NAME, OBS_NAME,
                                         PRED_RES_NAME,
                                         load_fitting_results)
    from ..render.mesh import render_mesh_overlay
    from ..render.video import _load_frame, _write_png

    model = (load_smpl_npz(args.smpl_path) if args.smpl_path
             else synthetic_smpl_model())
    W, H = args.im_dim
    have_ffmpeg = shutil.which("ffmpeg") is not None

    def verts_of(res):
        T = np.asarray(res["trans"]).shape[0]
        betas = np.asarray(res["betas"], np.float32)
        if betas.ndim == 1:
            betas = np.broadcast_to(betas[None], (T, betas.shape[0]))
        body = np.zeros((T, 69), np.float32)
        body[:, :63] = np.asarray(res["pose_body"], np.float32)
        v, _ = smpl_forward(
            model, jnp.asarray(betas[:, :10]), jnp.asarray(body),
            jnp.asarray(np.asarray(res["root_orient"], np.float32)),
            pose2rot=True, want_vertices=True,
            transl=jnp.asarray(np.asarray(res["trans"], np.float32)))
        return np.asarray(v)

    def render_seq(verts, cam, name, obs=None, img_paths=None):
        frame_dir = osp.join(args.out, name + ".frames")
        os.makedirs(frame_dir, exist_ok=True)
        T = verts.shape[0]
        out_idx = 0
        for t in range(0, T, max(args.every, 1)):
            bg = None
            if img_paths is not None and not args.no_bg:
                bg = _load_frame(str(img_paths[t]), (H, W))
            frame = render_mesh_overlay(
                jnp.asarray(verts[t]), model.faces, cam, bg, (H, W),
                method=args.method)
            if args.obs_2d and obs is not None and "joints2d" in obs:
                _draw_pts2d(frame, np.asarray(obs["joints2d"][t]))
            _write_png(osp.join(frame_dir, "%06d.png" % out_idx), frame)
            out_idx += 1
        if have_ffmpeg:
            frames_to_video(frame_dir, osp.join(args.out, name + ".mp4"),
                            fps=args.fps / max(args.every, 1))
        print(f"[viz-fit] {name}: {out_idx} frames -> {frame_dir}")

    dirs = sorted(d for d in os.listdir(args.results)
                  if not d.startswith(".")
                  and osp.isdir(osp.join(args.results, d)))
    if args.final_only:
        dirs = [d for d in dirs if d == "final_results"]
    if args.max_seqs:
        dirs = dirs[:args.max_seqs]
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for seq in dirs:
        rd = osp.join(args.results, seq)
        pred = load_fitting_results(rd, PRED_RES_NAME)
        if pred is None or not all(
                np.isfinite(np.asarray(pred[k])).all()
                for k in ("trans", "root_orient", "pose_body", "betas")):
            print(f"[viz-fit] skipping {seq} (missing/NaN prediction)")
            continue
        gt = load_fitting_results(rd, GT_RES_NAME)
        obs = load_fitting_results(rd, OBS_NAME)
        if gt is not None and "cam_mtx" in gt:
            m = np.asarray(gt["cam_mtx"], np.float64)
            focal, center = float(m[0, 0]), (float(m[0, 2]),
                                             float(m[1, 2]))
        else:
            from ..data.humor_rgb import DEFAULT_FOCAL_LEN
            focal, center = DEFAULT_FOCAL_LEN[0], (W / 2.0, H / 2.0)
        cam = Camera(jnp.eye(3), jnp.zeros(3), jnp.asarray(focal),
                     jnp.asarray(center))
        img_paths = (list(obs["img_paths"])
                     if obs is not None and "img_paths" in obs else None)
        render_seq(verts_of(pred), cam, seq, obs=obs, img_paths=img_paths)
        n += 1

        if args.prior_frame:
            prior = load_fitting_results(rd, PRED_RES_NAME + "_prior")
            if prior is not None:
                pv = verts_of(prior)
                # z-up canonical frame: look from the front, centered on
                # the motion (the viz-prior-frame view)
                c = pv.reshape(-1, 3).mean(0)
                ext = float(np.abs(pv - c).max())
                R = jnp.asarray(np.array([[1.0, 0.0, 0.0],
                                          [0.0, 0.0, -1.0],
                                          [0.0, 1.0, 0.0]]))
                t = -np.asarray(R) @ c + np.array([0.0, 0.0, 4.0 * ext])
                cam_p = Camera(R, jnp.asarray(t),
                               jnp.asarray(0.9 * max(W, H)),
                               jnp.asarray((W / 2.0, H / 2.0)))
                render_seq(pv, cam_p, seq + "_prior")
    print(f"[viz-fit] visualized {n} result dirs -> {args.out}")
    return 0 if n else 1


def cmd_fit_prox(args) -> int:
    import jax
    import jax.numpy as jnp

    from ..body.assets import load_smpl_npz, synthetic_smpl_model
    from ..body.smpl import smpl_forward
    from ..data.humor_rgb import (load_prox_calibration,
                                  load_prox_depth_points,
                                  load_prox_observations)
    from ..models.humor import HumorConfig
    from ..models.humor_fit import (MotionOptConfig, humor_motion_fit,
                                    load_init_motion_prior)
    from ..models.humor_fit_eval import (eval_fitting_results_dirs,
                                         save_fitting_results)

    obs_list = load_prox_observations(
        args.prox, quant=args.quant, split=args.split,
        seq_len=args.seq_len, recording=args.recording or None,
        mask_joints=args.mask_joints, load_floor_plane=True,
        return_fitting=args.quant)
    if args.max_seqs:
        obs_list = obs_list[:args.max_seqs]
    if not obs_list:
        print("[fit-prox] no subsequences found under", args.prox)
        return 1

    calib = None
    if args.rgbd:
        data_dir = osp.join(args.prox,
                            "quantitative" if args.quant else "qualitative")
        calib = load_prox_calibration(osp.join(data_dir, "calibration"))

    model = (load_smpl_npz(args.smpl_path) if args.smpl_path
             else synthetic_smpl_model())
    hcfg = HumorConfig(latent_size=args.latent_size)
    key = jax.random.PRNGKey(args.seed)
    hp = _load_humor_params(args.humor_ckpt, hcfg, key)
    init_prior = (load_init_motion_prior(args.init_motion_prior)
                  if args.init_motion_prior else None)
    # fit_proxd.cfg / fit_prox.cfg weight columns: RGB-D runs the
    # point-cloud chamfer at 1.0 next to joint2d 0.001
    cfg = MotionOptConfig(
        steps_stage1=args.steps[0], steps_stage2=args.steps[1],
        steps_stage3=args.steps[2], lr=args.lr,
        points3d_weight=1.0 if args.rgbd else 0.0,
        kp2d_weight=0.001 if args.rgbd else 1.0,
        joints3d_smooth_weight=100.0,
        shape_prior_weight=0.034,
        motion_prior_weight=0.075, init_motion_prior_weight=0.075,
        joint_consistency_weight=100.0, bone_length_weight=2000.0,
        contact_vel_weight=100.0, contact_height_weight=10.0,
        floor_reg_weight=1.0 if args.rgbd else 0.0)

    res_root = osp.join(args.out, "results_out")
    n_fit = 0
    for obs in obs_list:
        T = obs["joints2d"].shape[0]
        kp2d = jnp.asarray(obs["joints2d"], jnp.float32)
        cam_mat = obs.get("cam_matx")
        if cam_mat is None:
            from ..data.humor_rgb import DEFAULT_FOCAL_LEN
            cam_mat = np.array([[DEFAULT_FOCAL_LEN[0], 0.0, 960.0],
                                [0.0, DEFAULT_FOCAL_LEN[1], 540.0],
                                [0.0, 0.0, 1.0]])
        obs3d = {}
        if "floor_plane" in obs:
            obs3d["floor_plane"] = jnp.asarray(obs["floor_plane"],
                                               jnp.float32)
        if args.rgbd and calib is not None:
            import matplotlib.pyplot as plt

            def _mask(p):
                img = plt.imread(p)
                if img.ndim == 3:
                    img = img[..., 0]
                return (img * 255).astype(np.uint8) \
                    if img.dtype != np.uint8 else img

            masks = [_mask(p) for p in obs["mask_paths"]]
            pts = load_prox_depth_points(obs["depth_paths"], masks, calib,
                                         max_pts=args.max_pts)
            obs3d["points3d"] = jnp.asarray(pts, jnp.float32)
        init_pose = jnp.zeros((T, 72), jnp.float32)
        key, kf = jax.random.split(key)
        fit = humor_motion_fit(
            model, hp, hcfg, kp2d, init_pose,
            jnp.asarray([0.0, 0.0, 2.5]),
            jnp.asarray([cam_mat[0, 2], cam_mat[1, 2]], jnp.float32),
            focal_length=float(cam_mat[0, 0]), cfg=cfg,
            init_motion_prior=init_prior, obs3d=obs3d or None, key=kf)
        pose = np.asarray(fit["pose"])
        stage3 = {"betas": np.asarray(fit["betas"]).reshape(-1),
                  "trans": np.asarray(fit["trans"]),
                  "root_orient": pose[:, :3], "pose_body": pose[:, 3:66]}
        if "floor" in fit:
            stage3["floor_plane"] = np.asarray(fit["floor"], np.float64)
        gt = None
        if args.quant and "gt_trans" in obs:
            gt = {"trans": obs["gt_trans"],
                  "root_orient": obs["gt_root_orient"],
                  "pose_body": obs["gt_pose_body"],
                  "betas": np.asarray(obs["gt_betas"])[..., :10]}
        observations = {"joints2d": np.asarray(obs["joints2d"]),
                        "img_paths": np.asarray(obs["img_paths"])}
        if "points3d" in obs3d:
            observations["points3d"] = np.asarray(obs3d["points3d"])
        save_fitting_results(
            osp.join(res_root, obs["name"]), stage3, gt=gt,
            observations=observations,
            optim_bm=args.smpl_path or "synthetic",
            gt_bm=args.smpl_path or "synthetic")
        n_fit += 1
        print(f"[fit-prox] {obs['name']}: stage3 loss "
              f"{float(np.asarray(fit['stage3_loss'])[-1]):.4f}")
    print(f"[fit-prox] fitted {n_fit} subsequences -> {res_root}")

    if args.quant and not args.no_eval:
        def smpl_fn(trans, root_orient, pose_body, betas):
            n = trans.shape[0]
            body = np.zeros((n, 69), np.float32)
            body[:, :63] = pose_body
            verts, _, fk = smpl_forward(
                model, jnp.asarray(np.asarray(betas)[:, :10], jnp.float32),
                jnp.asarray(body), jnp.asarray(root_orient, jnp.float32),
                pose2rot=True, transl=jnp.asarray(trans, jnp.float32),
                want_fk_joints=True)
            return np.asarray(fk), np.asarray(verts)

        eval_dir = osp.join(args.out, "eval_out")
        seqs = eval_fitting_results_dirs(res_root, eval_dir, smpl_fn)
        print(f"[fit-prox] evaluated {len(seqs)} sequences -> {eval_dir}")
    return 0


def cmd_fit_amass(args) -> int:
    import glob as _glob

    import jax
    import jax.numpy as jnp

    from ..body.assets import load_smpl_npz, synthetic_smpl_model
    from ..body.smpl import smpl_forward
    from ..data.amass_process import (KEYPT_VERTS, amass_fit_observations,
                                      amass_split_dirs)
    from ..models.humor import HumorConfig
    from ..models.humor_fit import (MotionOptConfig, humor_motion_fit,
                                    load_init_motion_prior)
    from ..models.humor_fit_eval import (eval_fitting_results_dirs,
                                         save_fitting_results)

    model = (load_smpl_npz(args.smpl_path) if args.smpl_path
             else synthetic_smpl_model())
    V = model.v_template.shape[0]
    keypt = np.asarray([v for v in KEYPT_VERTS if v < V])

    if osp.isfile(args.amass):
        seq_paths = [args.amass]
    else:
        seq_paths = []
        for d in amass_split_dirs(args.amass, args.split):
            seq_paths += sorted(_glob.glob(osp.join(d, "*/*.npz")))
    if args.max_seqs:
        seq_paths = seq_paths[:args.max_seqs]
    if not seq_paths:
        print("[fit-amass] no processed sequences found under", args.amass)
        return 1

    hcfg = HumorConfig(latent_size=args.latent_size)
    key = jax.random.PRNGKey(args.seed)
    hp = _load_humor_params(args.humor_ckpt, hcfg, key)
    init_prior = (load_init_motion_prior(args.init_motion_prior)
                  if args.init_motion_prior else None)
    # the fit_amass_keypts.cfg weight columns (stage-3 values where the
    # term is stage-3-only)
    cfg = MotionOptConfig(
        steps_stage1=args.steps[0], steps_stage2=args.steps[1],
        steps_stage3=args.steps[2], lr=args.lr,
        joints3d_weight=1.0 if "joints" in args.obs else 0.0,
        verts3d_weight=1.0 if "verts" in args.obs else 0.0,
        points3d_weight=1.0 if "points" in args.obs else 0.0,
        joints3d_smooth_weight=0.1,
        shape_prior_weight=1.67e-4,
        motion_prior_weight=5e-4,
        init_motion_prior_weight=5e-4,
        joint_consistency_weight=1.0, bone_length_weight=10.0,
        contact_vel_weight=1.0, contact_height_weight=1.0,
        floor_reg_weight=0.0)

    res_root = osp.join(args.out, "results_out")
    n_fit = 0
    for i, path in enumerate(seq_paths):
        seq = dict(np.load(path, allow_pickle=True))
        if np.asarray(seq["trans"]).shape[0] < args.seq_len:
            continue
        obs, gt = amass_fit_observations(
            seq, model, seq_len=args.seq_len,
            return_joints="joints" in args.obs,
            return_verts="verts" in args.obs,
            return_points="points" in args.obs,
            noise_std=args.noise_std, make_partial=args.make_partial,
            partial_height=args.partial_height,
            drop_middle=args.drop_middle, num_samp_pts=args.num_samp_pts,
            root_only=args.root_only, seed=args.seed + i)
        obs3d = {k: jnp.asarray(v) for k, v in obs.items()}
        if "verts3d" in obs3d:
            obs3d["verts3d_inds"] = keypt
        T = args.seq_len
        init_pose = np.zeros((T, 72), np.float32)
        init_pose[:, :3] = gt["root_orient"]   # like the reference, fits
        init_pose[:, 3:66] = 0.0               # start from observed root
        key, kf = jax.random.split(key)
        fit = humor_motion_fit(model, hp, hcfg, None,
                               jnp.asarray(init_pose), jnp.zeros(3),
                               jnp.zeros(2), cfg=cfg,
                               init_motion_prior=init_prior,
                               obs3d=obs3d, key=kf)
        pose = np.asarray(fit["pose"])
        name = osp.splitext(osp.basename(path))[0]
        parent = osp.basename(osp.dirname(path))
        seq_name = f"{parent}_{name}_{i}"
        stage3 = {"betas": np.asarray(fit["betas"]).reshape(-1),
                  "trans": np.asarray(fit["trans"]),
                  "root_orient": pose[:, :3], "pose_body": pose[:, 3:66]}
        gt_save = {"betas": gt["betas"][:10], "trans": gt["trans"],
                   "root_orient": gt["root_orient"],
                   "pose_body": gt["pose_body"],
                   "contacts": gt.get("contacts")}
        save_fitting_results(
            osp.join(res_root, seq_name), stage3,
            gt={k: v for k, v in gt_save.items() if v is not None},
            observations=obs,
            optim_bm=args.smpl_path or "synthetic",
            gt_bm=args.smpl_path or "synthetic")
        n_fit += 1
        print(f"[fit-amass] {seq_name}: stage3 loss "
              f"{float(np.asarray(fit['stage3_loss'])[-1]):.4f}")
    print(f"[fit-amass] fitted {n_fit} sequences -> {res_root}")
    if n_fit == 0:
        return 1

    if not args.no_eval:
        def smpl_fn(trans, root_orient, pose_body, betas):
            n = trans.shape[0]
            body = np.zeros((n, 69), np.float32)
            body[:, :63] = pose_body
            verts, _, fk = smpl_forward(
                model, jnp.asarray(np.asarray(betas)[:, :10], jnp.float32),
                jnp.asarray(body), jnp.asarray(root_orient, jnp.float32),
                pose2rot=True, transl=jnp.asarray(trans, jnp.float32),
                want_fk_joints=True)
            return np.asarray(fk), np.asarray(verts)

        eval_dir = osp.join(args.out, "eval_out")
        seqs = eval_fitting_results_dirs(res_root, eval_dir, smpl_fn)
        print(f"[fit-amass] evaluated {len(seqs)} sequences -> {eval_dir}")
    return 0


def cmd_process_amass(args) -> int:
    from ..body.assets import load_smpl_npz, synthetic_smpl_model
    from ..data.amass_process import cleanup_amass_data, process_amass_dir

    model = (load_smpl_npz(args.smpl_path) if args.smpl_path
             else synthetic_smpl_model())
    written = process_amass_dir(args.amass_root, args.out, model,
                                datasets=args.datasets or None)
    print(f"[process-amass] wrote {len(written)} sequences -> {args.out}")
    if args.cleanup_backup:
        moved = cleanup_amass_data(args.out, args.cleanup_backup)
        print(f"[process-amass] cleanup moved {len(moved)} clips "
              f"-> {args.cleanup_backup}")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "train":
        return cmd_train(args)
    if args.cmd == "train-state-prior":
        return cmd_train_state_prior(args)
    if args.cmd == "process-amass":
        return cmd_process_amass(args)
    if args.cmd == "fit-rgb":
        return cmd_fit_rgb(args)
    if args.cmd == "fit-amass":
        return cmd_fit_amass(args)
    if args.cmd == "fit-prox":
        return cmd_fit_prox(args)
    return cmd_fit_eval(args)


if __name__ == "__main__":
    sys.exit(main())
