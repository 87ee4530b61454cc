"""CLI: fit a neural motion field to a multi-view action bundle.

Equivalent surface to scripts/learned_multi_view_recon_nn.py:39-338 —
same flag names, same 3-layer config merge, same stage schedule
(warmup -> opt_cam -> main loop with periodic checkpoints) — driving the
scan-based NemoFitter instead of a host-side step loop.

Usage:
  python -m nemo_tpu.cli.fit --bundle action.npz --smpl_path software/smpl \
      --default_config config/default-v1.yml --model_version 2 ...
  python -m nemo_tpu.cli.fit --bundle action.npz --synthetic_assets ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import os.path as osp
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # data
    p.add_argument("--bundle", type=str, default="",
                   help="packed .npz action bundle (see nemo_tpu.data)")
    p.add_argument("--nemo_cfg_path", type=str, default="",
                   help="per-action YAML (exp_dir + video names); used by "
                        "the preprocessing CLI to locate raw data")
    p.add_argument("--default_config", type=str, default="")
    p.add_argument("--out_dir", type=str, default="out/multi_view/default")
    p.add_argument("--load_ckpt_path", type=str, default="")
    p.add_argument("--test", action="store_true", default=False)
    # assets
    p.add_argument("--smpl_path", type=str, default="",
                   help="SMPL model dir/file (pkl or npz)")
    p.add_argument("--j_regressor_extra", type=str, default="")
    p.add_argument("--vposer_path", type=str, default="")
    p.add_argument("--gmm_path", type=str, default="")
    p.add_argument("--synthetic_assets", action="store_true", default=False,
                   help="use synthetic SMPL/GMM/VPoser (no proprietary data)")
    # model
    p.add_argument("--model_version", type=int, default=2)
    p.add_argument("--h_dim", type=int, default=500)
    p.add_argument("--instance_code_size", type=int, default=10)
    p.add_argument("--code_noise", type=float, default=0)
    p.add_argument("--phase_rbf_dim", type=int, default=0)
    p.add_argument("--rbf_kernel", type=str, default="linear")
    p.add_argument("--monotonic_network_n_nodes", type=int, default=10)
    p.add_argument("--phase_init", type=str, default="rand",
                   choices=["linear", "rand"])
    # optimization
    p.add_argument("--n_steps", type=int, default=100)
    p.add_argument("--warmup_step", type=int, default=200)
    p.add_argument("--opt_cam_step", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--lr_camera", type=float, default=1.0)
    p.add_argument("--lr_human", type=float, default=1e-2)
    p.add_argument("--lr_instance", type=float, default=1e-2)
    p.add_argument("--lr_phase", type=float, default=1e-2)
    p.add_argument("--lr_factor", type=float, default=1e-1)
    p.add_argument("--opt_human", type=str, default="adam",
                   choices=["adam", "adamw"])
    p.add_argument("--wd_human", type=float, default=0)
    p.add_argument("--loss", type=str, default="mse",
                   choices=["rmse", "rmse_resized", "mse", "rmse_robust",
                            "mse_robust", "mse_robust_resized"])
    # V0's per-network learning rates (neural_motion_model.py:3180-3199)
    p.add_argument("--lr_pose", type=float, default=1e-2)
    p.add_argument("--lr_orient", type=float, default=1e-2)
    p.add_argument("--lr_trans", type=float, default=1e-2)
    p.add_argument("--weight_vp_loss", type=float, default=0)
    p.add_argument("--weight_vp_z_loss", type=float, default=0)
    p.add_argument("--vp_v2v_n_verts", type=int, default=0,
                   help="evaluate the v2v prior on an even N-vertex "
                        "subsample (0 = all vertices, reference behavior)")
    p.add_argument("--skin_bf16", action="store_true", default=False,
                   help="store the skinning tables in bf16 (f32 "
                        "accumulation) — faster MXU path, ~1e-3 rel "
                        "error on vertices; parity-gated opt-in")
    p.add_argument("--weight_gmm_loss", type=float, default=1e-2)
    p.add_argument("--weight_instance_loss", type=float, default=0)
    p.add_argument("--weight_3d_loss", type=float, default=0)
    # custom-video entry surface (learned_multi_view_recon_nn_custom.py):
    # HuMoR dynamics prior over consecutive-frame transitions
    p.add_argument("--weight_humor_loss", type=float, default=0)
    p.add_argument("--humor_fps", type=float, default=30.0)
    p.add_argument("--humor_ckpt", type=str, default="",
                   help="HuMoR torch checkpoint to convert (synthetic "
                        "weights are used if unset with --synthetic_assets)")
    p.add_argument("--init-motion-prior", dest="init_motion_prior",
                   type=str, default="",
                   help="init-state GMM prior path for HuMoR fitting "
                        "(custom entry :125; consumed by "
                        "models/humor_fit.py:load_init_motion_prior)")
    p.add_argument("--full_batch", action="store_true", default=False,
                   help="step the main loop on the full (V x F) grid "
                        "instead of random batches (the custom entry's "
                        "mode, learned_multi_view_recon_nn_custom.py:315)")
    p.add_argument("--eval_full_batch", type=int, default=1,
                   help="1 (reference default, entry :56) runs the "
                        "init/stage evals on the full (V x F) grid; 0 "
                        "samples one batch like step(update=False)")
    p.add_argument("--dp", type=int, default=0,
                   help="shard the per-step batch over an N-device "
                        "data-parallel mesh (params replicated; XLA "
                        "all-reduces grads over ICI). 0 = single device")
    p.add_argument("--label_type", type=str, default="gt",
                   choices=["gt", "op", "intersection"])
    p.add_argument("--label_intersection_threshold", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render_video", type=int, default=0)
    p.add_argument("--render_rollout_figure", action="store_true",
                   default=False,
                   help="emit the (view x frame) mesh grid figure "
                        "standalone (entry :102, render method :2214)")
    # accepted for drop-in compatibility with the reference entry surface;
    # data-layer flags are handled by cli/preprocess (offline packing) and
    # the remaining ones are dead in the reference too (wandb/commented)
    for flag, kw in (("--data_loader_type", dict(type=str, default="")),
                     ("--db", dict(action="store_true", default=False)),
                     ("--n_frames", dict(type=int, default=-1)),
                     ("--start_phase", dict(type=float, default=0.0)),
                     ("--sequence_ids", dict(type=str, default="")),
                     ("--run_hmr", dict(action="store_true", default=False)),
                     ("--use_adam", dict(action="store_true", default=False)),
                     ("--optimize_flip", dict(action="store_true",
                                              default=False)),
                     ("--render_each_frame", dict(action="store_true",
                                                  default=False)),
                     ("--user", dict(type=str, default=""))):
        p.add_argument(flag, help=argparse.SUPPRESS, **kw)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--render_every", type=int, default=0,
                   help="emit a keypoint-rollout PNG every N fit steps "
                        "(entry script :283-288; 0 = only at the end)")
    return p


def load_assets(args, bundle, cfg):
    import jax
    from ..fit import build_assets
    from ..priors import load_gmm_prior, load_vposer, synthetic_gmm_prior, init_vposer

    if args.synthetic_assets or not args.smpl_path:
        from ..body import synthetic_smpl_model
        smpl = synthetic_smpl_model()
    else:
        from ..body import load_smpl
        smpl = load_smpl(args.smpl_path, args.j_regressor_extra or None)

    gmm = None
    if args.gmm_path:
        gmm = load_gmm_prior(args.gmm_path)
    elif args.synthetic_assets and cfg.weight_gmm_loss:
        gmm = synthetic_gmm_prior(8)

    vposer = None
    if args.vposer_path:
        vposer = load_vposer(args.vposer_path)
    elif args.synthetic_assets and (cfg.weight_vp_loss or cfg.weight_vp_z_loss):
        vposer = init_vposer(jax.random.PRNGKey(0))

    humor = None
    if cfg.weight_humor_loss:
        from ..models.humor import init_humor, load_humor
        if args.humor_ckpt:
            humor = load_humor(args.humor_ckpt)
        elif args.synthetic_assets:
            humor = init_humor(jax.random.PRNGKey(1))

    return build_assets(bundle, smpl, cfg, gmm=gmm, vposer=vposer,
                        humor=humor)


def main(argv=None) -> int:
    from ..data import MultiViewBundle, synthetic_problem
    from ..fit import NemoConfig, NemoFitter
    from ..utils import (MetricWriter, Timer, create_latest_child_dir,
                         dataclass_from_namespace, load_fit_state,
                         merge_config, save_fit_state)

    args = merge_config(build_parser(), argv)
    if getattr(args, "skin_bf16", False):
        # must precede asset loading: tile_tables reads this knob
        import os
        os.environ["NEMO_TPU_SKIN_BF16"] = "1"
    out_dir = create_latest_child_dir(args.out_dir)
    cfg = dataclass_from_namespace(NemoConfig, args)

    if args.load_ckpt_path:
        # Rebuild the exact fit configuration the checkpoint was saved with
        # (the reference's model_config.p round-trip, :156-197). Flags the
        # user explicitly typed still win.
        from ..utils import load_saved_config
        from ..utils.config import explicit_cli_keys
        saved = load_saved_config(args.load_ckpt_path)
        if saved:
            fields = NemoConfig.__dataclass_fields__
            merged = {k: v for k, v in saved.items() if k in fields}
            for k in explicit_cli_keys(argv):
                if k in fields:
                    merged[k] = getattr(args, k)
            cfg = NemoConfig(**{**dataclasses.asdict(cfg), **merged})
            print("[fit] restored model config from checkpoint")

    with open(osp.join(out_dir, "config.json"), "w") as f:
        json.dump({"args": vars(args), "cfg": dataclasses.asdict(cfg)}, f,
                  indent=2, default=str)

    with Timer("Data loading"):
        if args.bundle:
            bundle = MultiViewBundle.load(args.bundle)
        else:
            from ..body import synthetic_smpl_model
            print("[fit] no --bundle given; generating a synthetic problem")
            bundle, _ = synthetic_problem(synthetic_smpl_model(),
                                          num_views=4, num_frames=60)

    mesh = None
    if args.dp > 0:
        from ..parallel import make_mesh
        mesh = make_mesh(args.dp)
        print(f"[fit] data-parallel over {mesh.devices.size} devices")

    with Timer("Model init"):
        assets = load_assets(args, bundle, cfg)
        fitter = NemoFitter(cfg, assets, seed=args.seed, mesh=mesh)

    if args.load_ckpt_path:
        fitter.state = load_fit_state(args.load_ckpt_path, fitter.state)
        print(f"[fit] resumed from {args.load_ckpt_path} "
              f"at step {fitter.state.step}")

    metrics_log = MetricWriter(osp.join(out_dir, "metrics.jsonl"))

    if not args.test:
        init_metrics = fitter.eval_loss(full=bool(args.eval_full_batch))
        metrics_log.write({"phase": "init", **init_metrics})

        with Timer("Warmup"):
            wm = fitter.warmup()
            if wm:
                metrics_log.write({"phase": "warmup_done",
                                   "loss": float(wm["warmup_loss"][-1])})

        with Timer("Camera opt"):
            cm = fitter.opt_cam()
            if cm:
                key = "cam_loss" if "cam_loss" in cm else "total_loss"
                metrics_log.write({"phase": "opt_cam_done",
                                   "loss": float(cm[key][-1])})
            # post-cam-opt eval (the reference's `_cam.pt` info dump,
            # entry :255-268, full_batch per --eval_full_batch)
            metrics_log.write({"phase": "cam_eval",
                               **fitter.eval_loss(
                                   full=bool(args.eval_full_batch))})

        def render_rollout(f, step):
            """In-fit keypoint rollout (entry script :283-288)."""
            import jax.numpy as jnp
            from ..fit.model import predict, project_to_views
            from ..render import render_keypoint_rollout
            V, F = assets.num_views, assets.num_frames
            vi = jnp.repeat(jnp.arange(V), F)
            fi = jnp.tile(jnp.arange(F), V)
            pr = predict(f.state.params, cfg, assets, vi, fi)
            p2 = project_to_views(f.state.params, cfg, assets, pr["j"], vi)
            render_keypoint_rollout(
                osp.join(out_dir, f"rollout_{step:06d}.png"),
                np.asarray(p2).reshape(V, F, 25, 2), bundle)

        def on_chunk(f, step, chunk_metrics):
            if step % args.save_every == 0 or step >= cfg.n_steps:
                ckpt_dir = osp.join(out_dir, "ckpt", f"sd_{step:06d}")
                save_fit_state(ckpt_dir, f.state, cfg)
            if args.render_every > 0 and step % args.render_every == 0:
                render_rollout(f, step)
            metrics_log.write({"phase": "fit", "step": step,
                               **{k: float(v[-1])
                                  for k, v in chunk_metrics.items()}})
            print(f"[fit] step {step}: "
                  f"total={float(chunk_metrics['total_loss'][-1]):.4f} "
                  f"kp={float(chunk_metrics['kp_loss'][-1]):.4f}")

        import math
        chunk = args.save_every if args.render_every <= 0 else \
            math.gcd(args.save_every, args.render_every)
        with Timer("Main fit"):
            all_metrics = fitter.fit(chunk=chunk, on_chunk=on_chunk)
        np.savez(osp.join(out_dir, "losses.npz"), **all_metrics)
        from ..render import render_loss_curves
        render_loss_curves(out_dir, all_metrics)

    # learned phase-warp plot (entry script :316-328)
    from ..render import render_phase_plot
    render_phase_plot(osp.join(out_dir, "phases.png"),
                      fitter.state.params["phase"], assets.num_views)

    # final evaluation
    final = fitter.eval_loss()
    metrics_log.write({"phase": "final", **final})
    print("[fit] final:", {k: round(v, 4) for k, v in final.items()})

    # 2D eval CSV + (if GT 3D available) 3D eval CSVs
    from ..eval import eval_2d, eval_3d, write_csv
    from ..fit.model import predict, project_to_views
    import jax.numpy as jnp

    V, F = assets.num_views, assets.num_frames
    vi = jnp.repeat(jnp.arange(V), F)
    fi = jnp.tile(jnp.arange(F), V)
    preds = predict(fitter.state.params, cfg, assets, vi, fi)
    pts2d = project_to_views(fitter.state.params, cfg, assets, preds["j"], vi)
    pts2d = np.asarray(pts2d).reshape(V, F, 25, 2)
    full_mesh_verts = None  # per-view full-mesh forwards, reused by renders

    if "gt" in bundle.labels:
        # column order follows the reference exactly: ours, op, vibe,
        # then vs/pare when packed (neural_motion_model.py:631-707)
        label_order = [k for k in ("op", "vibe", "vs", "pare")
                       if k in bundle.labels]
        stats2d = eval_2d(pts2d,
                          {k: bundle.labels[k] for k in label_order},
                          bundle.labels["gt"], bundle.bbox_diag("gt"))
        write_csv(stats2d, osp.join(out_dir, "eval_2d.csv"))
    if bundle.gt3d_pose is not None:
        pred_pose = np.asarray(preds["poses"]).reshape(V, F, 69)
        # baseline columns in the reference's order: vibe (the initializer),
        # then packed vs/pare/glamr pose slots (eval_3d :1237-1277)
        baselines = {"vibe": bundle.hmr_theta}
        for bname in ("vs", "pare", "glamr"):
            if bname in (bundle.baseline_poses or {}):
                baselines[bname] = bundle.baseline_poses[bname][..., :69]
        stats3d = eval_3d(assets.smpl, pred_pose, bundle.gt3d_pose,
                          baselines)
        write_csv(stats3d, osp.join(out_dir, "eval_3d.csv"))
        stats3d_dyn = eval_3d(assets.smpl, pred_pose, bundle.gt3d_pose,
                              baselines, dynamic_only=True,
                              framerate_multiplier=bundle.framerate_multiplier)
        write_csv(stats3d_dyn, osp.join(out_dir, "eval_3d_dynamic.csv"))
        if args.render_video:
            # per-view GT joint-speed diagnostics (plot_3d_dynamic :712-782)
            from ..eval.metrics import smpl_grid_forward
            from ..render import render_dynamic_velocity_plots
            _, j49 = smpl_grid_forward(
                assets.smpl, bundle.gt3d_pose[..., 3:].reshape(V * F, 69))
            render_dynamic_velocity_plots(
                osp.join(out_dir, "dynamic"),
                j49.reshape(V, F, 49, 3)[..., :15, :],
                bundle.framerate_multiplier)
        if bundle.gt3d_trans is not None:
            # eval_3d_global: get_preds-style world-frame pred (learned
            # betas, learned orient, + trans) aligned to GT by an
            # all-frames rigid Kabsch fit on the vertices (:1594-1651)
            from ..eval import eval_3d_global
            pred_j, pred_v = [], []
            for v in range(V):
                pv = predict(fitter.state.params, cfg, assets,
                             jnp.full((F,), v, jnp.int32), jnp.arange(F),
                             want_vertices=True)
                pred_j.append(np.asarray(pv["j"]))
                pred_v.append(np.asarray(pv["v"]))
            full_mesh_verts = pred_v  # reused by the mesh-rollout renders
            glamr_kwargs = {}
            if (bundle.glamr_orient is not None
                    and bundle.glamr_trans is not None
                    and "glamr" in (bundle.baseline_poses or {})):
                glamr_kwargs = {
                    "glamr_pose": np.concatenate(
                        [bundle.glamr_orient,
                         bundle.baseline_poses["glamr"][..., :69]], -1),
                    "glamr_trans": bundle.glamr_trans}
            pred_trans = np.asarray(preds["trans"]).reshape(V, F, 3)
            stats_g, aligned = eval_3d_global(
                assets.smpl, np.stack(pred_j), np.stack(pred_v),
                bundle.gt3d_pose, bundle.gt3d_trans,
                pred_trans=pred_trans, want_aligned=True, **glamr_kwargs)
            write_csv(stats_g, osp.join(out_dir, "eval_3d_global.csv"))
            # aligned root-trajectory overlay (the reference's overlay.png,
            # plot_3d_dynamic tail :940-991), view 0
            from ..render import render_global_overlay
            render_global_overlay(
                osp.join(out_dir, "overlay.png"), aligned["gt-t"][0],
                aligned["pred-t"][0], aligned.get("glamr-t", [None])[0])

    if args.render_video or args.render_rollout_figure:
        from ..render import (render_eval_grid, render_keypoint_rollout,
                              render_mesh_video, render_overlay_video)
        if args.render_video:
            render_keypoint_rollout(osp.join(out_dir, "rollout.png"),
                                    pts2d, bundle)
            render_eval_grid(osp.join(out_dir, "eval_2d_grid.png"), pts2d,
                             bundle, cfg.label_type)
            out_vid = render_overlay_video(osp.join(out_dir, "overlay.mp4"),
                                           pts2d, bundle, cfg.label_type)
            print(f"[fit] overlay video: {out_vid}")
        # SMPL-mesh rollout through the learned cameras — the reference's
        # render_video('end') (entry :331, render_utils.py:90-145)
        from ..geometry.camera import camera_from_params_np
        if assets.smpl.faces is None:
            print("[fit] no mesh faces in the SMPL model; skipping "
                  "mesh rollout")
        else:
            if full_mesh_verts is not None:
                # already computed for eval_3d_global — don't redo the V
                # full-mesh forwards + device->host transfers
                mesh_verts = full_mesh_verts
            else:
                mesh_verts = []
                for v in range(V):
                    pv = predict(fitter.state.params, cfg, assets,
                                 jnp.full((F,), v, jnp.int32), jnp.arange(F),
                                 want_vertices=True)
                    mesh_verts.append(np.asarray(pv["v"]))
            cam9_np = np.asarray(fitter.state.params["cameras"])
            cams = [camera_from_params_np(cam9_np[v], assets.img_d0,
                                          assets.img_d1, cfg.focal_length)
                    for v in range(V)]
            if args.render_video:
                every = max(1, F // max(args.render_video, 1)) \
                    if args.render_video > 1 else 1
                out_mesh = render_mesh_video(
                    osp.join(out_dir, "mesh_rollout.mp4"),
                    np.stack(mesh_verts), assets.smpl.faces, cams, bundle,
                    every=every)
                print(f"[fit] mesh rollout: {out_mesh}")
            # composed (view x frame) mesh grid + per-view comparison strip
            # (render_rollout_figure :2214-2325, render_comparison_figure
            # :2325-2407)
            from ..render import (render_comparison_figure,
                                  render_rollout_figure)
            render_rollout_figure(
                osp.join(out_dir, "rollout_figure.png"),
                np.stack(mesh_verts), assets.smpl.faces, cams, bundle,
                num_frames=min(8, F))
            render_comparison_figure(
                osp.join(out_dir, "comparison_view0.png"), 0,
                mesh_verts[0], assets.smpl.faces, cams[0], bundle,
                num_frames=min(6, F))
            # the VIBE initializer's own rollout (render_vibe_rollout
            # :1415-1462), when the packer kept its orient/betas/orig_cam
            from ..render import (baseline_persons_from_bundle,
                                  render_baseline_rollout)
            persons = baseline_persons_from_bundle(bundle)
            if persons is not None:
                render_baseline_rollout(
                    osp.join(out_dir, "vibe_rollout.png"), assets.smpl,
                    persons, bundle, num_frames=min(8, F))

    metrics_log.close()
    print(f"[fit] outputs in {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
