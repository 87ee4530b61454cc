"""Composed full-schedule equivalence: warmup -> camera -> main vs the twin.

The per-stage losses and a 20-step main-stage trajectory are pinned by
tests/test_reference_twin.py; this module asserts the COMPOSED system —
stage transitions, persistent-vs-throwaway optimizer states, and plateau
scheduler state threading across stages — by driving the REAL production
NemoFitter (scan-based stages) and the torch twin through the SAME staged
schedule with shared PRNG batches:

  * jax side: NemoFitter.warmup() -> opt_cam() -> fit(chunked), exactly as
    cli/fit.py composes them (reference schedule:
    scripts/learned_multi_view_recon_nn.py:247-308).
  * torch side: the twin stepped with the reference's optimizer topology —
    persistent motion/rbf/phase Adams through warmup (neural_motion_model
    .py:3493-3503), a FRESH cameras-only Adam for the camera stage
    (:2869-2906, discarded), then all four Adams + per-optimizer
    ReduceLROnPlateau in the main loop (:3404-3438, :3594-3596).
  * the batch streams are identical: the fitter's on-device sampling is
    replicated on the host from the same PRNG key threading as
    fit/loop.py's scan bodies.

Asserted: per-stage loss curves, a CROSS-INJECTION exactness check at the
warmup/cam -> main transition, final plateau LR scales, final per-group
parameters (movement-relative), and the resulting eval_2d CSV cells.

Tolerance calibration (measured, CPU f32, this exact shape): warmup and
camera curves track to 4e-6 / 1.3e-5 rel. The main stage diverges faster —
median 0.8% over the first 10 steps, 2.4% over 100, max 8.5% — because the
composed total includes steep prior terms and, decisively, because warmup
drives trunk ReLU pre-activations through zero: both frameworks compute
them a few ulps apart, individual units' gradient masks flip discretely,
and layer-2 weights drift ~1.7% in loss-flat directions (measured: W2/b2
at 5.7e-3 abs while W1/W3 track at 5e-5) — float bistability, not a
semantics gap. The semantics are pinned by the exactness check instead:
a twin evaluated AT the jax composed post-cam params reproduces the jax
main step-0 total loss to float32 exactness. Plateau trip TIMING inherits
the 2%-level loss noise near thresholds, so scales may legitimately end
one factor-of-2 trip apart; plateau arithmetic itself is pinned
step-by-step in test_torch_parity.py with a shared loss sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nemo_tpu.body import synthetic_smpl_model
from nemo_tpu.data import synthetic_problem
from nemo_tpu.eval import eval_2d
from nemo_tpu.fit import NemoConfig, NemoFitter, build_assets
from nemo_tpu.fit.loop import _sample_batch
from nemo_tpu.fit.optimizer import (PLATEAU_PATIENCE, PLATEAU_THRESHOLD,
                                    PLATEAU_MIN_LR)
from nemo_tpu.priors import init_vposer, synthetic_gmm_prior

from torch_twin import TorchNemoV2

WARMUP, CAM, MAIN = 30, 50, 100


def _replay_batches(seed, num_views, num_frames, batch_size):
    """Host replay of the fitter's on-device batch sampling: the same key
    threading as loop.py's scan bodies (warmup: key,k1=split(key);
    V2 camera: key untouched; main: key,k1,k2=split(key,3))."""
    key = jax.random.PRNGKey(seed)
    _k_init, key = jax.random.split(key)
    warm, main = [], []
    for _ in range(WARMUP):
        key, k1 = jax.random.split(key)
        vi, fi = _sample_batch(k1, batch_size, num_views, num_frames)
        warm.append((np.asarray(vi), np.asarray(fi)))
    for _ in range(MAIN):
        key, k1, _k2 = jax.random.split(key, 3)
        vi, fi = _sample_batch(k1, batch_size, num_views, num_frames)
        main.append((np.asarray(vi), np.asarray(fi)))
    return warm, main


@pytest.mark.slow
def test_composed_schedule_matches_torch_reference():
    cfg = NemoConfig(
        model_version=2, h_dim=32, instance_code_size=4,
        phase_rbf_dim=8, rbf_kernel="quadratic",
        monotonic_network_n_nodes=6, batch_size=64,
        weight_vp_loss=10.0, weight_vp_z_loss=1.0, weight_gmm_loss=0.5,
        label_type="gt", lr_factor=0.5,
        n_steps=MAIN, warmup_step=WARMUP, opt_cam_step=CAM,
    )
    model = synthetic_smpl_model(num_vertices=400, seed=0)
    bundle, _ = synthetic_problem(model, num_views=4, num_frames=12, seed=0)
    gmm = synthetic_gmm_prior(4)
    vposer = init_vposer(jax.random.PRNGKey(7))
    assets = build_assets(bundle, model, cfg, gmm=gmm, vposer=vposer)

    # ---- jax side: the production fitter, composed exactly like the CLI
    fitter = NemoFitter(cfg, assets, seed=0)
    params0_np = jax.tree_util.tree_map(np.asarray, fitter.state.params)
    wm = fitter.warmup()
    cm = fitter.opt_cam()
    post_cam_np = jax.tree_util.tree_map(np.asarray, fitter.state.params)
    fm = fitter.fit(chunk=50)  # two chunks: also exercises chunk rejoin
    warm_j = np.asarray(wm["warmup_loss"])
    cam_j = np.asarray(cm["cam_loss"])
    main_j = np.asarray(fm["total_loss"])

    # ---- torch side: the twin through the reference's schedule
    twin = TorchNemoV2(cfg, model,
                       {k: np.asarray(v) for k, v in vposer.items()},
                       gmm, np.asarray(assets.points2d_gt),
                       np.asarray(assets.bbox_diag),
                       assets.img_d0, assets.img_d1,
                       hmr_theta=np.asarray(assets.hmr_theta),
                       hmr_mask=np.asarray(assets.hmr_mask))
    twin.set_params(params0_np)
    opts = twin.make_optimizers()  # [cameras, motion+rbf, phase, instance]
    warm_batches, main_batches = _replay_batches(
        0, assets.num_views, assets.num_frames, cfg.batch_size)

    warm_t = []
    for vi, fi in warm_batches:  # persistent motion/rbf/phase Adams
        for o in opts[1:3]:
            o.zero_grad()
        loss = twin.warmup_loss(torch.as_tensor(vi).long(),
                                torch.as_tensor(fi).long())
        loss.backward()
        for o in opts[1:3]:
            o.step()
        warm_t.append(float(loss))

    cam_opt = torch.optim.Adam([twin.learned_cameras], lr=cfg.lr_camera)
    cam_t = []
    for _ in range(CAM):  # fresh cameras-only Adam, discarded after
        cam_opt.zero_grad()
        loss = twin.camera_fit_loss()
        loss.backward()
        cam_opt.step()
        cam_t.append(float(loss))

    scheds = [torch.optim.lr_scheduler.ReduceLROnPlateau(
        o, mode="min", factor=cfg.lr_factor, patience=PLATEAU_PATIENCE,
        threshold=PLATEAU_THRESHOLD, min_lr=PLATEAU_MIN_LR) for o in opts]
    main_t = []
    for vi, fi in main_batches:
        for o in opts:
            o.zero_grad()
        loss, _ = twin.fit_loss(torch.as_tensor(vi).long(),
                                torch.as_tensor(fi).long())
        loss.backward()
        for o in opts:
            o.step()
        for s in scheds:  # stepped every step with the current loss
            s.step(float(loss))
        main_t.append(float(loss))

    # ---- cross-injection exactness at the stage transition: a twin
    # evaluated AT the jax composed post-cam params on the first main batch
    # must reproduce the jax scan's main step-0 total loss to f32 exactness
    # — this pins the composed state entering main (params after
    # warmup+camera with the right groups touched) without the float
    # bistability of two independent 80-step trajectories.
    twin_x = TorchNemoV2(cfg, model,
                         {k: np.asarray(v) for k, v in vposer.items()},
                         gmm, np.asarray(assets.points2d_gt),
                         np.asarray(assets.bbox_diag),
                         assets.img_d0, assets.img_d1,
                         hmr_theta=np.asarray(assets.hmr_theta),
                         hmr_mask=np.asarray(assets.hmr_mask))
    twin_x.set_params(post_cam_np)
    vi0, fi0 = main_batches[0]
    loss_x, _ = twin_x.fit_loss(torch.as_tensor(vi0).long(),
                                torch.as_tensor(fi0).long())
    np.testing.assert_allclose(
        main_j[0], float(loss_x), rtol=1e-5,
        err_msg="composed post-cam state entering main does not reproduce "
                "the reference loss (stage-transition semantics mismatch)")

    # ---- per-stage loss curves (tolerances = measured noise floor x small
    # margin; see module docstring for the calibration)
    np.testing.assert_allclose(warm_j, warm_t, rtol=1e-4,
                               err_msg="warmup trajectories diverge")
    np.testing.assert_allclose(cam_j, cam_t, rtol=1e-3,
                               err_msg="camera-stage trajectories diverge")
    rel10 = np.abs(main_j[:10] - np.asarray(main_t[:10])) / np.abs(main_t[:10])
    assert float(np.median(rel10)) < 3e-2, (
        f"early main median rel divergence {np.median(rel10):.2e}")
    assert float(rel10.max()) < 8e-2, (
        f"early main max rel divergence {rel10.max():.2e}")
    rel = np.abs(main_j - np.asarray(main_t)) / np.abs(main_t)
    assert float(np.median(rel)) < 6e-2, (
        f"main-loop median rel divergence {np.median(rel):.2e}")
    assert rel[-1] < 2.5e-1, f"final main loss diverges by {rel[-1]:.2%}"

    # ---- plateau state threading: trip arithmetic is pinned in
    # test_torch_parity.py; here trip TIMING inherits the ~2% loss noise
    # near thresholds, so allow at most ONE factor-of-cfg.lr_factor trip
    # of skew (a dropped plateau state would show up as several).
    group_of_opt = {0: "cameras", 1: "motion", 2: "phase", 3: "instance"}
    for i, (o, s) in enumerate(zip(opts, scheds)):
        g = group_of_opt[i]
        torch_scale = o.param_groups[0]["lr"] / {
            "cameras": cfg.lr_camera, "motion": cfg.lr_human,
            "phase": cfg.lr_phase, "instance": cfg.lr_instance}[g]
        jax_scale = float(fitter.state.plateau[g].scale)
        skew = abs(np.log(jax_scale / torch_scale) / np.log(cfg.lr_factor))
        assert skew <= 1.0 + 1e-6, (
            f"plateau scale for {g}: jax {jax_scale} vs torch {torch_scale} "
            f"({skew:.2f} trips apart)")

    # ---- final parameters, movement-relative like the 20-step twin test
    params_np = jax.tree_util.tree_map(np.asarray, fitter.state.params)
    steps_per_group = {"cameras": CAM + MAIN,
                       "motion": WARMUP + MAIN, "phase": WARMUP + MAIN,
                       "instance": MAIN}
    checks = [
        ("cameras", params_np["cameras"],
         twin.learned_cameras.detach().numpy(), cfg.lr_camera),
        ("phase", params_np["phase"]["shifts"],
         twin.shifts.detach().numpy(), cfg.lr_phase),
        ("instance", params_np["instance"],
         twin.learned_instance_code.detach().numpy(), cfg.lr_instance),
        ("motion", params_np["motion"]["trunk"]["W1"],
         twin.motion["W1"].detach().numpy(), cfg.lr_human),
    ]
    # measured noise floor: cameras 1.00/0.04, instance 0.94/0.17,
    # phase 0.79/0.18, motion 0.83/0.42 (frac<=10%move, max/move) — the
    # motion tail is the ReLU-mask bistability documented above. A real
    # topology bug (wrong groups stepped, optimizer state dropped between
    # stages/chunks) moves whole groups by O(1) x movement.
    for g, ours, theirs, lr in checks:
        move = steps_per_group[g] * lr
        diff = np.abs(ours - theirs)
        frac_tight = float(np.mean(diff <= 0.1 * move))
        assert frac_tight >= 0.7, (
            f"{g}: only {frac_tight:.3%} of elements within 10% of movement")
        assert float(diff.max()) <= 0.6 * move, (
            f"{g}: max divergence {diff.max():.4g} > 60% of {move}")

    # ---- resulting eval CSV cells (eval/metrics.py eval_2d)
    V, F = assets.num_views, assets.num_frames
    vi = jnp.repeat(jnp.arange(V), F)
    fi = jnp.tile(jnp.arange(F), V)
    from nemo_tpu.fit.model import predict, project_to_views
    pr = predict(fitter.state.params, cfg, assets, vi, fi)
    p2_j = np.asarray(project_to_views(fitter.state.params, cfg, assets,
                                       pr["j"], vi)).reshape(V, F, 25, 2)
    tvi = torch.as_tensor(np.asarray(vi)).long()
    tfi = torch.as_tensor(np.asarray(fi)).long()
    tp = twin.get_preds_batch(tvi, tfi)
    p2_t = twin.learned_camera_projection(tp["j"], tvi).detach().numpy()
    p2_t = p2_t.reshape(V, F, 25, 2)
    gt = bundle.labels["gt"]
    diag = bundle.bbox_diag("gt")
    st_j = eval_2d(p2_j, {}, gt, diag)
    st_t = eval_2d(p2_t, {}, gt, diag)
    # cell-exactness of the eval STACK at identical inputs is pinned by
    # tests/test_reference_twin_eval.py; this diff measures the composed
    # fits' end-state drift through the eval columns, so it inherits the
    # trajectory noise floor above (final loss rel ~5%).
    # per-view cells carry the most noise (measured worst 11% on the
    # distance columns); the view-mean is the stable summary. PCK is a
    # thresholded COUNT (90 joints/view at this shape): single joints
    # crossing the threshold swing a cell by whole percentage points, so
    # it gets an absolute percentage-point tolerance instead.
    for k in st_j:
        a = np.asarray(st_j[k], np.float64)
        b = np.asarray(st_t[k], np.float64)
        if k.startswith("pck"):
            np.testing.assert_allclose(
                a, b, atol=6.0, err_msg=f"eval_2d CSV cell {k} diverges")
            np.testing.assert_allclose(
                a.mean(), b.mean(), atol=3.0,
                err_msg=f"eval_2d column mean {k} diverges")
        else:
            np.testing.assert_allclose(
                a, b, rtol=2.5e-1, err_msg=f"eval_2d CSV cell {k} diverges")
            np.testing.assert_allclose(
                a.mean(), b.mean(), rtol=1e-1,
                err_msg=f"eval_2d column mean {k} diverges")
