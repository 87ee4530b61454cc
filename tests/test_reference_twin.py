"""End-to-end parity: jitted jax fit_loss vs a torch twin of the reference.

The twin (tests/torch_twin.py) re-implements the reference NemoV2 fit-loss
numerics in torch from the reference equations. Both sides run on identical
synthetic assets and identical initial parameters; we assert

  1. the loss and every metric agree on a fresh batch, and
  2. a 20-step optimization trajectory (per-group Adams exactly as the
     reference builds them) stays matched in loss and parameters.

This pins step-for-step parity of everything in the fit except the
proprietary asset files (SMPL/VPoser/GMM weights), which enter only as
arrays both sides load identically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nemo_tpu.body import synthetic_smpl_model
from nemo_tpu.data import synthetic_problem
from nemo_tpu.fit import (NemoConfig, build_assets, fit_loss, init_params,
                          make_optimizer)
from nemo_tpu.priors import init_vposer, synthetic_gmm_prior

from torch_twin import TorchNemoV2


def _make_problem():
    cfg = NemoConfig(
        model_version=2, h_dim=32, instance_code_size=4,
        phase_rbf_dim=8, rbf_kernel="quadratic",
        monotonic_network_n_nodes=6, batch_size=12,
        weight_vp_loss=10.0, weight_vp_z_loss=1.0, weight_gmm_loss=0.5,
        label_type="gt", lr_factor=1.0,
    )
    model = synthetic_smpl_model(num_vertices=200, seed=0)
    bundle, _ = synthetic_problem(model, num_views=3, num_frames=10, seed=0)
    gmm = synthetic_gmm_prior(4)
    vposer = init_vposer(jax.random.PRNGKey(7))
    assets = build_assets(bundle, model, cfg, gmm=gmm, vposer=vposer)

    params = init_params(jax.random.PRNGKey(0), cfg, assets.num_views,
                         assets.img_d0)
    params_np = jax.tree_util.tree_map(np.asarray, params)

    twin = TorchNemoV2(cfg, model,
                       {k: np.asarray(v) for k, v in vposer.items()},
                       gmm,
                       np.asarray(assets.points2d_gt),
                       np.asarray(assets.bbox_diag),
                       assets.img_d0, assets.img_d1)
    twin.set_params(params_np)
    return cfg, assets, params, twin


def _batch(step, num_views, num_frames, batch_size):
    rng = np.random.RandomState(1000 + step)
    vi = rng.randint(0, num_views, size=batch_size).astype(np.int32)
    fi = rng.randint(0, num_frames, size=batch_size).astype(np.int32)
    return vi, fi


class TestReferenceTwin:
    def test_fit_loss_matches_torch_reference(self):
        cfg, assets, params, twin = _make_problem()
        vi, fi = _batch(0, assets.num_views, assets.num_frames,
                        cfg.batch_size)

        loss_j, metrics_j = jax.jit(
            lambda p, v, f: fit_loss(p, cfg, assets, v, f, training=False)
        )(params, jnp.asarray(vi), jnp.asarray(fi))

        loss_t, metrics_t = twin.fit_loss(torch.as_tensor(vi).long(),
                                          torch.as_tensor(fi).long())

        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=2e-5)
        for k in ("kp_loss", "vp_recon_loss", "vp_kl_loss", "gmm_loss",
                  "total_loss"):
            np.testing.assert_allclose(
                float(metrics_j[k]), float(metrics_t[k]), rtol=5e-5,
                err_msg=f"metric {k} diverges from the torch reference twin")

    @pytest.mark.slow
    def test_20_step_trajectory_matches_torch_reference(self):
        cfg, assets, params, twin = _make_problem()
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        active = tuple(g for g in ("cameras", "motion", "rbf", "phase",
                                   "instance") if g in params)

        @jax.jit
        def step(params, opt_state, vi, fi):
            (loss, _), grads = jax.value_and_grad(
                lambda p: fit_loss(p, cfg, assets, vi, fi, training=False),
                has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params,
                                            active=active)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, opt_state, loss

        topts = twin.make_optimizers()

        losses_j, losses_t = [], []
        for i in range(20):
            vi, fi = _batch(i, assets.num_views, assets.num_frames,
                            cfg.batch_size)
            params, opt_state, lj = step(params, opt_state, jnp.asarray(vi),
                                         jnp.asarray(fi))
            losses_j.append(float(lj))

            for o in topts:
                o.zero_grad()
            lt, _ = twin.fit_loss(torch.as_tensor(vi).long(),
                                  torch.as_tensor(fi).long())
            lt.backward()
            for o in topts:
                o.step()
            losses_t.append(float(lt))

        # Step 0 matches to ~2e-5 (see the loss test); over 20 Adam steps
        # f32 rounding noise is sign-amplified by the m/sqrt(v) normalizer,
        # growing the gap to ~4e-4 relative — still step-for-step parity.
        np.testing.assert_allclose(losses_j[:5], losses_t[:5], rtol=1e-4,
                                   err_msg="early loss trajectory diverges")
        np.testing.assert_allclose(losses_j, losses_t, rtol=1e-3,
                                   err_msg="loss trajectories diverge")

        # Final parameters: compare every group, tolerance scaled to the
        # group's total possible movement (20 Adam steps of size lr).
        params_np = jax.tree_util.tree_map(np.asarray, params)
        checks = [
            (params_np["cameras"],
             twin.learned_cameras.detach().numpy(), cfg.lr_camera),
            (params_np["phase"]["shifts"],
             twin.shifts.detach().numpy(), cfg.lr_phase),
            (params_np["phase"]["scales"],
             twin.scales.detach().numpy(), cfg.lr_phase),
            (params_np["instance"],
             twin.learned_instance_code.detach().numpy(), cfg.lr_instance),
            (params_np["rbf"]["log_sigmas"],
             twin.log_sigmas.detach().numpy(), cfg.lr_human),
            (params_np["motion"]["W_rot"],
             twin.motion["W_rot"].detach().numpy(), cfg.lr_human),
            (params_np["motion"]["W_lin"],
             twin.motion["W_lin"].detach().numpy(), cfg.lr_human),
            (params_np["motion"]["trunk"]["W1"],
             twin.motion["W1"].detach().numpy(), cfg.lr_human),
        ]
        # Tolerance is relative to the group's maximum 20-step Adam movement
        # (20 * lr). Adam's m/sqrt(v) normalizer sign-amplifies f32 rounding
        # noise on individual near-zero-gradient elements, so a handful of
        # elements drift by tens of percent of their movement while the bulk
        # (and the loss trajectory above) stay locked: require 99% of
        # elements within 6% and every element within 25%.
        for ours, theirs, lr in checks:
            diff = np.abs(ours - theirs)
            move = 20 * lr
            frac_tight = float(np.mean(diff <= 0.06 * move))
            assert frac_tight >= 0.99, (
                f"only {frac_tight:.3%} of elements within 6% of movement")
            assert float(diff.max()) <= 0.25 * move, (
                f"max param divergence {diff.max():.4g} > 25% of {move}")
        # betas must remain exactly zero on both sides (the reference never
        # hands learned_betas to an optimizer).
        assert np.all(params_np["betas"] == 0.0)
        assert np.all(twin.learned_betas.detach().numpy() == 0.0)


def _make_v3_problem():
    cfg = NemoConfig(
        model_version=3, h_dim=32, instance_code_size=4,
        phase_rbf_dim=8, rbf_kernel="quadratic",
        monotonic_network_n_nodes=6, batch_size=12,
        weight_vp_loss=10.0, weight_vp_z_loss=1.0, weight_gmm_loss=0.5,
        weight_instance_loss=0.3, weight_3d_loss=0.7, code_noise=0.0,
        label_type="gt", lr_factor=1.0,
    )
    model = synthetic_smpl_model(num_vertices=200, seed=0)
    bundle, _ = synthetic_problem(model, num_views=3, num_frames=10, seed=0)
    gmm = synthetic_gmm_prior(4)
    vposer = init_vposer(jax.random.PRNGKey(7))
    assets = build_assets(bundle, model, cfg, gmm=gmm, vposer=vposer)
    params = init_params(jax.random.PRNGKey(0), cfg, assets.num_views,
                         assets.img_d0)
    twin = TorchNemoV2(cfg, model,
                       {k: np.asarray(v) for k, v in vposer.items()},
                       gmm, np.asarray(assets.points2d_gt),
                       np.asarray(assets.bbox_diag),
                       assets.img_d0, assets.img_d1,
                       hmr_theta=np.asarray(assets.hmr_theta),
                       hmr_mask=np.asarray(assets.hmr_mask))
    twin.set_params(jax.tree_util.tree_map(np.asarray, params))
    return cfg, assets, params, twin


class TestReferenceTwinV3V4:
    def test_v3_fit_loss_matches_torch_reference(self):
        """V3 extras pinned: instance-code L2 (:3863-3866) + the
        mse_robust 3D theta loss (:3868-3881)."""
        cfg, assets, params, twin = _make_v3_problem()
        vi, fi = _batch(0, assets.num_views, assets.num_frames,
                        cfg.batch_size)
        loss_j, metrics_j = jax.jit(
            lambda p, v, f: fit_loss(p, cfg, assets, v, f, training=False)
        )(params, jnp.asarray(vi), jnp.asarray(fi))
        loss_t, metrics_t = twin.fit_loss(torch.as_tensor(vi).long(),
                                          torch.as_tensor(fi).long())
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=2e-5)
        for k in ("kp_loss", "instance_loss", "loss_3d", "gmm_loss",
                  "vp_recon_loss", "total_loss"):
            np.testing.assert_allclose(
                float(metrics_j[k]), float(metrics_t[k]), rtol=5e-5,
                err_msg=f"V3 metric {k} diverges from the torch twin")

    def test_v4_camera_stage_matches_torch_reference(self):
        """V4's camera stage pinned: detached pose, priors off, 3D on,
        straight 25-joint projection (:4060-4149, :3997-3998)."""
        import dataclasses as dc
        from nemo_tpu.fit.model import camera_stage_loss
        cfg, assets, params, twin = _make_v3_problem()
        cfg4 = dc.replace(cfg, model_version=4)
        assets4 = assets   # same tensors; joint indexing is cfg-driven
        twin.cfg = cfg4
        vi, fi = _batch(3, assets.num_views, assets.num_frames,
                        cfg.batch_size)
        loss_j, metrics_j = jax.jit(
            lambda p, v, f: camera_stage_loss(p, cfg4, assets4, v, f)
        )(params, jnp.asarray(vi), jnp.asarray(fi))
        loss_t, metrics_t = twin.camera_stage_loss(
            torch.as_tensor(vi).long(), torch.as_tensor(fi).long())
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=5e-5)
        for k in ("kp_loss", "loss_3d", "total_loss"):
            np.testing.assert_allclose(
                float(metrics_j[k]), float(metrics_t[k]), rtol=1e-4,
                err_msg=f"V4 camera-stage metric {k} diverges")
        # priors must be absent from the camera stage on both sides
        assert "gmm_loss" not in metrics_t
        assert "vp_recon_loss" not in metrics_t

    def test_v4_detach_pose_gradient_semantics(self):
        """detach_pose: the pose head's rotmat grads vanish through the
        kp data term but orient/trans still receive them (:4010-4058)."""
        import dataclasses as dc
        from nemo_tpu.fit.model import camera_stage_loss
        cfg, assets, params, twin = _make_v3_problem()
        cfg4 = dc.replace(cfg, model_version=4, weight_3d_loss=0.0)
        vi, fi = _batch(5, assets.num_views, assets.num_frames,
                        cfg.batch_size)
        grads = jax.grad(lambda p: camera_stage_loss(
            p, cfg4, assets, jnp.asarray(vi), jnp.asarray(fi))[0])(params)
        # the rotation head's first 6 columns are the global orient (still
        # trained); columns 6: feed only the detached body pose -> zero
        w_rot_g = np.asarray(grads["motion"]["W_rot"])
        assert float(np.abs(w_rot_g[:, 6:]).max()) == 0
        assert float(np.abs(w_rot_g[:, :6]).max()) > 0
        # the trans head and cameras still learn
        assert float(np.abs(np.asarray(grads["motion"]["W_lin"])).max()) > 0
        assert float(np.abs(np.asarray(grads["cameras"])).max()) > 0
