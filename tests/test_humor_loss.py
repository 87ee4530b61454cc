"""Full HuMoR training-loss + scheduled-sampling tests.

The oracle fixture imports the reference's OWN loss module
(/root/reference/humor/humor/losses/humor_loss.py) with smplx stubbed
(never instantiated while SMPL term weights are 0) and pins
nemo_tpu.models.humor_loss against it on randomized inputs. Frame
canonicalization (humor/utils/transforms.py) is pinned the same way.
"""

from __future__ import annotations

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from nemo_tpu.models.humor import (HumorConfig, STATE_DIM,
                                   apply_world2local_state,
                                   canonicalize_state,
                                   compute_world2aligned_mat, humor_roll_out,
                                   humor_single_step, init_humor, pack_state,
                                   split_state)
from nemo_tpu.models.humor_loss import (HumorLossConfig, humor_full_loss,
                                        humor_loss_terms,
                                        humor_step_scheduled,
                                        kl_anneal_weight, kl_normal,
                                        make_humor_full_train_step,
                                        multistep_lr, sched_samp_gt_p)

HUMOR_ROOT = "/root/reference/humor/humor"

FIELD_DIMS = {"trans": 3, "trans_vel": 3, "root_orient": 3,
              "root_orient_vel": 3, "pose_body": 63, "joints": 66,
              "joints_vel": 66}


@pytest.fixture(scope="module")
def ref(request):
    """Import reference humor_loss + transforms; restore sys state after."""
    touched = ["smplx", "smplx.vertex_ids", "smplx.utils", "body_model",
               "body_model.utils", "body_model.body_model", "utils",
               "utils.transforms", "datasets", "datasets.amass_utils",
               "losses", "losses.humor_loss"]
    saved = {n: sys.modules.get(n) for n in touched}
    saved_path = list(sys.path)

    def restore():
        sys.path[:] = saved_path
        for n in touched:
            if saved[n] is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = saved[n]

    request.addfinalizer(restore)

    # smplx is not installed; HumorLoss only builds BodyModel when SMPL
    # term weights are nonzero, which the oracle never uses.
    smplx = types.ModuleType("smplx")
    smplx.SMPL = smplx.SMPLH = smplx.SMPLX = object
    vid = types.ModuleType("smplx.vertex_ids")
    vid.vertex_ids = {}
    su = types.ModuleType("smplx.utils")
    su.Struct = object
    smplx.vertex_ids, smplx.utils = vid, su
    sys.modules["smplx"] = smplx
    sys.modules["smplx.vertex_ids"] = vid
    sys.modules["smplx.utils"] = su

    sys.path.insert(0, HUMOR_ROOT)
    import losses.humor_loss as hl
    import utils.transforms as tr
    sys.path.remove(HUMOR_ROOT)
    return types.SimpleNamespace(humor_loss=hl, transforms=tr)


def _rand_dicts(rng, B):
    pred = {k: rng.standard_normal((B, d)).astype(np.float32)
            for k, d in FIELD_DIMS.items()}
    gt = {k: rng.standard_normal((B, d)).astype(np.float32)
          for k, d in FIELD_DIMS.items()}
    qm = rng.standard_normal((B, 48)).astype(np.float32)
    qv = rng.uniform(0.2, 2.0, (B, 48)).astype(np.float32)
    pm = rng.standard_normal((B, 48)).astype(np.float32)
    pv = rng.uniform(0.2, 2.0, (B, 48)).astype(np.float32)
    logits = rng.standard_normal((B, 9)).astype(np.float32) * 2.0
    contacts_gt = (rng.uniform(size=(B, 9)) > 0.5).astype(np.float32)
    return pred, gt, (qm, qv), (pm, pv), logits, contacts_gt


LCFG = HumorLossConfig(
    kl_loss=0.7, kl_loss_anneal_start=2, kl_loss_anneal_end=6,
    regr_trans_loss=1.1, regr_trans_vel_loss=0.9,
    regr_root_orient_loss=1.3, regr_root_orient_vel_loss=0.8,
    regr_pose_loss=1.7, regr_joint_loss=0.6, regr_joint_vel_loss=0.5,
    contacts_loss=0.4, contacts_vel_loss=0.3)


def _ref_loss(ref, lcfg):
    return ref.humor_loss.HumorLoss(
        kl_loss=lcfg.kl_loss,
        kl_loss_anneal_start=lcfg.kl_loss_anneal_start,
        kl_loss_anneal_end=lcfg.kl_loss_anneal_end,
        kl_loss_cycle_len=lcfg.kl_loss_cycle_len,
        regr_trans_loss=lcfg.regr_trans_loss,
        regr_trans_vel_loss=lcfg.regr_trans_vel_loss,
        regr_root_orient_loss=lcfg.regr_root_orient_loss,
        regr_root_orient_vel_loss=lcfg.regr_root_orient_vel_loss,
        regr_pose_loss=lcfg.regr_pose_loss,
        regr_joint_loss=lcfg.regr_joint_loss,
        regr_joint_vel_loss=lcfg.regr_joint_vel_loss,
        # fields absent from the 'smpl+joints' state layout
        regr_pose_vel_loss=0.0, regr_joint_orient_vel_loss=0.0,
        regr_vert_loss=0.0, regr_vert_vel_loss=0.0,
        contacts_loss=lcfg.contacts_loss,
        contacts_vel_loss=lcfg.contacts_vel_loss)


class TestHumorLossOracle:
    def test_kl_normal(self, ref):
        rng = np.random.default_rng(0)
        _, _, (qm, qv), (pm, pv), _, _ = _rand_dicts(rng, 13)
        ours = kl_normal(jnp.asarray(qm), jnp.asarray(qv), jnp.asarray(pm),
                         jnp.asarray(pv))
        loss_mod = _ref_loss(ref, LCFG)
        theirs = loss_mod.kl_normal(torch.tensor(qm), torch.tensor(qv),
                                    torch.tensor(pm), torch.tensor(pv))
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=2e-5)

    @pytest.mark.parametrize("epoch", [0, 3, 4, 6, 10])
    def test_forward_parity(self, ref, epoch):
        rng = np.random.default_rng(epoch + 1)
        pred, gt, post, prior, logits, cgt = _rand_dicts(rng, 17)
        loss_mod = _ref_loss(ref, LCFG)

        pred_t = {k: torch.tensor(v) for k, v in pred.items()}
        gt_t = {k: torch.tensor(v) for k, v in gt.items()}
        pred_t["posterior_distrib"] = (torch.tensor(post[0]),
                                       torch.tensor(post[1]))
        pred_t["prior_distrib"] = (torch.tensor(prior[0]),
                                   torch.tensor(prior[1]))
        pred_t["contacts"] = torch.tensor(logits)
        gt_t["contacts"] = torch.tensor(cgt)
        ref_total, ref_stats = loss_mod(pred_t, gt_t, epoch)

        ours_total, ours_stats = humor_loss_terms(
            LCFG, pack_state({k: jnp.asarray(v) for k, v in pred.items()}),
            pack_state({k: jnp.asarray(v) for k, v in gt.items()}),
            tuple(map(jnp.asarray, post)), tuple(map(jnp.asarray, prior)),
            epoch, contact_logits=jnp.asarray(logits),
            contacts_gt=jnp.asarray(cgt))

        np.testing.assert_allclose(float(ours_total), float(ref_total),
                                   rtol=3e-5)
        for name in ["kl_loss", "kl_anneal_weight", "trans_loss",
                     "trans_vel_loss", "root_orient_loss",
                     "root_orient_vel_loss", "pose_body_loss", "joints_loss",
                     "joints_vel_loss", "contacts_loss", "contacts_acc",
                     "contacts_pos_acc", "contacts_neg_acc",
                     "contacts_vel_loss", "reconstr_weighted_loss"]:
            assert name in ours_stats, name
            np.testing.assert_allclose(
                float(ours_stats[name]), float(ref_stats[name]), rtol=3e-5,
                atol=1e-7, err_msg=f"{name} @ epoch {epoch}")

    def test_kl_cycle_parity(self, ref):
        lcfg = HumorLossConfig(kl_loss=1.0, kl_loss_cycle_len=8,
                               contacts_loss=0.0, contacts_vel_loss=0.0)
        loss_mod = _ref_loss(ref, lcfg)
        rng = np.random.default_rng(7)
        pred, gt, post, prior, _, _ = _rand_dicts(rng, 5)
        pred_t = {k: torch.tensor(v) for k, v in pred.items()}
        gt_t = {k: torch.tensor(v) for k, v in gt.items()}
        pred_t["posterior_distrib"] = (torch.tensor(post[0]),
                                       torch.tensor(post[1]))
        pred_t["prior_distrib"] = (torch.tensor(prior[0]),
                                   torch.tensor(prior[1]))
        for epoch in range(10):
            _, ref_stats = loss_mod(pred_t, gt_t, epoch)
            ours = kl_anneal_weight(lcfg, epoch)
            np.testing.assert_allclose(
                float(ours), float(ref_stats["kl_anneal_weight"]),
                rtol=1e-6, err_msg=f"epoch {epoch}")


class TestCanonicalFrame:
    def test_world2aligned_mat_oracle(self, ref):
        from nemo_tpu.geometry.rotations import batch_rodrigues
        rng = np.random.default_rng(3)
        aa = rng.standard_normal((32, 3)).astype(np.float32)
        R = batch_rodrigues(jnp.asarray(aa))
        theirs = ref.transforms.compute_world2aligned_mat(
            torch.tensor(np.asarray(R)))
        ours = compute_world2aligned_mat(R)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   atol=2e-5)

    def test_apply_world2local_roundtrip(self):
        from nemo_tpu.geometry.rotations import batch_rodrigues
        rng = np.random.default_rng(4)
        state = jnp.asarray(rng.standard_normal((6, STATE_DIM))
                            .astype(np.float32))
        rot = batch_rodrigues(jnp.asarray(
            rng.standard_normal((6, 3)).astype(np.float32)))
        trans = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
        t2j = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
        local = apply_world2local_state(state, rot, trans, t2j)
        back = apply_world2local_state(local, rot, trans, t2j, invert=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(state),
                                   atol=2e-5)

    def test_canonicalize_state_properties(self):
        rng = np.random.default_rng(5)
        state = jnp.asarray(rng.standard_normal((4, STATE_DIM))
                            .astype(np.float32))
        local, rot, trans = canonicalize_state(state)
        d = split_state(local)
        # xy translation removed
        np.testing.assert_allclose(np.asarray(d["trans"][:, :2]), 0.0,
                                   atol=1e-5)
        # heading removed: body right axis (-R[:, :, 0]) projects to +x
        from nemo_tpu.geometry.rotations import batch_rodrigues
        R = batch_rodrigues(d["root_orient"])
        right = -np.asarray(R)[:, :, 0]
        assert np.all(right[:, 0] > 0)  # aligned to world +x
        # f32 + the reference's eps-padded normalization leave ~3e-5 slack
        np.testing.assert_allclose(right[:, 1], 0.0, atol=2e-4)

    def test_canonical_rollout_heading_equivariance(self):
        """Rolling out a heading-rotated + xy-shifted world state must give
        the identically transformed trajectory (roll_out :965-1010).

        The rigid motion is expressed through apply_world2local_state with
        x0's own trans2joint (the SMPL-consistent pivot): these transforms
        form a group at fixed trans2joint, and canonicalization removes
        exactly the heading/xy components, so local inputs — and hence the
        sampled latents — coincide between the two placements.
        """
        from nemo_tpu.geometry.rotations import batch_rodrigues
        cfg = HumorConfig()
        p = init_humor(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(6)
        x0 = jnp.asarray(rng.standard_normal((2, STATE_DIM))
                         .astype(np.float32) * 0.3)

        theta = 1.1
        Rz = batch_rodrigues(jnp.asarray([[0.0, 0.0, theta]] * 2))
        shift = jnp.asarray([[0.4, -0.7, 0.0]] * 2)
        d0 = split_state(x0)
        t2j_xy = -(d0["joints"][:, :2] - d0["trans"][:, :2])
        t2j = jnp.concatenate([t2j_xy, jnp.zeros((2, 1))], axis=1)
        tau = jnp.einsum("bji,bj->bi", Rz, shift)  # Rz^{-1} @ shift

        def move(state):
            return apply_world2local_state(state, Rz, tau, t2j)

        key = jax.random.PRNGKey(42)
        base = humor_roll_out(p, cfg, x0, 4, key=key, canonicalize=True)
        moved = humor_roll_out(p, cfg, move(x0), 4, key=key,
                               canonicalize=True)

        for t in range(4):
            np.testing.assert_allclose(
                np.asarray(moved["states"][:, t]),
                np.asarray(move(base["states"][:, t])), atol=2e-3,
                err_msg=f"step {t}")


class TestScheduledSampling:
    def test_gt_p_schedule(self):
        assert float(sched_samp_gt_p(0, 10, 20)) == 1.0
        assert float(sched_samp_gt_p(15, 10, 20)) == pytest.approx(0.5)
        assert float(sched_samp_gt_p(25, 10, 20)) == 0.0

    def test_supervised_limit_matches_full_loss(self):
        """T=1, use_gt_p=1.0 reduces to the supervised step loss."""
        cfg = HumorConfig()
        lcfg = HumorLossConfig(contacts_loss=0.3)
        p = init_humor(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(8)
        past = jnp.asarray(rng.standard_normal((3, 1, STATE_DIM))
                           .astype(np.float32) * 0.3)
        tgt = jnp.asarray(rng.standard_normal((3, 1, STATE_DIM))
                          .astype(np.float32) * 0.3)
        cgt = jnp.asarray((rng.uniform(size=(3, 1, 9)) > 0.5)
                          .astype(np.float32))
        key = jax.random.PRNGKey(2)
        loss_ss, _ = humor_step_scheduled(p, cfg, lcfg, past, tgt, key,
                                          1.0, 0, contacts_gt=cgt)
        _, k_eps = jax.random.split(key)
        step_key = jax.random.split(k_eps, 1)[0]
        loss_sup, _ = humor_full_loss(p, cfg, lcfg, past[:, 0], tgt[:, 0],
                                      step_key, 0,
                                      contacts_gt=cgt[:, 0])
        np.testing.assert_allclose(float(loss_ss), float(loss_sup),
                                   rtol=1e-5)

    def test_autoregressive_runs_and_differs(self):
        cfg = HumorConfig()
        lcfg = HumorLossConfig()
        p = init_humor(jax.random.PRNGKey(3), cfg)
        rng = np.random.default_rng(9)
        past = jnp.asarray(rng.standard_normal((2, 4, STATE_DIM))
                           .astype(np.float32) * 0.3)
        tgt = jnp.asarray(rng.standard_normal((2, 4, STATE_DIM))
                          .astype(np.float32) * 0.3)
        key = jax.random.PRNGKey(4)
        l_gt, s_gt = humor_step_scheduled(p, cfg, lcfg, past, tgt, key,
                                          1.0, 0)
        l_own, s_own = humor_step_scheduled(p, cfg, lcfg, past, tgt, key,
                                            0.0, 0)
        assert np.isfinite(float(l_gt)) and np.isfinite(float(l_own))
        assert abs(float(l_gt) - float(l_own)) > 1e-7

        g = jax.grad(lambda pp: humor_step_scheduled(
            pp, cfg, lcfg, past, tgt, key, 0.0, 0)[0])(p)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


class TestSmplTerms:
    def test_toy_smpl_consistency(self):
        """SMPL terms are MSEs of smpl_fn outputs (humor_loss.py:304-329);
        pin with a deterministic toy body function."""
        def toy_smpl(trans, orient, pose, betas):
            B = trans.shape[0]
            base = (trans[:, None, :] + orient[:, None, :]
                    + pose.reshape(B, 21, 3).mean(1, keepdims=True))
            joints = base + jnp.arange(22)[None, :, None] * 0.1
            verts = base + jnp.arange(43)[None, :, None] * 0.01
            return joints, verts

        lcfg = HumorLossConfig(kl_loss=0.0, regr_trans_loss=0.0,
                               regr_trans_vel_loss=0.0,
                               regr_root_orient_loss=0.0,
                               regr_root_orient_vel_loss=0.0,
                               regr_pose_loss=0.0, regr_joint_loss=0.0,
                               regr_joint_vel_loss=0.0,
                               smpl_joint_loss=2.0, smpl_mesh_loss=3.0,
                               smpl_joint_consistency_loss=5.0)
        rng = np.random.default_rng(10)
        pred = jnp.asarray(rng.standard_normal((4, STATE_DIM))
                           .astype(np.float32))
        gt = jnp.asarray(rng.standard_normal((4, STATE_DIM))
                         .astype(np.float32))
        betas = jnp.zeros((4, 10))
        post = (jnp.zeros((4, 48)), jnp.ones((4, 48)))
        loss, stats = humor_loss_terms(lcfg, pred, gt, post, post, 0,
                                       smpl_fn=toy_smpl, betas=betas)

        pd, gd = split_state(pred), split_state(gt)
        pj, pm_ = toy_smpl(pd["trans"], pd["root_orient"], pd["pose_body"],
                           betas)
        gj, gm = toy_smpl(gd["trans"], gd["root_orient"], gd["pose_body"],
                          betas)
        exp_j = float(((pj - gj) ** 2).mean())
        exp_m = float(((pm_ - gm) ** 2).mean())
        exp_c = float(((pj - pd["joints"].reshape(4, 22, 3)) ** 2).mean())
        np.testing.assert_allclose(float(stats["smpl_joint_loss"]), exp_j,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(stats["smpl_mesh_loss"]), exp_m,
                                   rtol=1e-6)
        np.testing.assert_allclose(
            float(stats["smpl_joint_consistency_loss"]), exp_c, rtol=1e-6)
        np.testing.assert_allclose(float(loss),
                                   2 * exp_j + 3 * exp_m + 5 * exp_c,
                                   rtol=1e-6)

    def test_vert_consistency_rejected(self):
        lcfg = HumorLossConfig(smpl_vert_consistency_loss=1.0)
        with pytest.raises(ValueError):
            humor_loss_terms(lcfg, jnp.zeros((1, STATE_DIM)),
                             jnp.zeros((1, STATE_DIM)),
                             (jnp.zeros((1, 48)), jnp.ones((1, 48))),
                             (jnp.zeros((1, 48)), jnp.ones((1, 48))), 0)


class TestTrainStep:
    def test_multistep_lr(self):
        lr_at = multistep_lr(1e-3, milestones=(4, 8), gamma=0.1)
        assert float(lr_at(0)) == pytest.approx(1e-3)
        assert float(lr_at(4)) == pytest.approx(1e-4)
        assert float(lr_at(9)) == pytest.approx(1e-5, rel=1e-5)

    def test_train_step_updates_and_nan_guard(self):
        cfg = HumorConfig()
        lcfg = HumorLossConfig()
        p = init_humor(jax.random.PRNGKey(5), cfg)
        init, step = make_humor_full_train_step(
            cfg, lcfg, lr=1e-4, sched_milestones=(2,), sched_decay=0.1,
            sched_samp_start=1, sched_samp_end=3)
        st = init(p)
        rng = np.random.default_rng(11)
        past = jnp.asarray(rng.standard_normal((2, 3, STATE_DIM))
                           .astype(np.float32) * 0.3)
        tgt = jnp.asarray(rng.standard_normal((2, 3, STATE_DIM))
                          .astype(np.float32) * 0.3)
        p1, st, stats = step(p, st, past, tgt, jax.random.PRNGKey(6), 0)
        assert float(stats["update_skipped"]) == 0.0
        assert float(stats["lr"]) == pytest.approx(1e-4)
        moved = jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), p, p1))
        assert moved > 0

        # lr decay past the milestone
        _, _, stats2 = step(p1, st, past, tgt, jax.random.PRNGKey(7), 2)
        assert float(stats2["lr"]) == pytest.approx(1e-5, rel=1e-5)

        # NaN input -> update skipped, params unchanged (train_humor:197-210)
        bad = past.at[0, 0, 0].set(jnp.nan)
        p2, _, stats3 = step(p1, st, bad, tgt, jax.random.PRNGKey(8), 0)
        assert float(stats3["update_skipped"]) == 1.0
        same = jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), p1, p2))
        assert same == 0.0
