"""3D observation energies of the HuMoR motion optimizer.

masked_l2 / joints3d_smooth / points3d one-way-chamfer losses are pinned
against the direct-imported reference fitting/fitting_loss.py FittingLoss
(the CUDA chamfer ext stubbed with a brute-force torch twin; smplx stubbed;
sys.modules snapshot/restored), plus a 3D-only end-to-end fit smoke — the
AMASS / RGB-D observation modes of run_fitting.py.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from nemo_tpu.models.humor_fit import (joints3d_smooth_loss, masked_l2_loss,
                                       points3d_loss)

HUMOR_ROOT = "/root/reference/humor/humor"
REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref_fl(request):
    """Direct-import the reference FittingLoss with bisquare robustifier
    and a brute-force torch chamfer standing in for the CUDA ext."""
    import torch

    touched = ["smplx", "smplx.vertex_ids", "smplx.utils", "body_model",
               "body_model.utils", "body_model.body_model", "utils",
               "utils.transforms", "utils.logging", "utils.chamfer_distance",
               "datasets", "fitting", "fitting.fitting_utils",
               "fitting.fitting_loss", "humor", "humor.humor",
               "humor.humor.utils", "humor.humor.utils.logging",
               "humor.humor.utils.transforms", "humor.humor.fitting",
               "humor.humor.fitting.fitting_utils", "configer"]
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

    had_float = hasattr(np, "float")
    if not had_float:
        np.float = float
        request.addfinalizer(lambda: delattr(np, "float"))

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

    # utils.chamfer_distance: brute-force twin of the CUDA ext's forward
    # (humor/utils/chamfer_distance — per-point min sq dist both ways)
    cd_mod = types.ModuleType("utils.chamfer_distance")

    class ChamferDistance(torch.nn.Module):
        def forward(self, a, b):
            d = torch.cdist(a, b) ** 2
            return d.min(2)[0], d.min(1)[0]

    cd_mod.ChamferDistance = ChamferDistance
    sys.modules["utils.chamfer_distance"] = cd_mod

    sys.path.insert(0, REF_ROOT)
    sys.path.insert(0, HUMOR_ROOT)
    import fitting.fitting_loss as fl_mod
    sys.path.remove(HUMOR_ROOT)
    sys.path.remove(REF_ROOT)

    weights = {"joints3d": 1.0, "verts3d": 1.0, "points3d": 1.0,
               "init_motion_prior": 0.0}
    fl = fl_mod.FittingLoss([weights], robust_loss="bisquare",
                            use_chamfer=True)
    return fl


class TestObservationLossOracles:
    def test_joints3d_masked_l2(self, ref_fl, rng):
        import torch
        obs = rng.randn(2, 6, 22, 3).astype(np.float32)
        obs[0, 2, 5], obs[1, 4] = np.inf, np.inf   # occluded entries
        pred = rng.randn(2, 6, 22, 3).astype(np.float32)
        want = float(ref_fl.joints3d_loss(torch.tensor(obs),
                                          torch.tensor(pred)))
        got = float(masked_l2_loss(obs, pred))
        assert np.isclose(got, want, rtol=1e-5)

    def test_joints3d_smooth(self, ref_fl, rng):
        import torch
        pred = rng.randn(1, 7, 22, 3).astype(np.float32)
        want = float(ref_fl.joints3d_smooth_loss(torch.tensor(pred)))
        got = float(joints3d_smooth_loss(pred[0]))
        assert np.isclose(got, want, rtol=1e-5)

    def test_points3d_one_way_chamfer_bisquare(self, ref_fl, rng):
        import torch
        T, N, V = 5, 64, 80
        obs = rng.randn(T, N, 3).astype(np.float32)
        pred = (rng.randn(T, V, 3) * 0.8).astype(np.float32)
        want = float(ref_fl.points3d_loss(torch.tensor(obs[None]),
                                          torch.tensor(pred[None])))
        got = float(points3d_loss(obs, pred))
        assert np.isclose(got, want, rtol=1e-3)

    def test_points3d_no_robustifier(self, ref_fl, rng):
        import torch
        ref_fl.robust_loss = "none"
        try:
            obs = rng.randn(3, 32, 3).astype(np.float32)
            pred = rng.randn(3, 50, 3).astype(np.float32)
            want = float(ref_fl.points3d_loss(torch.tensor(obs[None]),
                                              torch.tensor(pred[None])))
            got = float(points3d_loss(obs, pred, robust_loss="none"))
            assert np.isclose(got, want, rtol=1e-4)
        finally:
            ref_fl.robust_loss = "bisquare"


@pytest.mark.slow
def test_3d_only_motion_fit(rng):
    """kp2d=None + obs3d joints/points: the AMASS / RGB-D fitting mode —
    trans initialized at the point-cloud mean (motion_optimizer.py:152-156),
    stage losses finite and decreasing."""
    import jax
    import jax.numpy as jnp

    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.body.smpl import smpl_forward
    from nemo_tpu.geometry import batch_rodrigues
    from nemo_tpu.models import (HumorConfig, MotionOptConfig,
                                 humor_motion_fit, init_humor)

    smpl = synthetic_smpl_model(num_vertices=150, seed=0)
    hcfg = HumorConfig(latent_size=8)
    hp = init_humor(jax.random.PRNGKey(0), hcfg)

    T = 4
    true_pose = (0.2 * rng.randn(T, 72)).astype(np.float32)
    true_trans = jnp.asarray(
        np.cumsum(0.01 * rng.randn(T, 3), 0).astype(np.float32))
    rot = batch_rodrigues(jnp.asarray(true_pose.reshape(T, 24, 3)))
    v, _, jf = smpl_forward(smpl, jnp.zeros((1, 10)), rot[:, 1:],
                            rot[:, :1], want_vertices=True,
                            transl=true_trans, want_fk_joints=True)
    joints3d = np.asarray(jf[:, :22]).copy()
    joints3d[:, 10] = np.inf                    # one occluded joint
    pts = np.asarray(v)[:, rng.choice(150, 48, replace=False)]
    pts = pts + 0.005 * rng.randn(*pts.shape).astype(np.float32)

    obs3d = {"joints3d": jnp.asarray(joints3d), "points3d": jnp.asarray(pts)}
    init_pose = jnp.asarray(true_pose + 0.1 * rng.randn(T, 72)
                            .astype(np.float32))
    cfg = MotionOptConfig(steps_stage1=4, steps_stage2=8, steps_stage3=4,
                          joints3d_weight=1.0, points3d_weight=1.0,
                          joints3d_smooth_weight=0.1,
                          joints3d_rollout_weight=1.0)
    out = humor_motion_fit(smpl, hp, hcfg, None, init_pose,
                           jnp.zeros(3), jnp.zeros(2), cfg=cfg,
                           obs3d=obs3d)
    assert np.isfinite(np.asarray(out["pose"])).all()
    assert np.isfinite(np.asarray(out["stage3_loss"])).all()
    assert float(out["stage2_loss"][-1]) < float(out["stage2_loss"][0])
    # stage-1 trans started at the point-cloud mean, not the origin
    assert float(np.abs(np.asarray(out["trans"])).sum()) > 0.0
