"""Direct-import differential oracles against the reference's OWN code.

Every parity claim elsewhere bottoms out in a hand-written torch twin
(tests/torch_twin.py) — a transcription. This module retires the
correlated-transcription-error risk by importing the literal leaf modules
from /root/reference (read-only, ipdb stubbed) and asserting that BOTH the
repo kernels and the torch twin reproduce them on randomized inputs:

  * monotonic_network.py:7-39        MonotonicNetwork
  * nemo/rbf.py:11-139               RBF embedding, all 11 kernels
  * hmr/geometry.py:9-210            rot6d / rodrigues / rotmat->aa /
                                     projection / extrinsics / est-translation
  * hmr/smplify/prior.py:102-196     GMM max-mixture NLL (synthetic pkl)
  * nemo/utils/pose_utils.py:30-159  rigid / similarity / recon-error
  * nemo/utils/misc_utils.py:91-105  GMoF
  * human_body_prior/body_model/lbs.py:164-260  LBS forward

The reference modules are imported as *oracles only* — no reference code is
copied, and the path entry is removed immediately after import.
"""

from __future__ import annotations

import pickle
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference leaf modules with ipdb stubbed, matplotlib Agg."""
    if "ipdb" not in sys.modules:
        stub = types.ModuleType("ipdb")
        stub.set_trace = lambda *a, **k: None
        sys.modules["ipdb"] = stub
    import matplotlib
    matplotlib.use("Agg")

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import monotonic_network
        import nemo.rbf as rbf
        import hmr.geometry as geometry
        import nemo.utils.pose_utils as pose_utils
        import nemo.utils.misc_utils as misc_utils
        import human_body_prior.body_model.lbs as lbs
        import hmr.smplify.prior as prior
    finally:
        # keep sys.path clean so nothing else resolves into the reference
        sys.path.remove(REFERENCE_ROOT)
    return types.SimpleNamespace(
        monotonic_network=monotonic_network, rbf=rbf, geometry=geometry,
        pose_utils=pose_utils, misc_utils=misc_utils, lbs=lbs, prior=prior)


def _t(a):
    return torch.as_tensor(np.asarray(a), dtype=torch.float32)


def _close(ours, theirs, atol, rtol=0.0, what=""):
    ours = np.asarray(ours, dtype=np.float64)
    theirs = np.asarray(theirs.detach().numpy() if torch.is_tensor(theirs)
                        else theirs, dtype=np.float64)
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=rtol,
                               err_msg=what)


# ---------------------------------------------------------------------------
# rotations (hmr/geometry.py:9-61, 181-346)
# ---------------------------------------------------------------------------

class TestRotationOracles:
    def test_rot6d_to_rotmat(self, ref, rng):
        from nemo_tpu.geometry import rot6d_to_rotmat
        import torch_twin

        x = rng.randn(64, 6).astype(np.float32)
        # include the identity-6d init point the fit starts from
        x[0] = np.array([1, 0, 0, 0, 1, 0], np.float32)
        want = ref.geometry.rot6d_to_rotmat(_t(x))
        _close(rot6d_to_rotmat(jnp.asarray(x)), want, atol=1e-6,
               what="repo rot6d_to_rotmat vs reference")
        # twin pinned tighter: same torch ops modulo layout
        twin = torch_twin.rot6d_to_rotmat(_t(x))
        assert torch.allclose(twin, want, atol=1e-7, rtol=0)

    def test_batch_rodrigues(self, ref, rng):
        from nemo_tpu.geometry import batch_rodrigues
        import torch_twin

        aa = (0.8 * rng.randn(64, 3)).astype(np.float32)
        aa[0] = 0.0                       # identity: the documented NaN trap
        aa[1] = [1e-5, 0, 0]              # near-identity
        want = ref.geometry.batch_rodrigues(_t(aa))
        _close(batch_rodrigues(jnp.asarray(aa)), want, atol=2e-6,
               what="repo batch_rodrigues vs reference")
        twin = torch_twin.batch_rodrigues(_t(aa))
        assert torch.allclose(twin, want, atol=1e-6, rtol=0)

    def test_rotmat_to_angle_axis(self, ref, rng):
        from nemo_tpu.geometry import batch_rodrigues, rotmat_to_aa
        import torch_twin

        aa = (0.9 * rng.randn(64, 3)).astype(np.float32)
        aa[0] = 0.0
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        want = ref.geometry.rotation_matrix_to_angle_axis(_t(R))
        assert not torch.isnan(want).any()
        _close(rotmat_to_aa(jnp.asarray(R)), want, atol=1e-5,
               what="repo rotmat_to_aa vs reference kornia port")
        twin = torch_twin.rotmat_to_aa(_t(R))
        assert torch.allclose(twin, want, atol=1e-5, rtol=0)

    def test_rotmat_to_angle_axis_identity_nan_patch(self, ref):
        """The reference patches NaN->0 at identity (geometry.py:209); the
        branchless repo kernel must land on the same fixed point."""
        from nemo_tpu.geometry import rotmat_to_aa
        R = np.eye(3, dtype=np.float32)[None]
        want = ref.geometry.rotation_matrix_to_angle_axis(_t(R))
        _close(rotmat_to_aa(jnp.asarray(R)), want, atol=1e-6)


# ---------------------------------------------------------------------------
# camera (hmr/geometry.py:63-177)
# ---------------------------------------------------------------------------

class TestCameraOracles:
    def _scene(self, rng, B=8, N=25):
        points = rng.randn(B, N, 3).astype(np.float32)
        aa = (0.3 * rng.randn(B, 3)).astype(np.float32)
        from nemo_tpu.geometry import batch_rodrigues
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        t = rng.randn(B, 3).astype(np.float32)
        t[:, 2] += 8.0  # keep everything well in front of the camera
        return points, R, t

    def test_perspective_projection(self, ref, rng):
        from nemo_tpu.geometry import perspective_projection
        import torch_twin

        points, R, t = self._scene(rng)
        f = np.float32(5000.0)
        center = np.tile(np.array([[112.0, 112.0]], np.float32), (8, 1))
        want = ref.geometry.perspective_projection(
            _t(points), _t(R), _t(t), _t(f), _t(center))
        ours = perspective_projection(jnp.asarray(points), jnp.asarray(R),
                                      jnp.asarray(t), f, jnp.asarray(center))
        _close(ours, want, atol=1e-2,  # px units at f=5000; rel ~1e-6
               rtol=1e-5, what="repo perspective_projection vs reference")
        twin = torch_twin.perspective_projection(
            _t(points), _t(R), _t(t), _t(np.full(8, f)), _t(center))
        assert torch.allclose(twin, want, atol=1e-3, rtol=1e-6)

    def test_apply_extrinsics_forward_and_inverse(self, ref, rng):
        from nemo_tpu.geometry import apply_extrinsics

        points, R, t = self._scene(rng)
        for inverse in (False, True):
            want = ref.geometry.apply_extrinsics(
                _t(points), _t(R), _t(t), inverse=inverse)
            ours = apply_extrinsics(jnp.asarray(points), jnp.asarray(R),
                                    jnp.asarray(t), inverse=inverse)
            _close(ours, want, atol=5e-6,
                   what=f"apply_extrinsics(inverse={inverse})")

    def test_estimate_translation(self, ref, rng):
        from nemo_tpu.geometry import estimate_translation

        B, N = 4, 25
        S = rng.randn(B, N, 3).astype(np.float32) * 0.5
        t_true = rng.randn(B, 3).astype(np.float32)
        t_true[:, 2] += 6.0
        f, img = 5000.0, 224.0
        z = S[..., 2] + t_true[:, None, 2]
        uv = f * (S[..., :2] + t_true[:, None, :2]) / z[..., None] + img / 2
        conf = rng.uniform(0.3, 1.0, (B, N)).astype(np.float32)
        want = np.stack([
            ref.geometry.estimate_translation_np(S[i], uv[i], conf[i],
                                                 focal_length=f, img_size=img)
            for i in range(B)])
        ours = estimate_translation(jnp.asarray(S), jnp.asarray(uv),
                                    jnp.asarray(conf), focal_length=f,
                                    img_size=img)
        _close(ours, want, atol=1e-3, rtol=1e-4,
               what="repo estimate_translation vs reference lstsq")
        _close(ours, np.broadcast_to(t_true, want.shape), atol=1e-2,
               what="recovered translation vs ground truth")


# ---------------------------------------------------------------------------
# MonotonicNetwork (monotonic_network.py:7-39)
# ---------------------------------------------------------------------------

def test_monotonic_network_oracle(ref, rng):
    from nemo_tpu.modules import apply_monotonic_single

    torch.manual_seed(3)
    net = ref.monotonic_network.MonotonicNetwork(n_nodes=10, init="rand")
    with torch.no_grad():
        # push some params negative so the relu clamps are exercised
        net.shifts[:2] = torch.tensor([-0.3, -0.01])
        net.scales[2:4] = torch.tensor([-5.0, 0.0])
    x = np.linspace(0.0, 1.0, 33, dtype=np.float32)[:, None]
    want = net(_t(x))
    ours = apply_monotonic_single(jnp.asarray(net.shifts.detach().numpy()),
                                  jnp.asarray(net.scales.detach().numpy()),
                                  jnp.asarray(x))
    _close(ours, want, atol=1e-6, what="repo monotonic warp vs reference")


# ---------------------------------------------------------------------------
# RBF (nemo/rbf.py:11-139) — all 11 kernels
# ---------------------------------------------------------------------------

def test_rbf_oracle_all_kernels(ref, rng):
    from nemo_tpu.modules import RBF_KERNELS, apply_rbf

    K = 16
    log_sigmas = (0.3 * rng.randn(K)).astype(np.float32)
    x = rng.uniform(0.0, 1.0, (40, 1)).astype(np.float32)
    for name in RBF_KERNELS:
        net = ref.rbf.RBF(out_features=K,
                          basis_func=name.replace(" ", "_"))
        with torch.no_grad():
            net.log_sigmas.copy_(_t(log_sigmas))
        want = net(_t(x))
        ours = apply_rbf({"log_sigmas": jnp.asarray(log_sigmas)},
                         jnp.asarray(x), kernel=name)
        _close(ours, want, atol=2e-6, what=f"RBF kernel {name!r}")


# ---------------------------------------------------------------------------
# GMoF (nemo/utils/misc_utils.py:91-105)
# ---------------------------------------------------------------------------

def test_gmof_oracle(ref, rng):
    from nemo_tpu.priors import gmof
    import torch_twin

    res = (40.0 * rng.randn(16, 25, 2)).astype(np.float32)
    mod = ref.misc_utils.GMoF(rho=100)
    for sqrt in (False, True):
        want = mod(_t(res), sqrt)
        ours = gmof(jnp.asarray(res), rho=100.0, sqrt=sqrt)
        _close(ours, want, atol=1e-3, rtol=1e-6, what=f"GMoF sqrt={sqrt}")
        twin = torch_twin.gmof(_t(res), rho=100.0, sqrt=sqrt)
        assert torch.allclose(twin, want, atol=0.0, rtol=1e-6), \
            f"torch twin gmof vs reference (sqrt={sqrt})"


# ---------------------------------------------------------------------------
# GMM max-mixture prior (hmr/smplify/prior.py:102-196)
# ---------------------------------------------------------------------------

def test_gmm_prior_oracle(ref, rng, tmp_path):
    from nemo_tpu.priors import gmm_log_likelihood, load_gmm_prior

    M, D = 8, 69
    means = 0.3 * rng.randn(M, D)
    A = 0.05 * rng.randn(M, D, D)
    covs = np.einsum("mij,mkj->mik", A, A) + 0.4 * np.eye(D)
    weights = rng.dirichlet(np.ones(M))
    pkl = tmp_path / "gmm_08.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"means": means, "covars": covs, "weights": weights}, f)

    oracle = ref.prior.MaxMixturePrior(prior_folder=str(tmp_path),
                                       num_gaussians=M, use_merged=True)
    prior = load_gmm_prior(str(pkl))

    pose = (0.4 * rng.randn(32, D)).astype(np.float32)
    betas = np.zeros((32, 10), np.float32)
    want = oracle.merged_log_likelihood(_t(pose), _t(betas))
    ours = gmm_log_likelihood(prior, jnp.asarray(pose))
    _close(ours, want, atol=1e-3, rtol=1e-5,
           what="repo GMM NLL vs reference MaxMixturePrior")


# ---------------------------------------------------------------------------
# pose_utils (nemo/utils/pose_utils.py:30-159)
# ---------------------------------------------------------------------------

class TestPoseUtilsOracles:
    def test_rigid_transform_3d(self, ref, rng):
        from nemo_tpu.geometry import rigid_transform_np

        A = rng.randn(15, 3)
        R_true, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(R_true) < 0:
            R_true[:, 0] *= -1
        B = A @ R_true.T + rng.randn(3)
        want_R, want_t = ref.pose_utils.rigid_transform_3D(
            A.T, B.T, suppress_message=True)
        R, t = rigid_transform_np(A, B)
        _close(R, want_R, atol=1e-9, what="rigid_transform R")
        _close(t, np.asarray(want_t).ravel(), atol=1e-9,
               what="rigid_transform t")

    def test_rigid_transform_3d_reflection_branch(self, ref, rng):
        from nemo_tpu.geometry import rigid_transform_np

        # planar points make reflection solutions competitive; force the
        # det<0 correction path on both sides
        A = rng.randn(10, 3)
        A[:, 2] = 0.0
        B = -A + 0.01 * rng.randn(10, 3)
        want_R, want_t = ref.pose_utils.rigid_transform_3D(
            A.T, B.T, suppress_message=True)
        R, t = rigid_transform_np(A, B)
        _close(R, want_R, atol=1e-9)
        _close(t, np.asarray(want_t).ravel(), atol=1e-9)

    def test_compute_similarity_transform(self, ref, rng):
        from nemo_tpu.geometry import similarity_transform, \
            similarity_transform_np

        S1 = rng.randn(15, 3)
        S2 = 1.7 * S1 @ np.linalg.qr(rng.randn(3, 3))[0] + rng.randn(3) \
            + 0.05 * rng.randn(15, 3)
        want = ref.pose_utils.compute_similarity_transform(S1.copy(),
                                                           S2.copy())
        ours_np, _ = similarity_transform_np(S1, S2)
        _close(ours_np, want, atol=1e-9, what="similarity_transform_np")
        ours_jax, _ = similarity_transform(jnp.asarray(S1, dtype=jnp.float32),
                                           jnp.asarray(S2, dtype=jnp.float32))
        _close(ours_jax, want, atol=1e-4, what="similarity_transform (jax)")

    def test_reconstruction_error(self, ref, rng):
        from nemo_tpu.geometry import reconstruction_error, \
            reconstruction_error_np

        S1 = rng.randn(6, 15, 3)
        S2 = S1 + 0.1 * rng.randn(6, 15, 3)
        for pa in (False, True):
            want = ref.pose_utils.reconstruction_error(S1.copy(), S2.copy(),
                                                       pa=pa)
            _close(reconstruction_error_np(S1, S2, pa=pa), want, atol=1e-9,
                   what=f"reconstruction_error_np pa={pa}")
            ours = reconstruction_error(jnp.asarray(S1, dtype=jnp.float32),
                                        jnp.asarray(S2, dtype=jnp.float32),
                                        pa=pa)
            _close(ours, want, atol=1e-5,
                   what=f"reconstruction_error (jax) pa={pa}")


# ---------------------------------------------------------------------------
# LBS (human_body_prior/body_model/lbs.py:164-260)
# ---------------------------------------------------------------------------

class TestLBSOracle:
    @pytest.fixture(scope="class")
    def smpl(self):
        from nemo_tpu.body import synthetic_smpl_model
        return synthetic_smpl_model(num_vertices=400, seed=0)

    def _ref_args(self, smpl):
        return dict(
            v_template=_t(smpl.v_template),
            shapedirs=_t(smpl.shapedirs),
            posedirs=_t(smpl.posedirs),
            J_regressor=_t(smpl.J_regressor),
            parents=torch.as_tensor(np.asarray(smpl.parents),
                                    dtype=torch.long),
            lbs_weights=_t(smpl.lbs_weights),
        )

    def test_lbs_pose2rot_true(self, ref, rng, smpl):
        from nemo_tpu.body import smpl_forward

        B = 6
        betas = (0.5 * rng.randn(1, 10)).astype(np.float32)
        pose = (0.4 * rng.randn(B, 72)).astype(np.float32)
        pose[0] = 0.0  # rest pose

        want_v, want_j = ref.lbs.lbs(
            _t(np.tile(betas, (B, 1))), _t(pose), pose2rot=True,
            **self._ref_args(smpl))

        verts, _j49, fk_joints = smpl_forward(
            smpl, jnp.asarray(betas), jnp.asarray(pose[:, 3:]),
            jnp.asarray(pose[:, :3]), pose2rot=True, want_vertices=True,
            want_fk_joints=True)
        _close(verts, want_v, atol=2e-5,
               what="repo smpl_forward vertices vs reference lbs")
        _close(fk_joints, want_j, atol=2e-5,
               what="repo FK joints vs reference J_transformed")

    def test_lbs_pose2rot_false_and_twin(self, ref, rng, smpl):
        from nemo_tpu.body import smpl_forward
        from nemo_tpu.geometry import batch_rodrigues
        from torch_twin import TorchSMPL

        B = 6
        betas = (0.5 * rng.randn(1, 10)).astype(np.float32)
        aa = (0.4 * rng.randn(B, 24, 3)).astype(np.float32)
        rotmats = np.asarray(batch_rodrigues(jnp.asarray(aa)))

        want_v, want_j = ref.lbs.lbs(
            _t(np.tile(betas, (B, 1))), _t(rotmats),
            pose2rot=False, **self._ref_args(smpl))

        verts, _j49, fk_joints = smpl_forward(
            smpl, jnp.asarray(betas), jnp.asarray(rotmats[:, 1:]),
            jnp.asarray(rotmats[:, :1]), pose2rot=False, want_vertices=True,
            want_fk_joints=True)
        _close(verts, want_v, atol=2e-5,
               what="repo smpl_forward (rotmat input) vs reference lbs")
        _close(fk_joints, want_j, atol=2e-5)

        twin = TorchSMPL(smpl)
        twin_v, _ = twin.forward(_t(betas), _t(rotmats[:, 1:]),
                                 _t(rotmats[:, :1]))
        assert torch.allclose(twin_v, want_v, atol=1e-6, rtol=0), \
            "torch twin LBS vs reference lbs"

    def test_fused_joints_path_vs_reference(self, ref, rng, smpl):
        """The joints-only fused-table path (smpl.py:302-335) must regress
        the same 24 kinematic joints the reference's full LBS produces."""
        from nemo_tpu.body import smpl_forward

        B = 4
        betas = (0.3 * rng.randn(1, 10)).astype(np.float32)
        pose = (0.5 * rng.randn(B, 72)).astype(np.float32)
        _v, j49_full = smpl_forward(
            smpl, jnp.asarray(betas), jnp.asarray(pose[:, 3:]),
            jnp.asarray(pose[:, :3]), pose2rot=True, want_vertices=True)
        _n, j49_fused = smpl_forward(
            smpl, jnp.asarray(betas), jnp.asarray(pose[:, 3:]),
            jnp.asarray(pose[:, :3]), pose2rot=True, want_vertices=False)
        _close(j49_fused, np.asarray(j49_full), atol=2e-5,
               what="fused joints-only path vs full-vertex path")


# ---------------------------------------------------------------------------
# VIBE motion discriminator (VIBE/lib/models/{attention,motion_discriminator})
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_motion_disc():
    """Load the reference SelfAttention + MotionDiscriminator by file path
    (VIBE/lib has no importable package root here; lib.models.__init__ pulls
    the full model zoo, so the two leaf files are loaded directly with the
    attention module pre-registered under its package name).

    Every sys.modules entry this fixture touches is snapshot and restored at
    teardown: the bare ``lib``/``lib.models`` stubs have no ``__path__``, so
    leaving them installed breaks later ``import lib.smplify.losses`` in
    tests/test_temporal_smplify.py (fast tier was green file-by-file but not
    in one session)."""
    import importlib.util

    touched = ("lib", "lib.models", "lib.models.attention",
               "ref_motion_discriminator")
    saved = {name: sys.modules.get(name) for name in touched}

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    try:
        for pkg in ("lib", "lib.models"):
            if pkg not in sys.modules:
                sys.modules[pkg] = types.ModuleType(pkg)
        att = load("lib.models.attention",
                   REFERENCE_ROOT + "/VIBE/lib/models/attention.py")
        sys.modules["lib.models"].attention = att
        md = load("ref_motion_discriminator",
                  REFERENCE_ROOT + "/VIBE/lib/models/motion_discriminator.py")
        yield types.SimpleNamespace(attention=att, motion_discriminator=md)
    finally:
        for name, old in saved.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old


def _convert_motion_disc(net, num_layers):
    """torch MotionDiscriminator state -> repo param pytree."""
    import jax

    def gru_layer(l):
        sd = net.gru.state_dict()
        return {
            "w_ih": jnp.asarray(sd[f"weight_ih_l{l}"].numpy().T),
            "w_hh": jnp.asarray(sd[f"weight_hh_l{l}"].numpy().T),
            "b_ih": jnp.asarray(sd[f"bias_ih_l{l}"].numpy()),
            "b_hh": jnp.asarray(sd[f"bias_hh_l{l}"].numpy()),
        }

    p = {"gru": gru_layer(0),
         "fc_w": jnp.asarray(net.fc.weight.detach().numpy().T),
         "fc_b": jnp.asarray(net.fc.bias.detach().numpy())}
    if num_layers > 1:
        p["gru_extra"] = tuple(gru_layer(l) for l in range(1, num_layers))
    if hasattr(net, "attention"):
        linears = [m for m in net.attention.attention
                   if isinstance(m, torch.nn.Linear)]
        p["att"] = {"mlp": tuple(
            {"w": jnp.asarray(m.weight.detach().numpy().T),
             "b": jnp.asarray(m.bias.detach().numpy())} for m in linears)}
    return p


class TestMotionDiscriminatorOracle:
    @pytest.mark.parametrize("feature_pool,num_layers,att_layers", [
        ("concat", 1, 0),
        ("attention", 1, 1),
        ("attention", 2, 3),   # the shipped config: NUM_LAYERS 2, ATT 3
    ])
    def test_forward_parity(self, ref_motion_disc, rng, feature_pool,
                            num_layers, att_layers):
        from nemo_tpu.models import motion_discriminator

        torch.manual_seed(0)
        H = 48
        net = ref_motion_disc.motion_discriminator.MotionDiscriminator(
            rnn_size=H, input_size=69, num_layers=num_layers,
            output_size=2, feature_pool=feature_pool,
            attention_size=H, attention_layers=att_layers,
            attention_dropout=0.5)
        net.eval()  # dropout off for the deterministic oracle

        p = _convert_motion_disc(net, num_layers)
        if feature_pool == "attention":
            assert len(p["att"]["mlp"]) == att_layers

        seq = (0.4 * rng.randn(5, 12, 69)).astype(np.float32)
        with torch.no_grad():
            want = net(_t(seq))
        ours = motion_discriminator(p, jnp.asarray(seq))
        _close(ours, want, atol=1e-5,
               what=f"motion_discriminator {feature_pool} x{num_layers}")

    def test_attention_scores_sum_to_one_and_dropout_path(self, rng):
        from nemo_tpu.models import init_self_attention, self_attention
        import jax

        p = init_self_attention(jax.random.PRNGKey(0), 32, layers=2)
        x = jnp.asarray(rng.randn(4, 9, 32).astype(np.float32))
        y, scores = self_attention(p, x)
        np.testing.assert_allclose(np.asarray(scores.sum(-1)), 1.0,
                                   atol=1e-6)
        assert y.shape == (4, 32)
        # train-mode dropout is stochastic but finite and differentiable
        yd, _ = self_attention(p, x, dropout=0.5,
                               rng=jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(yd)).all()
