"""Fused skinning op tests: XLA-path parity vs smpl_forward, Pallas
interpret-mode parity, and custom-VJP gradients vs autodiff."""

import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sRot

from nemo_tpu.body import synthetic_smpl_model, smpl_forward
from nemo_tpu.body.smpl import (NUM_JOINTS, batch_rigid_transform, fk_rt,
                                smpl_verts_t)
from nemo_tpu.ops import lbs_pallas


@pytest.fixture(scope="module")
def model():
    return synthetic_smpl_model(num_vertices=640, seed=0)


def make_inputs(model, B, rng):
    aa = 0.3 * rng.randn(B, 24, 3).astype(np.float32)
    rot = sRot.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
        B, 24, 3, 3).astype(np.float32)
    betas = jnp.asarray(0.3 * rng.randn(1, 10).astype(np.float32))
    return jnp.asarray(rot), betas


def raw_op_inputs(model, rot, betas):
    """(pf, A34, vsh_t) exactly as smpl_verts_t builds them."""
    B = rot.shape[0]
    ident = jnp.eye(3)
    pf = (rot[:, 1:] - ident).reshape(B, 207)
    v_shaped = model.v_template + jnp.einsum(
        'bl,mkl->bmk', betas, model.shapedirs)
    J = jnp.einsum('jv,bvk->bjk', model.J_regressor, v_shaped)
    R_g, _, t_rel = fk_rt(rot, J, model.parents)
    A34 = jnp.concatenate([R_g, t_rel[..., None]], -1).reshape(
        B, NUM_JOINTS, 12)
    return pf, A34, v_shaped[0].T


class TestFkRt:
    def test_matches_4x4_form(self, model, rng):
        rot, betas = make_inputs(model, 3, rng)
        v_shaped = model.v_template + jnp.einsum(
            'bl,mkl->bmk', betas, model.shapedirs)
        J = jnp.einsum('jv,bvk->bjk', model.J_regressor, v_shaped)
        posed_44, A = batch_rigid_transform(rot, J, model.parents)
        R_g, posed_rt, t_rel = fk_rt(rot, J, model.parents)
        np.testing.assert_allclose(np.asarray(posed_rt),
                                   np.asarray(posed_44), atol=2e-5)
        np.testing.assert_allclose(np.asarray(R_g),
                                   np.asarray(A[:, :, :3, :3]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(t_rel),
                                   np.asarray(A[:, :, :3, 3]), atol=2e-5)


class TestSkinVertsT:
    def test_matches_smpl_forward(self, model, rng):
        rot, betas = make_inputs(model, 3, rng)
        verts, _ = smpl_forward(model, betas, rot[:, 1:], rot[:, :1],
                                want_vertices=True)
        verts_t = smpl_verts_t(model, betas, rot[:, 1:], rot[:, :1])
        np.testing.assert_allclose(np.asarray(verts_t),
                                   np.asarray(verts).transpose(0, 2, 1),
                                   atol=2e-5)

    def test_pallas_interpret_matches_xla(self, model, rng):
        """Run the actual Pallas kernels in interpreter mode on CPU."""
        rot, betas = make_inputs(model, 2, rng)
        pf, A34, vsh_t = raw_op_inputs(model, rot, betas)
        pd_tiles, w_tiles, V = lbs_pallas.tile_tables(
            model.posedirs_t, model.lbs_weights_t, tv=128)
        pd_tiles, w_tiles = jnp.asarray(pd_tiles), jnp.asarray(w_tiles)

        pd, w = lbs_pallas._untile(pd_tiles, w_tiles, V)
        want = lbs_pallas._skin_verts_t_xla(pf, A34, vsh_t, pd, w)

        orig_call = lbs_pallas.pl.pallas_call

        def interp_call(*a, **k):
            k["interpret"] = True
            return orig_call(*a, **k)

        with mock.patch.object(lbs_pallas.pl, "pallas_call", interp_call):
            got = lbs_pallas._fwd_pallas(pf, A34, vsh_t, pd_tiles, w_tiles,
                                         V, tb=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)

        g = jax.random.normal(jax.random.PRNGKey(0), want.shape)
        want_grads = lbs_pallas._bwd_xla(pf, A34, vsh_t, pd, w, g)
        with mock.patch.object(lbs_pallas.pl, "pallas_call", interp_call):
            got_grads = lbs_pallas._bwd_pallas(pf, A34, vsh_t, pd_tiles,
                                               w_tiles, V, g, tb=8)
        for gw, gg, name in zip(want_grads, got_grads,
                                ("gpf", "gA34", "gvsh")):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                       atol=3e-3, rtol=1e-3, err_msg=name)

    def test_bf16_tables_parity(self, model, rng):
        """Opt-in bf16 tables: interpreter-mode Pallas fwd/bwd stay within
        bf16 tolerance of the f32 XLA reference, and the XLA fallback
        accepts bf16 tables (mixed-dtype einsum upcast)."""
        rot, betas = make_inputs(model, 2, rng)
        pf, A34, vsh_t = raw_op_inputs(model, rot, betas)
        pd16, w16, V = lbs_pallas.tile_tables(
            model.posedirs_t, model.lbs_weights_t, tv=128,
            dtype=jnp.bfloat16)
        pd, w = lbs_pallas._untile(jnp.asarray(model.pd_tiles),
                                   jnp.asarray(model.w_tiles), V)
        want = lbs_pallas._skin_verts_t_xla(pf, A34, vsh_t, pd, w)
        scale = float(jnp.abs(want).max())

        orig_call = lbs_pallas.pl.pallas_call

        def interp_call(*a, **k):
            k["interpret"] = True
            return orig_call(*a, **k)

        with mock.patch.object(lbs_pallas.pl, "pallas_call", interp_call):
            got = lbs_pallas._fwd_pallas(pf, A34, vsh_t, pd16, w16, V, tb=8)
        assert got.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(want) / scale, atol=2e-2)

        g = jax.random.normal(jax.random.PRNGKey(0), want.shape)
        want_g = lbs_pallas._bwd_xla(pf, A34, vsh_t, pd, w, g)
        with mock.patch.object(lbs_pallas.pl, "pallas_call", interp_call):
            got_g = lbs_pallas._bwd_pallas(pf, A34, vsh_t, pd16, w16, V, g,
                                           tb=8)
        for gw, gg, name in zip(want_g, got_g, ("gpf", "gA34", "gvsh")):
            s = float(np.abs(np.asarray(gw)).max()) or 1.0
            np.testing.assert_allclose(np.asarray(gg) / s,
                                       np.asarray(gw) / s, atol=3e-2,
                                       err_msg=name)

        # XLA fallback path with bf16 tables (CPU: _use_pallas() False)
        out16 = lbs_pallas.skin_verts_t(V, pf, A34, vsh_t, pd16, w16)
        assert out16.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out16) / scale,
                                   np.asarray(want) / scale, atol=2e-2)

    def test_custom_vjp_matches_autodiff(self, model, rng):
        """Gradients through the custom VJP must match plain autodiff of the
        XLA reference implementation."""
        rot, betas = make_inputs(model, 2, rng)
        pf, A34, vsh_t = raw_op_inputs(model, rot, betas)
        V = model.num_vertices
        pd, w = lbs_pallas._untile(model.pd_tiles, model.w_tiles, V)

        def loss_custom(pf, A34, vsh_t):
            out = lbs_pallas.skin_verts_t(V, pf, A34, vsh_t, model.pd_tiles,
                                          model.w_tiles)
            return jnp.sum(jnp.sin(out))

        def loss_ref(pf, A34, vsh_t):
            out = lbs_pallas._skin_verts_t_xla(pf, A34, vsh_t, pd, w)
            return jnp.sum(jnp.sin(out))

        g_c = jax.grad(loss_custom, argnums=(0, 1, 2))(pf, A34, vsh_t)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(pf, A34, vsh_t)
        for a, b, name in zip(g_c, g_r, ("pf", "A34", "vsh")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3, err_msg=name)

    def test_padded_variant_matches_sliced(self, model, rng):
        """skin_verts_t_padded == skin_verts_t on real lanes, zero pads,
        identical gradients for a reduction loss."""
        rot, betas = make_inputs(model, 2, rng)
        pf, A34, vsh_t = raw_op_inputs(model, rot, betas)
        V = model.num_vertices
        Vp = model.pd_tiles.shape[0] * model.pd_tiles.shape[-1]

        out = lbs_pallas.skin_verts_t(V, pf, A34, vsh_t, model.pd_tiles,
                                      model.w_tiles)
        out_p = lbs_pallas.skin_verts_t_padded(V, pf, A34, vsh_t,
                                               model.pd_tiles, model.w_tiles)
        assert out_p.shape == (2, 3, Vp)
        np.testing.assert_allclose(np.asarray(out_p[..., :V]),
                                   np.asarray(out), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out_p[..., V:]), 0.0)

        def loss_sliced(pf, A34, vsh_t):
            o = lbs_pallas.skin_verts_t(V, pf, A34, vsh_t, model.pd_tiles,
                                        model.w_tiles)
            return jnp.abs(o).sum()

        def loss_padded(pf, A34, vsh_t):
            o = lbs_pallas.skin_verts_t_padded(V, pf, A34, vsh_t,
                                               model.pd_tiles, model.w_tiles)
            return jnp.abs(o).sum()

        g_s = jax.grad(loss_sliced, argnums=(0, 1, 2))(pf, A34, vsh_t)
        g_p = jax.grad(loss_padded, argnums=(0, 1, 2))(pf, A34, vsh_t)
        for a, b, name in zip(g_p, g_s, ("pf", "A34", "vsh")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4, err_msg=name)

    def test_fit_loss_with_vposer_still_finite(self, model, rng):
        """End-to-end: the vposer path now routes through smpl_verts_t."""
        from nemo_tpu.data import synthetic_problem
        from nemo_tpu.fit import NemoConfig, build_assets, fit_loss, init_params
        from nemo_tpu.priors import init_vposer, synthetic_gmm_prior

        bundle, _ = synthetic_problem(model, num_views=2, num_frames=6)
        cfg = NemoConfig(model_version=2, h_dim=16, instance_code_size=2,
                         phase_rbf_dim=8, monotonic_network_n_nodes=4,
                         batch_size=8, weight_vp_loss=10.0,
                         weight_vp_z_loss=1.0, weight_gmm_loss=1.0,
                         label_type="gt")
        assets = build_assets(bundle, model, cfg,
                              gmm=synthetic_gmm_prior(2),
                              vposer=init_vposer(jax.random.PRNGKey(0)))
        params = init_params(jax.random.PRNGKey(1), cfg, 2, assets.img_d0)
        vi = jnp.zeros(8, jnp.int32)
        fi = jnp.arange(8, dtype=jnp.int32) % 6
        (loss, metrics), grads = jax.value_and_grad(
            fit_loss, has_aux=True)(params, cfg, assets, vi, fi,
                                    training=False)
        assert np.isfinite(float(loss))
        assert float(metrics["vp_recon_loss"]) > 0
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


class TestFusedV2V:
    def test_matches_unfused_and_grads(self, model, rng):
        """skin_v2v_l1 == sum|skin(r) - skin(o)| (value + grads vs autodiff
        of the unfused expression with the rec side stop-gradient'd)."""
        rot, betas = make_inputs(model, 2, rng)
        rot_r, _ = make_inputs(model, 2, np.random.RandomState(9))
        pf_o, A_o, vsh_t = raw_op_inputs(model, rot, betas)
        pf_r, A_r, _ = raw_op_inputs(model, rot_r, betas)
        V = model.num_vertices
        pd, w = lbs_pallas._untile(model.pd_tiles, model.w_tiles, V)

        def fused(pf_o, A_o, vsh_t):
            return lbs_pallas.skin_v2v_l1(V, pf_o, A_o, vsh_t,
                                          model.pd_tiles, model.w_tiles,
                                          pf_r, A_r)

        def unfused(pf_o, A_o, vsh_t):
            o = lbs_pallas._skin_verts_t_xla(pf_o, A_o, vsh_t, pd, w)
            r = lbs_pallas._skin_verts_t_xla(pf_r, A_r, vsh_t, pd, w)
            return jnp.abs(jax.lax.stop_gradient(r) - o).sum()

        np.testing.assert_allclose(float(fused(pf_o, A_o, vsh_t)),
                                   float(unfused(pf_o, A_o, vsh_t)),
                                   rtol=1e-5)
        g_f = jax.grad(fused, argnums=(0, 1, 2))(pf_o, A_o, vsh_t)
        g_u = jax.grad(unfused, argnums=(0, 1, 2))(pf_o, A_o, vsh_t)
        for a, b, name in zip(g_f, g_u, ("pf", "A34", "vsh")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3, err_msg=name)
        # rec side is a constant
        gr = jax.grad(lambda p: lbs_pallas.skin_v2v_l1(
            V, pf_o, A_o, vsh_t, model.pd_tiles, model.w_tiles, p, A_r))(
            pf_r)
        assert float(jnp.abs(gr).max()) == 0.0

    def test_pallas_interpret_matches_xla(self, model, rng):
        """The fused fwd kernel in interpreter mode: same sum and sign."""
        rot, betas = make_inputs(model, 2, rng)
        rot_r, _ = make_inputs(model, 2, np.random.RandomState(3))
        pf_o, A_o, vsh_t = raw_op_inputs(model, rot, betas)
        pf_r, A_r, _ = raw_op_inputs(model, rot_r, betas)
        pd_tiles, w_tiles, V = lbs_pallas.tile_tables(
            model.posedirs_t, model.lbs_weights_t, tv=128)
        pd_tiles, w_tiles = jnp.asarray(pd_tiles), jnp.asarray(w_tiles)
        pd, w = lbs_pallas._untile(pd_tiles, w_tiles, V)
        o = lbs_pallas._skin_verts_t_xla(pf_o, A_o, vsh_t, pd, w)
        r = lbs_pallas._skin_verts_t_xla(pf_r, A_r, vsh_t, pd, w)
        want_total = float(jnp.abs(r - o).sum())
        want_sign = np.sign(np.asarray(r - o))

        orig_call = lbs_pallas.pl.pallas_call

        def interp_call(*a, **k):
            k["interpret"] = True
            return orig_call(*a, **k)

        with mock.patch.object(lbs_pallas.pl, "pallas_call", interp_call):
            total, sign, _ = lbs_pallas._v2v_fwd_pallas(
                pf_o, A_o, pf_r, A_r, vsh_t, pd_tiles, w_tiles, V, tb=8)
        np.testing.assert_allclose(float(total), want_total, rtol=1e-5)
        got_sign = np.asarray(sign[:, :, :V], np.float32)
        assert (got_sign == want_sign).mean() > 0.999  # fp ties only

    @pytest.mark.parametrize("table_dtype", [jnp.float32, jnp.bfloat16])
    def test_vp_residual_bwd_bit_exact(self, model, rng, table_dtype):
        """NEMO_TPU_SKIN_VP_RES: the stored-vp backward is BIT-IDENTICAL to
        the recompute backward for sign cotangents (vp is stored in the
        table dtype, and the cast commutes with the +-1 flip), and the
        vp-emitting forward leaves total/sign unchanged."""
        rot, betas = make_inputs(model, 2, rng)
        rot_r, _ = make_inputs(model, 2, np.random.RandomState(3))
        pf_o, A_o, vsh_t = raw_op_inputs(model, rot, betas)
        pf_r, A_r, _ = raw_op_inputs(model, rot_r, betas)
        pd_tiles, w_tiles, V = lbs_pallas.tile_tables(
            model.posedirs_t, model.lbs_weights_t, tv=128,
            dtype=table_dtype)
        pd_tiles, w_tiles = jnp.asarray(pd_tiles), jnp.asarray(w_tiles)

        orig_call = lbs_pallas.pl.pallas_call

        def interp_call(*a, **k):
            k["interpret"] = True
            return orig_call(*a, **k)

        with mock.patch.object(lbs_pallas.pl, "pallas_call", interp_call):
            t0, s0, none = lbs_pallas._v2v_fwd_pallas(
                pf_o, A_o, pf_r, A_r, vsh_t, pd_tiles, w_tiles, V, tb=8)
            t1, s1, vp = lbs_pallas._v2v_fwd_pallas(
                pf_o, A_o, pf_r, A_r, vsh_t, pd_tiles, w_tiles, V, tb=8,
                want_vp=True)
        assert none is None
        assert vp.dtype == table_dtype
        assert float(t0) == float(t1)
        assert np.array_equal(np.asarray(s0), np.asarray(s1))

        with mock.patch.object(lbs_pallas.pl, "pallas_call", interp_call):
            g_rec = lbs_pallas._bwd_pallas(pf_o, A_o, vsh_t, pd_tiles,
                                           w_tiles, V, s0, tb=8)
            g_vp = lbs_pallas._bwd_pallas(pf_o, A_o, vsh_t, pd_tiles,
                                          w_tiles, V, s0, tb=8, vp=vp)
        for a, b, name in zip(g_rec, g_vp, ("gpf", "gA34", "gvsh")):
            assert np.array_equal(np.asarray(a), np.asarray(b)), name

    @pytest.mark.parametrize("table_dtype", [jnp.float32, jnp.bfloat16])
    def test_fused_vjp_bit_exact(self, model, rng, table_dtype):
        """NEMO_TPU_SKIN_FUSED_VJP: the one-pass fwd+bwd kernel produces
        BIT-IDENTICAL gpf/gA gradients to the fwd-kernel + sign +
        bwd-kernel pair (same dot shapes and accumulation orders) and the
        same loss; gvsh (the v_shaped/betas chain) is allowed a tiny
        scale-relative slack because the compiler fuses its multiply-adds
        differently in the two program contexts (measured: ~5e-7 absolute
        on O(1) values, i.e. last-bits of the batch reduction)."""
        rot, betas = make_inputs(model, 2, rng)
        rot_r, _ = make_inputs(model, 2, np.random.RandomState(3))
        pf_o, A_o, vsh_t = raw_op_inputs(model, rot, betas)
        pf_r, A_r, _ = raw_op_inputs(model, rot_r, betas)
        pd_tiles, w_tiles, V = lbs_pallas.tile_tables(
            model.posedirs_t, model.lbs_weights_t, tv=128,
            dtype=table_dtype)
        pd_tiles, w_tiles = jnp.asarray(pd_tiles), jnp.asarray(w_tiles)

        orig_call = lbs_pallas.pl.pallas_call

        def interp_call(*a, **k):
            k["interpret"] = True
            return orig_call(*a, **k)

        with mock.patch.object(lbs_pallas.pl, "pallas_call", interp_call):
            t0, s0, _ = lbs_pallas._v2v_fwd_pallas(
                pf_o, A_o, pf_r, A_r, vsh_t, pd_tiles, w_tiles, V, tb=8)
            g_pair = lbs_pallas._bwd_pallas(pf_o, A_o, vsh_t, pd_tiles,
                                            w_tiles, V, s0, tb=8)
            t1, *g_fused = lbs_pallas._v2v_fwdbwd_pallas(
                pf_o, A_o, pf_r, A_r, vsh_t, pd_tiles, w_tiles, V, tb=8)
        np.testing.assert_allclose(float(t1), float(t0), rtol=1e-6)
        for a, b, name in zip(g_pair[:2], g_fused[:2], ("gpf", "gA34")):
            assert np.array_equal(np.asarray(a), np.asarray(b)), name
        gv_a, gv_b = np.asarray(g_pair[2]), np.asarray(g_fused[2])
        np.testing.assert_allclose(gv_a, gv_b, rtol=1e-6,
                                   atol=1e-6 * np.abs(gv_a).max())
