"""Fused FK op tests: chain parity, Pallas interpret mode, custom VJP."""

import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sRot

from nemo_tpu.body.constants import SMPL_PARENTS
from nemo_tpu.ops import fk_pallas


@pytest.fixture
def inputs(rng):
    B, J = 4, 24
    aa = 0.4 * rng.randn(B, J, 3).astype(np.float32)
    R = sRot.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
        B, J, 3, 3).astype(np.float32)
    t = rng.randn(B, J, 3).astype(np.float32)
    return jnp.asarray(R), jnp.asarray(t), tuple(int(p) for p in SMPL_PARENTS)


def naive_chain(R_l, t_l, parents):
    """Pure-numpy sequential reference."""
    R_l, t_l = np.asarray(R_l, np.float64), np.asarray(t_l, np.float64)
    B, J = R_l.shape[:2]
    Rg = np.zeros_like(R_l)
    tg = np.zeros_like(t_l)
    Rg[:, 0], tg[:, 0] = R_l[:, 0], t_l[:, 0]
    for j in range(1, J):
        p = parents[j]
        Rg[:, j] = Rg[:, p] @ R_l[:, j]
        tg[:, j] = np.einsum('bik,bk->bi', Rg[:, p], t_l[:, j]) + tg[:, p]
    return Rg, tg


class TestFkCompose:
    def test_xla_matches_naive(self, inputs):
        R_l, t_l, parents = inputs
        Rg, tg = fk_pallas._fk_xla(R_l, t_l, parents)
        wR, wt = naive_chain(R_l, t_l, parents)
        np.testing.assert_allclose(np.asarray(Rg), wR, atol=2e-5)
        np.testing.assert_allclose(np.asarray(tg), wt, atol=2e-5)

    def test_pallas_interpret_matches_xla(self, inputs):
        R_l, t_l, parents = inputs
        want = fk_pallas._fk_xla(R_l, t_l, parents)

        orig = fk_pallas.pl.pallas_call

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        with mock.patch.object(fk_pallas.pl, "pallas_call", interp):
            got = fk_pallas._fk_fwd_pallas(R_l, t_l, parents, tb=8)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   atol=1e-5)

    @pytest.mark.slow
    def test_pallas_interpret_bwd_matches_xla(self, inputs):
        """Backward-kernel interpret-mode parity (slow tier: interpret-mode
        emulation of the bwd program costs ~1 min on the 1-core box)."""
        R_l, t_l, parents = inputs
        want = fk_pallas._fk_xla(R_l, t_l, parents)

        orig = fk_pallas.pl.pallas_call

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        g = (jax.random.normal(jax.random.PRNGKey(0), want[0].shape),
             jax.random.normal(jax.random.PRNGKey(1), want[1].shape))
        want_g = fk_pallas._bwd_xla(R_l, t_l, want[0], g[0], g[1], parents)
        with mock.patch.object(fk_pallas.pl, "pallas_call", interp):
            got_g = fk_pallas._fk_bwd_pallas(R_l, t_l, want[0], g[0], g[1],
                                             parents, tb=8)
        np.testing.assert_allclose(np.asarray(got_g[0]),
                                   np.asarray(want_g[0]), atol=2e-4,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got_g[1]),
                                   np.asarray(want_g[1]), atol=2e-4,
                                   rtol=1e-4)

    def test_custom_vjp_matches_autodiff(self, inputs):
        R_l, t_l, parents = inputs

        def loss_custom(R_l, t_l):
            Rg, tg = fk_pallas.fk_compose(R_l, t_l, parents)
            return jnp.sum(jnp.sin(Rg)) + jnp.sum(jnp.cos(tg))

        def loss_ref(R_l, t_l):
            Rg, tg = fk_pallas._fk_xla(R_l, t_l, parents)
            return jnp.sum(jnp.sin(Rg)) + jnp.sum(jnp.cos(tg))

        g_c = jax.grad(loss_custom, argnums=(0, 1))(R_l, t_l)
        g_r = jax.grad(loss_ref, argnums=(0, 1))(R_l, t_l)
        np.testing.assert_allclose(np.asarray(g_c[0]), np.asarray(g_r[0]),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g_c[1]), np.asarray(g_r[1]),
                                   atol=1e-4, rtol=1e-4)

    def test_smpl_paths_still_match(self, rng):
        """smpl_forward + smpl_verts_t agree after routing FK through the op."""
        from nemo_tpu.body import smpl_forward, synthetic_smpl_model
        from nemo_tpu.body.smpl import smpl_verts_t
        model = synthetic_smpl_model(num_vertices=300, seed=0)
        aa = 0.3 * rng.randn(2, 24, 3).astype(np.float32)
        rot = jnp.asarray(sRot.from_rotvec(aa.reshape(-1, 3)).as_matrix()
                          .reshape(2, 24, 3, 3).astype(np.float32))
        betas = jnp.zeros((1, 10))
        verts, j49 = smpl_forward(model, betas, rot[:, 1:], rot[:, :1],
                                  want_vertices=True)
        _, j49_fast = smpl_forward(model, betas, rot[:, 1:], rot[:, :1],
                                   want_vertices=False)
        verts_t = smpl_verts_t(model, betas, rot[:, 1:], rot[:, :1])
        np.testing.assert_allclose(np.asarray(j49_fast), np.asarray(j49),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(verts_t),
                                   np.asarray(verts).transpose(0, 2, 1),
                                   atol=2e-5)
