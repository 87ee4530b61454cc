"""Fused MotionNet MLP kernels: interpret-mode parity + custom-VJP grads
vs the jnp path (modules/networks.py apply_motion_net)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.modules import networks
from nemo_tpu.ops import mlp_pallas


@pytest.fixture()
def setup(rng):
    key = jax.random.PRNGKey(0)
    D, H, J = 19, 72, 24
    p = networks.init_motion_net(key, D, H, J, init_last_layer_zero=False)
    x = jnp.asarray(rng.randn(13, D).astype(np.float32))
    return p, x, J


def _interp(fn, *args, **kw):
    orig = mlp_pallas.pl.pallas_call

    def call(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    with mock.patch.object(mlp_pallas.pl, "pallas_call", call):
        return fn(*args, **kw)


def _jnp_heads(p, x):
    z = jax.nn.relu(networks.apply_fcnn(p["trunk"], x))
    return (networks._dot(z, p["W_rot"]) + p["b_rot"],
            networks._dot(z, p["W_lin"]) + p["b_lin"])


class TestFusedMotionNet:
    def test_forward_matches_jnp(self, setup):
        p, x, J = setup
        want_rot, want_tr = _jnp_heads(p, x)
        rot, tr = _interp(mlp_pallas.motion_net_mlp, p, x, J)
        np.testing.assert_allclose(np.asarray(rot), np.asarray(want_rot),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(tr), np.asarray(want_tr),
                                   atol=1e-5)

    def test_grads_match_jnp(self, setup):
        p, x, J = setup
        crot = jnp.asarray(np.random.RandomState(1).randn(
            x.shape[0], J * 6).astype(np.float32))
        ctr = jnp.asarray(np.random.RandomState(2).randn(
            x.shape[0], 3).astype(np.float32))

        def loss_jnp(p, x):
            r, t = _jnp_heads(p, x)
            return jnp.sum(r * crot) + jnp.sum(t * ctr)

        def loss_fused(p, x):
            r, t = mlp_pallas.motion_net_mlp(p, x, J)
            return jnp.sum(r * crot) + jnp.sum(t * ctr)

        want = jax.grad(loss_jnp, argnums=(0, 1))(p, x)
        got = _interp(jax.grad(loss_fused, argnums=(0, 1)), p, x)
        flat_w, tree_w = jax.tree_util.tree_flatten(want)
        flat_g, tree_g = jax.tree_util.tree_flatten(got)
        assert tree_w == tree_g
        for gw, gg in zip(flat_w, flat_g):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                       atol=2e-4, rtol=1e-4)

    def test_apply_motion_net_fused_path(self, setup, monkeypatch):
        """apply_motion_net with the fused path forced on (interpret)
        agrees with the default path end-to-end (incl. rotmat/aa)."""
        p, x, J = setup
        want = networks.apply_motion_net(p, x, J)
        monkeypatch.setenv("NEMO_TPU_NET_FUSED", "1")
        monkeypatch.setattr(mlp_pallas, "mlp_pallas_available", lambda: True)
        got = _interp(networks.apply_motion_net, p, x, J)
        for w, g in ((want[0], got[0]), (want[1], got[1])):
            for key in ("rot6d", "rotmat", "pose"):
                np.testing.assert_allclose(np.asarray(g[key]),
                                           np.asarray(w[key]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                                   atol=1e-5)

    def test_pad_roundtrip_exact_zero_padding(self, setup):
        """Padded hidden units stay exactly zero through the trunk, so
        the padded head columns contribute nothing."""
        p, x, J = setup
        padded = mlp_pallas.pad_motion_net_params(p, x.shape[1], J)
        H = p["trunk"]["W2"].shape[0]
        assert padded["W2"].shape[0] % 128 == 0
        np.testing.assert_array_equal(
            np.asarray(padded["W2"])[H:], 0.0)
        np.testing.assert_array_equal(
            np.asarray(padded["b3"])[0, H:], 0.0)
