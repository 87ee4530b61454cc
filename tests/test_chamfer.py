"""Chamfer distance op tests (XLA path; the Pallas path shares the VJP)."""

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.ops import chamfer_distance, chamfer_loss, nn_one_way


def brute_force(a, b):
    d = ((a[:, None] - b[None]) ** 2).sum(-1)
    return d.min(1), d.argmin(1)


class TestChamfer:
    def test_matches_brute_force(self, rng):
        a = rng.randn(100, 3).astype(np.float32)
        b = rng.randn(150, 3).astype(np.float32)
        d1, i1 = nn_one_way(jnp.asarray(a), jnp.asarray(b))
        want_d, want_i = brute_force(a, b)
        np.testing.assert_allclose(np.asarray(d1), want_d, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i1), want_i)

    def test_chunking_boundaries(self, rng):
        # sizes around the chunk boundary (1024)
        a = rng.randn(10, 3).astype(np.float32)
        for M in (1023, 1024, 1025, 2048):
            b = rng.randn(M, 3).astype(np.float32)
            d1, i1 = nn_one_way(jnp.asarray(a), jnp.asarray(b))
            want_d, want_i = brute_force(a, b)
            np.testing.assert_allclose(np.asarray(d1), want_d, atol=1e-3)
            np.testing.assert_array_equal(np.asarray(i1), want_i)

    def test_zero_for_identical_sets(self, rng):
        a = rng.randn(64, 3).astype(np.float32)
        d1, d2 = chamfer_distance(jnp.asarray(a), jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-5)

    def test_gradient_matches_finite_difference(self, rng):
        a = rng.randn(12, 3).astype(np.float32)
        b = rng.randn(17, 3).astype(np.float32)

        g = jax.grad(chamfer_loss)(jnp.asarray(a), jnp.asarray(b))
        eps = 1e-3
        for trial in range(5):
            i, j = rng.randint(12), rng.randint(3)
            ap = a.copy()
            ap[i, j] += eps
            am = a.copy()
            am[i, j] -= eps
            fd = (float(chamfer_loss(jnp.asarray(ap), jnp.asarray(b))) -
                  float(chamfer_loss(jnp.asarray(am), jnp.asarray(b)))) / (2 * eps)
            np.testing.assert_allclose(float(g[i, j]), fd, atol=1e-2)

    def test_gradient_pulls_sets_together(self, rng):
        a = jnp.asarray(rng.randn(32, 3).astype(np.float32))
        b = jnp.asarray(rng.randn(32, 3).astype(np.float32) + 5.0)
        loss0 = float(chamfer_loss(a, b))
        g = jax.grad(chamfer_loss)(a, b)
        a2 = a - 0.1 * g
        assert float(chamfer_loss(a2, b)) < loss0
