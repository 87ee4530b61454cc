"""Pallas tile-parallel rasterizer vs the XLA rasterizers.

All Pallas runs use interpret mode (CPU test box); the TPU-compiled path
is exercised by scripts/bench_raster.py on hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.ops.raster_pallas import rasterize_triangles_pallas
from nemo_tpu.render.mesh import (rasterize_triangles,
                                  rasterize_triangles_binned)


def random_mesh(rng, F=120):
    """Small triangles around random centres (test_render.py fixture)."""
    centers = np.stack([rng.uniform(-0.8, 0.8, F),
                        rng.uniform(-0.8, 0.8, F),
                        rng.uniform(3, 5, F)], 1)
    offs = rng.uniform(-0.12, 0.12, size=(F, 3, 3))
    verts = (centers[:, None] + offs).reshape(-1, 3).astype(np.float32)
    faces = np.arange(3 * F).reshape(F, 3)
    return jnp.asarray(verts), faces


@pytest.mark.parametrize("stream", [False, True])
def test_pallas_matches_binned(rng, stream):
    """With identical square tiles the face tables and fold order match
    rasterize_triangles_binned exactly; values agree to float ulps (the
    expressions are op-for-op identical but the compiler contracts
    multiply-adds differently in the two program contexts — measured
    ~2.5e-7 max relative, same effect as the fused-VJP kernel's gvsh)."""
    verts, faces = random_mesh(rng)
    hw = (96, 128)
    args = (verts, faces, 100.0, (64.0, 48.0), hw)
    z1, f1, b1 = rasterize_triangles_binned(*args, tile=32,
                                            faces_per_tile=512, chunk=64)
    z2, f2, b2 = rasterize_triangles_pallas(*args, th=32, tw=32,
                                            faces_per_tile=512,
                                            interpret=True, stream=stream)
    z1, z2 = np.asarray(z1), np.asarray(z2)
    cov = np.isfinite(z1)
    np.testing.assert_array_equal(cov, np.isfinite(z2))
    np.testing.assert_allclose(z1[cov], z2[cov], rtol=1e-6)
    same = np.asarray(f1) == np.asarray(f2)
    assert same[cov].mean() > 0.999          # ulp-level depth ties only
    np.testing.assert_allclose(np.asarray(b1)[same], np.asarray(b2)[same],
                               atol=1e-5)


@pytest.mark.parametrize("stream", [False, True])
def test_pallas_lane_tiles_match_scan(rng, stream):
    """At the TPU-native (32, 128) tile shape the candidate sets per pixel
    still cover every face, so winners match the scan rasterizer up to
    depth ties (same tolerance contract as the binned-vs-scan test)."""
    verts, faces = random_mesh(rng)
    hw = (96, 128)
    args = (verts, faces, 100.0, (64.0, 48.0), hw)
    z1, f1, b1 = rasterize_triangles(*args, patch=96)
    z2, f2, b2 = rasterize_triangles_pallas(*args, th=32, tw=128,
                                            faces_per_tile=512,
                                            interpret=True, stream=stream)
    z1, z2 = np.asarray(z1), np.asarray(z2)
    cov1, cov2 = np.isfinite(z1), np.isfinite(z2)
    np.testing.assert_array_equal(cov1, cov2)
    np.testing.assert_allclose(z1[cov1], z2[cov2], rtol=1e-5)
    same = np.asarray(f1) == np.asarray(f2)
    assert same[cov1].mean() > 0.99
    np.testing.assert_allclose(np.asarray(b1)[same & cov1],
                               np.asarray(b2)[same & cov1], atol=1e-4)


@pytest.mark.parametrize("stream", [False, True])
def test_pallas_empty_and_behind(rng, stream):
    """Faces behind the near plane are excluded in binning; tiles with
    zero entries run zero fold iterations and keep their init values."""
    verts = np.array([[0, 0, -1.0], [1, 0, -1.0], [0, 1, -1.0]],
                     np.float32)
    z, f, b = rasterize_triangles_pallas(
        jnp.asarray(verts), np.array([[0, 1, 2]]), 100.0, (32.0, 32.0),
        (64, 64), th=32, tw=32, faces_per_tile=8, interpret=True, stream=stream)
    assert not np.isfinite(np.asarray(z)).any()
    assert (np.asarray(f) == -1).all()
    assert (np.asarray(b) == 0).all()


@pytest.mark.parametrize("stream", [False, True])
def test_pallas_count_bounded_fold(rng, stream):
    """A mesh confined to one tile: every other tile's count is 0, so the
    dynamic loop bound must leave their buffers untouched while the busy
    tile still rasterizes correctly (vs the scan oracle)."""
    F = 40
    centers = np.stack([rng.uniform(-0.05, 0.05, F),
                        rng.uniform(-0.05, 0.05, F),
                        rng.uniform(3, 5, F)], 1)
    offs = rng.uniform(-0.03, 0.03, size=(F, 3, 3))
    verts = jnp.asarray((centers[:, None] + offs).reshape(-1, 3)
                        .astype(np.float32))
    faces = np.arange(3 * F).reshape(F, 3)
    hw = (128, 256)
    # principal point in tile (1, 0): everything lands near (32, 48)
    args = (verts, faces, 100.0, (32.0, 48.0), hw)
    z1, f1, _ = rasterize_triangles(*args, patch=64)
    z2, f2, _ = rasterize_triangles_pallas(*args, th=32, tw=128,
                                           faces_per_tile=256,
                                           interpret=True, stream=stream)
    z1, z2 = np.asarray(z1), np.asarray(z2)
    cov = np.isfinite(z1)
    assert cov.any()
    np.testing.assert_array_equal(cov, np.isfinite(z2))
    np.testing.assert_allclose(z1[cov], z2[cov], rtol=1e-5)
    # untouched region: strictly empty
    assert (np.asarray(f2)[~cov] == -1).all()


@pytest.mark.parametrize("stream", [False, True])
def test_pallas_tiny_mesh(rng, stream):
    """Meshes smaller than one face group exercise the GROUP capacity
    floor: K clamps to 8 with 2 live entries, rest masked by count."""
    verts = np.array([[0, 0, 4.0], [0.5, 0, 4.0], [0, 0.5, 4.0],
                      [-0.5, 0, 5.0], [0, -0.5, 5.0], [-0.5, -0.5, 5.0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    args = (jnp.asarray(verts), faces, 100.0, (32.0, 32.0), (64, 64))
    z1, f1, _ = rasterize_triangles(*args, patch=64)
    z2, f2, _ = rasterize_triangles_pallas(*args, th=32, tw=32,
                                           interpret=True, stream=stream)
    z1, z2 = np.asarray(z1), np.asarray(z2)
    cov = np.isfinite(z1)
    assert cov.any() and set(np.unique(np.asarray(f1)[cov])) == {0, 1}
    np.testing.assert_array_equal(cov, np.isfinite(z2))
    np.testing.assert_allclose(z1[cov], z2[cov], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(f1)[cov], np.asarray(f2)[cov])
