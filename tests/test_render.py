"""Rendering tests: mesh splat renderer and keypoint overlays."""

import numpy as np
import jax.numpy as jnp
import pytest

from nemo_tpu.body import synthetic_smpl_model
from nemo_tpu.geometry import Camera
from nemo_tpu.render import (render_mesh_overlay, splat_render,
                             vertex_normals)


class TestSplatRender:
    def test_single_point_lands_at_center(self):
        verts = jnp.array([[0.0, 0.0, 5.0]])
        colors = jnp.array([[1.0, 0.0, 0.0]])
        img, mask = splat_render(verts, colors, 100.0, (16.0, 16.0),
                                 (32, 32), splat=1)
        assert float(mask[16, 16]) == 1.0
        np.testing.assert_allclose(np.asarray(img[16, 16]), [1, 0, 0])
        assert float(mask.sum()) == 1.0

    def test_zbuffer_keeps_nearest(self):
        # two points project to the same pixel; the closer one must win
        verts = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 2.0]])
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        img, _ = splat_render(verts, colors, 100.0, (8.0, 8.0), (16, 16),
                              splat=1)
        np.testing.assert_allclose(np.asarray(img[8, 8]), [0, 1, 0])

    def test_behind_camera_culled(self):
        verts = jnp.array([[0.0, 0.0, -5.0]])
        colors = jnp.ones((1, 3))
        _, mask = splat_render(verts, colors, 100.0, (8.0, 8.0), (16, 16))
        assert float(mask.sum()) == 0.0


class TestMeshOverlay:
    def test_smpl_overlay_renders(self):
        model = synthetic_smpl_model(num_vertices=400, seed=0)
        verts = jnp.asarray(np.asarray(model.v_template))
        faces = np.stack([np.arange(0, 120), np.arange(1, 121),
                          np.arange(2, 122)], 1)
        cam = Camera(rotation=jnp.eye(3),
                     translation=jnp.array([0.0, 0.0, 8.0]),
                     focal_length=jnp.asarray(500.0),
                     center=jnp.array([64.0, 64.0]))
        out = render_mesh_overlay(verts, faces, cam, None, (128, 128))
        assert out.shape == (128, 128, 3)
        assert np.isfinite(out).all()
        # some pixels covered, others background white
        assert (out < 0.99).any() and (out > 0.99).any()

    def test_vertex_normals_unit(self):
        verts = jnp.asarray(np.random.RandomState(0).randn(10, 3))
        faces = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6]])
        n = np.asarray(vertex_normals(verts, faces))
        used = np.unique(faces)
        norms = np.linalg.norm(n[used], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)


class TestFaceUpsampling:
    def test_samples_lie_in_triangle_plane(self, rng):
        from nemo_tpu.render import upsample_faces
        verts = jnp.asarray(rng.randn(6, 3).astype(np.float32))
        colors = jnp.ones((6, 3))
        faces = np.array([[0, 1, 2]])
        pts, cols = upsample_faces(verts, colors, faces, samples_per_face=4)
        assert pts.shape == (10, 3)  # 6 verts + 4 samples
        # each sample is a convex combination of the 3 face vertices
        tri = np.asarray(verts)[faces[0]]
        for s in np.asarray(pts[6:]):
            # solve barycentric coords; residual must vanish
            A = np.concatenate([tri.T, np.ones((1, 3))], 0)
            b = np.concatenate([s, [1.0]])
            lam, res, *_ = np.linalg.lstsq(A, b, rcond=None)
            assert np.abs(A @ lam - b).max() < 1e-5
            assert (lam > -1e-5).all()

    def test_denser_coverage(self):
        from nemo_tpu.body import synthetic_smpl_model
        from nemo_tpu.geometry import Camera
        from nemo_tpu.render import render_mesh_overlay
        model = synthetic_smpl_model(num_vertices=300, seed=0)
        verts = jnp.asarray(np.asarray(model.v_template))
        faces = np.stack([np.arange(0, 100), np.arange(1, 101),
                          np.arange(2, 102)], 1)
        cam = Camera(rotation=jnp.eye(3),
                     translation=jnp.array([0.0, 0.0, 6.0]),
                     focal_length=jnp.asarray(400.0),
                     center=jnp.array([64.0, 64.0]))
        sparse = render_mesh_overlay(verts, faces, cam, None, (128, 128),
                                     samples_per_face=0)
        dense = render_mesh_overlay(verts, faces, cam, None, (128, 128),
                                    samples_per_face=12)
        assert (dense < 0.99).sum() >= (sparse < 0.99).sum()
