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


class TestTriangleRasterizer:
    def _brute_force(self, verts_cam, faces, f, c, hw):
        """Per-pixel numpy oracle: barycentric point-in-triangle + z-test."""
        H, W = hw
        v = np.asarray(verts_cam, np.float64)
        u = f * v[:, 0] / v[:, 2] + c[0]
        w = f * v[:, 1] / v[:, 2] + c[1]
        pix = np.stack([u, w], -1)
        zbuf = np.full((H, W), np.inf)
        fidx = np.full((H, W), -1, np.int64)
        for fi, face in enumerate(np.asarray(faces)):
            p0, p1, p2 = pix[face]
            z0, z1, z2 = v[face, 2]
            if min(z0, z1, z2) <= 1e-3:
                continue
            area = ((p1[0] - p0[0]) * (p2[1] - p0[1])
                    - (p1[1] - p0[1]) * (p2[0] - p0[0]))
            if abs(area) < 1e-8:
                continue
            for y in range(H):
                for x in range(W):
                    w0 = ((p2[0] - p1[0]) * (y - p1[1])
                          - (p2[1] - p1[1]) * (x - p1[0]))
                    w1 = ((p0[0] - p2[0]) * (y - p2[1])
                          - (p0[1] - p2[1]) * (x - p2[0]))
                    w2 = ((p1[0] - p0[0]) * (y - p0[1])
                          - (p1[1] - p0[1]) * (x - p0[0]))
                    s = np.sign(area)
                    if w0 * s < 0 or w1 * s < 0 or w2 * s < 0:
                        continue
                    b0, b1, b2 = w0 / area, w1 / area, w2 / area
                    z = 1.0 / (b0 / z0 + b1 / z1 + b2 / z2)
                    if z < zbuf[y, x]:
                        zbuf[y, x] = z
                        fidx[y, x] = fi
        return zbuf, fidx

    def test_matches_brute_force(self, rng):
        from nemo_tpu.render import rasterize_triangles
        verts = jnp.asarray([[-0.5, -0.5, 4.0], [0.7, -0.2, 4.0],
                             [0.0, 0.8, 4.0],
                             [-0.3, -0.4, 3.0], [0.5, -0.5, 5.0],
                             [0.1, 0.5, 4.0]], dtype=jnp.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5]])
        f, c, hw = 60.0, (24.0, 16.0), (32, 48)
        zbuf, fidx, bary = rasterize_triangles(verts, faces, f, c, hw,
                                               patch=32)
        wz, wf = self._brute_force(verts, faces, f, c, hw)
        # f32 vs f64 edge decisions can flip pixels ON triangle borders;
        # compare interiors (pixels where a 1-px neighborhood agrees).
        wf_j = np.asarray(fidx)
        disagree = (wf_j != wf)
        assert disagree.mean() < 0.02, f"{disagree.sum()} pixels differ"
        interior = (wf_j == wf) & (wf >= 0)
        assert interior.sum() > 100  # both triangles visibly drawn
        np.testing.assert_allclose(np.asarray(zbuf)[interior], wz[interior],
                                   rtol=1e-4)
        # barycentric weights sum to 1 on covered pixels
        bs = np.asarray(bary).sum(-1)
        np.testing.assert_allclose(bs[wf_j >= 0], 1.0, atol=1e-4)

    def test_occlusion_order(self):
        """A nearer triangle must win the z-buffer over a farther one."""
        from nemo_tpu.render import rasterize_triangles
        # far triangle 4x larger in world space so it still peeks out from
        # behind the near one under perspective
        tri_far = [[-4.0, -4.0, 6.0], [4.0, -4.0, 6.0], [0.0, 4.0, 6.0]]
        tri_near = [[-1.0, -1.0, 3.0], [1.0, -1.0, 3.0], [0.0, 1.0, 3.0]]
        verts = jnp.asarray(tri_far + tri_near, dtype=jnp.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5]])
        _, fidx, _ = rasterize_triangles(verts, faces, 20.0, (16.0, 16.0),
                                         (32, 32), patch=32)
        covered = np.asarray(fidx)
        assert (covered == 0).sum() > 0     # far triangle peeks out (bigger)
        assert (covered == 1).sum() > 50    # near triangle owns the overlap
        # the overlap center belongs to the near face
        assert covered[16, 16] == 1

    def test_combine_meshes_occludes_between_people(self):
        from nemo_tpu.render import combine_meshes, rasterize_triangles
        tri_a = jnp.asarray([[-1.0, -1.0, 5.0], [1.0, -1.0, 5.0],
                             [0.0, 1.0, 5.0]], dtype=jnp.float32)
        tri_b = jnp.asarray([[-1.0, -1.0, 2.5], [1.0, -1.0, 2.5],
                             [0.0, 1.0, 2.5]], dtype=jnp.float32)
        faces1 = np.array([[0, 1, 2]])
        verts, faces = combine_meshes([tri_a, tri_b], [faces1, faces1])
        assert verts.shape == (6, 3) and faces.shape == (2, 3)
        assert faces[1].tolist() == [3, 4, 5]
        _, fidx, _ = rasterize_triangles(verts, faces, 12.0, (16.0, 16.0),
                                         (32, 32), patch=32)
        assert np.asarray(fidx)[16, 16] == 1  # person B in front

    def test_overlay_method_raster(self):
        from nemo_tpu.body import synthetic_smpl_model
        from nemo_tpu.geometry import Camera
        from nemo_tpu.render import render_mesh_overlay
        model = synthetic_smpl_model(num_vertices=300, seed=0)
        verts = jnp.asarray(np.asarray(model.v_template))
        faces = np.stack([np.arange(0, 60), np.arange(1, 61),
                          np.arange(2, 62)], 1)
        cam = Camera(rotation=jnp.eye(3),
                     translation=jnp.array([0.0, 0.0, 6.0]),
                     focal_length=jnp.asarray(400.0),
                     center=jnp.array([64.0, 64.0]))
        out = render_mesh_overlay(verts, faces, cam, None, (128, 128),
                                  method="raster")
        assert out.shape == (128, 128, 3)
        assert np.isfinite(out).all()
        assert (out < 0.99).any()          # something was drawn


class TestEvalGrid:
    def _bundle(self, tmp_path, with_frames):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from nemo_tpu.data import MultiViewBundle
        rng = np.random.RandomState(0)
        V, F = 2, 5
        labels = {"gt": np.concatenate(
            [rng.rand(V, F, 25, 2).astype(np.float32) * 60,
             np.ones((V, F, 25, 1), np.float32)], -1)}
        frame_paths = None
        if with_frames:
            paths = []
            for v in range(V):
                row = []
                for f in range(F):
                    p = str(tmp_path / f"v{v}_f{f}.png")
                    plt.imsave(p, rng.rand(64, 80, 3).astype(np.float32))
                    row.append(p)
                paths.append(row)
            frame_paths = np.asarray(paths)
        return MultiViewBundle(
            labels=labels, hmr_theta=np.zeros((V, F, 69), np.float32),
            hmr_mask=np.ones((V, F, 1), np.float32),
            img_hw=np.array([64.0, 80.0], np.float32),
            frame_paths=frame_paths)

    def test_grid_without_frames(self, tmp_path):
        from nemo_tpu.render import render_eval_grid
        b = self._bundle(tmp_path, with_frames=False)
        pred = np.random.RandomState(1).rand(2, 5, 25, 2) * 60
        out = tmp_path / "grid.png"
        render_eval_grid(str(out), pred, b, "gt", num_frames=3)
        assert out.exists() and out.stat().st_size > 1000

    def test_grid_with_frames_roundtrips_bundle(self, tmp_path):
        from nemo_tpu.data import MultiViewBundle
        from nemo_tpu.render import render_eval_grid
        b = self._bundle(tmp_path, with_frames=True)
        # frame_paths survive npz save/load without pickling
        p = str(tmp_path / "b.npz")
        b.save(p)
        b2 = MultiViewBundle.load(p)
        assert b2.frame_paths is not None
        assert b2.frame_paths.shape == (2, 5)
        assert str(b2.frame_paths[1, 3]).endswith("v1_f3.png")
        pred = np.random.RandomState(1).rand(2, 5, 25, 2) * 60
        out = tmp_path / "grid.png"
        render_eval_grid(str(out), pred, b2, "gt", num_frames=4)
        assert out.exists() and out.stat().st_size > 1000

    def test_resample_indices_matches_array_resampler(self):
        from nemo_tpu.data.bundle import (resample_indices,
                                          resample_to_common_frames)
        arr = np.arange(17)[:, None].astype(np.float32)
        got = resample_to_common_frames([arr], 7, 0.25)[0, :, 0]
        idx = resample_indices(17, 7, 0.25)
        np.testing.assert_array_equal(got, arr[idx, 0])


class TestPrettyRenderer:
    def test_blue_spectrum(self):
        from nemo_tpu.render import blue_spectrum
        c = blue_spectrum(4)
        assert c.shape == (4, 3)
        assert (np.diff(c[:, 2]) > 0).all()      # blue ramps up
        assert np.allclose(c[:, 0], 60 / 255.0)

    def test_checkerboard_plane(self):
        from nemo_tpu.render import checkerboard_plane
        v, f, c = checkerboard_plane(plane_width=4.0, num_boxes=3, y=1.5,
                                     subdiv=2)
        assert v.shape == (3 * 3 * 2 * 2 * 4, 3)   # subdiv^2 quads/tile
        assert f.shape == (3 * 3 * 2 * 2 * 2, 3)
        assert np.allclose(np.asarray(v)[:, 1], 1.5)
        # alternating tiles: both colors present
        cs = np.unique(np.round(np.asarray(c)[:, 0], 3))
        assert len(cs) == 2

    def test_render_pretty_ground_and_people(self):
        import jax.numpy as jnp
        from nemo_tpu.geometry.camera import Camera
        from nemo_tpu.render import render_pretty
        rng = np.random.RandomState(0)
        # two small person blobs in camera frame
        verts = rng.randn(40, 3).astype(np.float32) * 0.2
        faces = np.stack([np.arange(38), np.arange(1, 39),
                          np.arange(2, 40)], axis=1)
        p1 = jnp.asarray(verts + np.array([-0.5, 0, 4.0], np.float32))
        p2 = jnp.asarray(verts + np.array([0.5, 0, 4.0], np.float32))
        cam = Camera(rotation=jnp.eye(3), translation=jnp.zeros(3),
                     focal_length=jnp.asarray(100.0),
                     center=jnp.asarray([32.0, 32.0]))
        img = render_pretty([p1, p2], faces, cam, (64, 64))
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()
        # the checkerboard must contribute both dark and light pixels
        lum = img.mean(-1)
        assert (lum < 0.3).any() and (lum > 0.7).any()


def test_binned_rasterizer_matches_scan(rng):
    """rasterize_triangles_binned == rasterize_triangles on a random mesh
    (same z-buffer winners, same barycentrics)."""
    from nemo_tpu.render.mesh import (rasterize_triangles,
                                      rasterize_triangles_binned)

    # realistic mesh-like faces: small triangles around random centres
    F = 120
    centers = np.stack([rng.uniform(-0.8, 0.8, F),
                        rng.uniform(-0.8, 0.8, F),
                        rng.uniform(3, 5, F)], 1)
    offs = rng.uniform(-0.12, 0.12, size=(F, 3, 3))
    verts = (centers[:, None] + offs).reshape(-1, 3).astype(np.float32)
    faces = np.arange(3 * F).reshape(F, 3)
    hw = (96, 128)
    args = (jnp.asarray(verts), faces, 100.0, (64.0, 48.0), hw)
    z1, f1, b1 = rasterize_triangles(*args, patch=96)
    z2, f2, b2 = rasterize_triangles_binned(*args, tile=32,
                                            faces_per_tile=512, chunk=64)
    z1, z2 = np.asarray(z1), np.asarray(z2)
    cov1, cov2 = np.isfinite(z1), np.isfinite(z2)
    np.testing.assert_array_equal(cov1, cov2)
    np.testing.assert_allclose(z1[cov1], z2[cov2], rtol=1e-5)
    # same winning faces except where two faces tie in depth
    same = np.asarray(f1) == np.asarray(f2)
    assert same[cov1].mean() > 0.99
    np.testing.assert_allclose(np.asarray(b1)[same & cov1],
                               np.asarray(b2)[same & cov1], atol=1e-4)


def test_binned_rasterizer_empty_and_behind(rng):
    from nemo_tpu.render.mesh import rasterize_triangles_binned

    verts = np.array([[0, 0, -1.0], [1, 0, -1.0], [0, 1, -1.0]],
                     np.float32)
    z, f, b = rasterize_triangles_binned(
        jnp.asarray(verts), np.array([[0, 1, 2]]), 100.0, (32.0, 32.0),
        (64, 64), tile=32, faces_per_tile=8, chunk=4)
    assert not np.isfinite(np.asarray(z)).any()
    assert (np.asarray(f) == -1).all()


class TestMeshVideo:
    def test_mesh_rollout_writes_frames(self, tmp_path, rng):
        """render_mesh_video: the reference's render_video('end') surface
        (render_utils.py:90-145). Without ffmpeg it must leave a .frames
        dir with one hconcat PNG per rendered frame."""
        import os
        from nemo_tpu.data import MultiViewBundle
        from nemo_tpu.render import render_mesh_video

        model = synthetic_smpl_model(num_vertices=300, seed=0)
        assert model.faces is not None and model.faces.shape[1] == 3
        V, F = 2, 3
        verts = np.tile(np.asarray(model.v_template)[None, None],
                        (V, F, 1, 1)).astype(np.float32)
        cams = [Camera(rotation=jnp.eye(3),
                       translation=jnp.array([0.0, 0.0, 8.0]),
                       focal_length=jnp.asarray(500.0),
                       center=jnp.array([32.0, 32.0]))
                for _ in range(V)]
        bundle = MultiViewBundle(
            labels={"gt": rng.rand(V, F, 25, 3).astype(np.float32)},
            hmr_theta=np.zeros((V, F, 69), np.float32),
            hmr_mask=np.ones((V, F, 1), np.float32),
            img_hw=np.array([64.0, 64.0], np.float32))
        out = render_mesh_video(str(tmp_path / "mesh.mp4"), verts,
                                model.faces, cams, bundle)
        if out.endswith(".frames"):
            pngs = sorted(os.listdir(out))
            assert len(pngs) == F
            import matplotlib.pyplot as plt
            img = plt.imread(os.path.join(out, pngs[0]))
            assert img.shape[0] == 64 and img.shape[1] == 64 * V
        else:
            assert os.path.exists(out)

    def test_mesh_rollout_over_real_frames(self, tmp_path, rng):
        """frame_paths in the bundle -> the mesh composites over images."""
        import os
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from nemo_tpu.data import MultiViewBundle
        from nemo_tpu.render import render_mesh_video

        model = synthetic_smpl_model(num_vertices=200, seed=1)
        V, F = 1, 2
        paths = []
        for f in range(F):
            p = str(tmp_path / f"frame{f}.png")
            plt.imsave(p, np.full((64, 64, 3), 0.25, np.float32))
            paths.append(p)
        bundle = MultiViewBundle(
            labels={"gt": rng.rand(V, F, 25, 3).astype(np.float32)},
            hmr_theta=np.zeros((V, F, 69), np.float32),
            hmr_mask=np.ones((V, F, 1), np.float32),
            img_hw=np.array([64.0, 64.0], np.float32),
            frame_paths=np.asarray([paths]))
        verts = np.tile(np.asarray(model.v_template)[None, None],
                        (V, F, 1, 1)).astype(np.float32)
        cams = [Camera(rotation=jnp.eye(3),
                       translation=jnp.array([0.0, 0.0, 8.0]),
                       focal_length=jnp.asarray(500.0),
                       center=jnp.array([32.0, 32.0]))]
        out = render_mesh_video(str(tmp_path / "m.mp4"), verts, model.faces,
                                cams, bundle)
        target = out if not out.endswith(".frames") else \
            os.path.join(out, sorted(os.listdir(out))[0])
        assert os.path.exists(target)
        if out.endswith(".frames"):
            img = plt.imread(target)[..., :3]
            # background pixels show the 0.25-gray source frame
            assert (np.abs(img - 0.25) < 0.02).any()


class TestComposedFigures:
    def _setup(self, rng, V=2, F=4):
        from nemo_tpu.data import MultiViewBundle
        model = synthetic_smpl_model(num_vertices=200, seed=0)
        verts = np.tile(np.asarray(model.v_template)[None, None],
                        (V, F, 1, 1)).astype(np.float32)
        cams = [Camera(rotation=jnp.eye(3),
                       translation=jnp.array([0.0, 0.0, 8.0]),
                       focal_length=jnp.asarray(500.0),
                       center=jnp.array([24.0, 24.0]))
                for _ in range(V)]
        bundle = MultiViewBundle(
            labels={"gt": rng.rand(V, F, 25, 3).astype(np.float32)},
            hmr_theta=np.zeros((V, F, 69), np.float32),
            hmr_mask=np.ones((V, F, 1), np.float32),
            img_hw=np.array([48.0, 48.0], np.float32))
        return model, verts, cams, bundle

    def test_rollout_figure_grid_shape(self, tmp_path, rng):
        """render_rollout_figure (:2214-2325): (views x frames) grid of
        mesh panels, hconcat/vconcat composed."""
        import os
        from nemo_tpu.render import render_rollout_figure
        model, verts, cams, bundle = self._setup(rng)
        p = str(tmp_path / "roll.png")
        grid = render_rollout_figure(p, verts, model.faces, cams, bundle,
                                     num_frames=3)
        assert os.path.exists(p)
        assert grid.shape == (2 * 48, 3 * 48, 3)
        assert (grid < 0.99).any()          # mesh pixels present

    def test_weak_persp_camera_matches_formula(self):
        """camera_from_weak_persp: for z=0 points the perspective camera
        reproduces VIBE's weak-persp pixel mapping x = (sx*(X+tx)+1)*W/2
        exactly (the z term is the perspective correction weak persp
        ignores)."""
        from nemo_tpu.geometry.camera import camera_from_weak_persp
        H, W, f = 48.0, 64.0, 500.0
        sy, tx, ty = 1.2, 0.3, -0.1
        sx = sy * H / W                       # VIBE's pixel-isotropic cams
        cam = camera_from_weak_persp(
            np.array([sx, sy, tx, ty], np.float32), H, W, focal_length=f)
        pts = np.array([[0.1, -0.2, 0.0], [0.0, 0.0, 0.0]], np.float32)
        pc = pts + np.asarray(cam.translation)
        u = f * pc[:, 0] / pc[:, 2] + np.asarray(cam.center)[0]
        v = f * pc[:, 1] / pc[:, 2] + np.asarray(cam.center)[1]
        np.testing.assert_allclose(
            u, (sx * (pts[:, 0] + tx) + 1) * W / 2, rtol=1e-5)
        np.testing.assert_allclose(
            v, (sy * (pts[:, 1] + ty) + 1) * H / 2, rtol=1e-5)

    def test_baseline_rollout_grid(self, tmp_path, rng):
        """render_baseline_rollout (render_vibe_rollout :1415): the
        baseline's own SMPL through its weak-persp cam, (views x frames)
        grid, straight from load_vibe_pickle-layout person dicts."""
        import os
        from nemo_tpu.render import render_baseline_rollout
        model, _, _, bundle = self._setup(rng)
        F = 4
        persons = [{"pose": np.zeros((F, 72), np.float32),
                    "betas": np.zeros(10, np.float32),
                    "orig_cam": np.tile(
                        np.array([1.0, 1.0, 0.0, 0.0], np.float32),
                        (F, 1))}
                   for _ in range(2)]
        p = str(tmp_path / "vibe_rollout.png")
        grid = render_baseline_rollout(p, model, persons, bundle,
                                       num_frames=2)
        assert os.path.exists(p)
        assert grid.shape == (2 * 48, 2 * 48, 3)
        assert (grid < 0.99).any()          # mesh pixels present

    def test_input_figure_grid(self, tmp_path, rng):
        """render_input_figure (:2143-2212): raw-frames grid; views
        without frame paths render white panels."""
        import os
        from nemo_tpu.render import render_input_figure
        _, _, _, bundle = self._setup(rng)
        p = str(tmp_path / "input.png")
        grid = render_input_figure(p, bundle, num_frames=3)
        assert os.path.exists(p)
        assert grid.shape == (2 * 48, 3 * 48, 3)
        np.testing.assert_allclose(grid, 1.0)   # no frame paths -> white

    def test_rollout_mv_figure(self, tmp_path, rng):
        """render_rollout_mv_figure (:2036-2143): ONE motion through every
        view's camera, no background."""
        import os
        from nemo_tpu.render import render_rollout_mv_figure
        model, verts, cams, bundle = self._setup(rng)
        p = str(tmp_path / "mv.png")
        grid = render_rollout_mv_figure(p, 1, verts, model.faces, cams,
                                        bundle, num_frames=2)
        assert os.path.exists(p)
        assert grid.shape == (2 * 48, 2 * 48, 3)
        assert (grid < 0.99).any()          # mesh pixels present

    def test_pretty_rollout_figure(self, tmp_path, rng):
        """render_pretty_rollout_figure (:2499-2573): per view one pretty
        multi-person scene (spread frames, checkerboard ground)."""
        import os
        from nemo_tpu.render import render_pretty_rollout_figure
        model, verts, cams, bundle = self._setup(rng)
        p = str(tmp_path / "pretty.png")
        grid = render_pretty_rollout_figure(p, verts, model.faces, cams,
                                            bundle, num_frames=2)
        assert os.path.exists(p)
        assert grid.shape == (2 * 48, 48, 3)    # one panel per view row
        assert (grid < 0.99).any()              # scene pixels present

    def test_3d_rollout_figure(self, tmp_path, rng):
        """render_3d_rollout_figure (:2682-2758): two fixed synthetic
        viewpoints composed with the inverse initial orient, no bg."""
        import os
        from nemo_tpu.render import render_3d_rollout_figure
        model, verts, _, bundle = self._setup(rng)
        p = str(tmp_path / "r3d.png")
        grid = render_3d_rollout_figure(p, verts, model.faces, bundle,
                                        num_frames=3)
        assert os.path.exists(p)
        assert grid.shape == (2 * 48, 3 * 48, 3)
        assert (grid < 0.99).any()          # mesh pixels present

    def test_rollout_figure_resize_cap(self, tmp_path, rng):
        from nemo_tpu.render import render_rollout_figure
        model, verts, cams, bundle = self._setup(rng, V=1, F=2)
        grid = render_rollout_figure(str(tmp_path / "r.png"), verts,
                                     model.faces, cams, bundle,
                                     num_frames=2, max_size=60)
        assert max(grid.shape[:2]) <= 60    # MAX_SIZE cap (:2312-2322)

    def test_comparison_figure_rows(self, tmp_path, rng):
        """render_comparison_figure (:2325-2407): data row + optional
        initializer row + NeMo row for one view."""
        import os
        from nemo_tpu.render import render_comparison_figure
        model, verts, cams, bundle = self._setup(rng, V=1, F=4)
        p = str(tmp_path / "cmp.png")
        grid = render_comparison_figure(p, 0, verts[0], model.faces,
                                        cams[0], bundle,
                                        init_verts=verts[0] + 0.01,
                                        num_frames=2)
        assert os.path.exists(p)
        assert grid.shape == (3 * 48, 2 * 48, 3)   # 3 rows with init
        grid2 = render_comparison_figure(str(tmp_path / "c2.png"), 0,
                                         verts[0], model.faces, cams[0],
                                         bundle, num_frames=2)
        assert grid2.shape == (2 * 48, 2 * 48, 3)  # 2 rows without

    def test_global_overlay_writes(self, tmp_path, rng):
        import os
        from nemo_tpu.render import render_global_overlay
        p = str(tmp_path / "overlay.png")
        render_global_overlay(p, rng.randn(10, 3), rng.randn(10, 3),
                              rng.randn(10, 3))
        assert os.path.exists(p)
        render_global_overlay(str(tmp_path / "o2.png"), rng.randn(5, 3),
                              rng.randn(5, 3))   # no GLAMR
        assert os.path.exists(str(tmp_path / "o2.png"))

    def test_global_root_trajectories(self, tmp_path, rng):
        """render_3d_global_root (:825-911): gt/glamr/pred 3D panels with
        mean-distance-to-GT titles; error values verifiable by hand."""
        import os
        from nemo_tpu.render import render_global_root_trajectories
        gt = rng.randn(8, 3)
        pred = gt + 1.0                       # offset by sqrt(3) everywhere
        errs = render_global_root_trajectories(str(tmp_path), gt, pred,
                                               glamr_trans=gt)
        for f in ("gt.png", "glamr.png", "pred.png"):
            assert os.path.exists(str(tmp_path / f))
        np.testing.assert_allclose(errs["pred"], np.sqrt(3.0), rtol=1e-6)
        np.testing.assert_allclose(errs["glamr"], 0.0, atol=1e-12)
        errs2 = render_global_root_trajectories(str(tmp_path / "ng"),
                                                gt, pred)   # no GLAMR
        assert "glamr" not in errs2

    def test_pretty_rollout_frame_list_and_color(self, tmp_path, rng):
        """render_pretty_rollout_figure_frame_list (:2642-2681) = explicit
        frame_idxs; color= flat base color (set_color, :2530-2533)."""
        from nemo_tpu.render import render_pretty_rollout_figure
        model, verts, cams, bundle = self._setup(rng)
        p = str(tmp_path / "pfl.png")
        grid = render_pretty_rollout_figure(p, verts, model.faces, cams,
                                            bundle, frame_idxs=[0, 3, 1],
                                            color=(0.8, 0.2, 0.2))
        assert grid.shape == (2 * 48, 48, 3)
        mask = grid.reshape(-1, 3).std(1) > 0.01   # non-gray scene pixels
        px = grid.reshape(-1, 3)[mask]
        assert px.size and (px[:, 0] > px[:, 2]).mean() > 0.9  # red people

    def test_pretty_individual_figure(self, tmp_path, rng):
        """render_pretty_individual_figure (:2611-2641): one file per
        phase-sampled body, no ground."""
        import os
        from nemo_tpu.render import render_pretty_individual_figure
        model, verts, cams, bundle = self._setup(rng)
        paths = render_pretty_individual_figure(
            str(tmp_path / "sep"), verts[0, :3], model.faces, cams[0],
            bundle)
        assert len(paths) == 3 and all(os.path.exists(p) for p in paths)

    def test_comparison_figure_crop(self, tmp_path, rng):
        """render_comparison_figure_pretty's crop (:2446,:2492): rows are
        sliced to crop[0]:crop[1] before composition."""
        from nemo_tpu.render import render_comparison_figure
        model, verts, cams, bundle = self._setup(rng, V=1, F=4)
        grid = render_comparison_figure(str(tmp_path / "cc.png"), 0,
                                        verts[0], model.faces, cams[0],
                                        bundle, num_frames=2,
                                        crop=(8, 40))
        assert grid.shape == (2 * 32, 2 * 48, 3)   # 48-row panels -> 32


class TestPerJointKeypointFrames:
    def test_writes_confident_joints_only(self, tmp_path, rng):
        """render_rollout_keypoint_per_joint_figure (:355-421): one dot
        image per confident (view, frame, joint), named
        {ridx}_{cidx}_{joint}.png."""
        import os
        from nemo_tpu.data import MultiViewBundle
        from nemo_tpu.render import render_per_joint_keypoint_frames
        V, F = 2, 4
        pts = np.concatenate(
            [rng.rand(V, F, 25, 2).astype(np.float32) * 40,
             np.zeros((V, F, 25, 1), np.float32)], -1)
        pts[:, :, :3, 2] = 1.0              # only 3 joints confident
        bundle = MultiViewBundle(
            labels={"op": pts}, hmr_theta=np.zeros((V, F, 69), np.float32),
            hmr_mask=np.ones((V, F, 1), np.float32),
            img_hw=np.array([48.0, 48.0], np.float32))
        out = str(tmp_path / "perjoint")
        n = render_per_joint_keypoint_frames(out, pts, bundle, num_frames=2)
        assert n == V * 2 * 3
        files = os.listdir(out)
        assert len(files) == n
        assert any(f.startswith("000_000_") for f in files)


class TestDynamicVelocityPlots:
    def test_writes_per_view_plots(self, tmp_path, rng):
        """plot_3d_dynamic (:712-782): v{v}_vel.png (15 joint speeds) +
        v{v}_vel_stats.png (max/mean/rwrist), scaled by 30 * fm."""
        import os
        from nemo_tpu.render import render_dynamic_velocity_plots
        gt = rng.rand(2, 6, 15, 3).astype(np.float32)
        out = str(tmp_path / "dyn")
        render_dynamic_velocity_plots(out, gt,
                                      framerate_multiplier=[1.0, 1.4])
        for v in range(2):
            assert os.path.exists(os.path.join(out, f"v{v}_vel.png"))
            assert os.path.exists(os.path.join(out, f"v{v}_vel_stats.png"))


class TestWorldRollouts:
    """render_gt_rollout / render_pred_in_gt_rollout / render_glamr_rollout
    (:1652-2035): world meshes through the GT-fit cameras, rigid-aligned
    into the GT world for pred/GLAMR."""

    def _bundle(self, rng, V=2, F=3):
        from nemo_tpu.data import MultiViewBundle
        return MultiViewBundle(
            labels={"gt": rng.rand(V, F, 25, 3).astype(np.float32)},
            hmr_theta=np.zeros((V, F, 69), np.float32),
            hmr_mask=np.ones((V, F, 1), np.float32),
            img_hw=np.array([40.0, 40.0], np.float32),
            gt3d_pose=(0.2 * rng.randn(V, F, 72)).astype(np.float32),
            gt3d_trans=(0.2 * rng.randn(V, F, 3)).astype(np.float32),
            gt_cameras=np.concatenate(
                [np.tile([0, 0, 9], (V, 1)),
                 np.tile(np.eye(3)[:, :2].reshape(6), (V, 1))],
                axis=1).astype(np.float32),
            glamr_orient=(0.2 * rng.randn(V, F, 3)).astype(np.float32),
            glamr_trans=(0.2 * rng.randn(V, F, 3)).astype(np.float32),
            baseline_poses={"glamr":
                            rng.randn(V, F, 70).astype(np.float32) * 0.2})

    def test_gt_rollout_grid(self, tmp_path, rng):
        import os
        from nemo_tpu.render import render_gt_rollout
        model = synthetic_smpl_model(num_vertices=200, seed=0)
        b = self._bundle(rng)
        p = str(tmp_path / "gt_roll.png")
        grid = render_gt_rollout(p, model, b, num_frames=2)
        assert os.path.exists(p)
        assert grid.shape == (2 * 40, 2 * 40, 3)

    def test_pred_in_gt_alignment_and_glamr(self, tmp_path, rng):
        import os
        from nemo_tpu.eval.metrics import world_grid_forward
        from nemo_tpu.render import (render_glamr_rollout,
                                     render_pred_in_gt_rollout)
        model = synthetic_smpl_model(num_vertices=200, seed=0)
        b = self._bundle(rng)
        # pred world = GT world + a rigid offset; alignment must undo it,
        # so the rendered grid equals the GT rollout's
        v_gt, _ = world_grid_forward(model, b.gt3d_pose, b.gt3d_trans)
        pred_v = v_gt + np.array([3.0, -1.0, 2.0], np.float32)
        g1 = render_pred_in_gt_rollout(str(tmp_path / "p.png"), model,
                                       pred_v, b, num_frames=2)
        from nemo_tpu.render import render_gt_rollout
        g0 = render_gt_rollout(str(tmp_path / "g.png"), model, b,
                               num_frames=2)
        np.testing.assert_allclose(g1, g0, atol=1e-3)
        g2 = render_glamr_rollout(str(tmp_path / "gl.png"), model, b,
                                  num_frames=2)
        assert os.path.exists(str(tmp_path / "gl.png"))
        assert g2.shape == g0.shape

    def test_glamr_rollout_requires_world_slots(self, tmp_path, rng):
        from nemo_tpu.render import render_glamr_rollout
        model = synthetic_smpl_model(num_vertices=200, seed=0)
        b = self._bundle(rng)
        import dataclasses as dc
        b2 = dc.replace(b, glamr_orient=None)
        with pytest.raises(ValueError, match="GLAMR"):
            render_glamr_rollout(str(tmp_path / "x.png"), model, b2)


def test_panel_fn_matches_overlay(rng):
    """make_mesh_panel_fn (one dispatch for all views) reproduces
    render_mesh_overlay panel-by-panel: same device math, batched."""
    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.render import (composite_panel, make_mesh_panel_fn,
                                 render_mesh_overlay)

    model = synthetic_smpl_model(num_vertices=250, seed=2)
    hw = (48, 64)
    cams = [Camera(rotation=jnp.eye(3),
                   translation=jnp.array([0.0, 0.0, 6.0 + v]),
                   focal_length=jnp.asarray(400.0 + 50 * v),
                   center=jnp.array([32.0, 24.0]))
            for v in range(2)]
    verts = np.stack([np.asarray(model.v_template) + 0.05 * v
                      for v in range(2)]).astype(np.float32)

    panel_fn = make_mesh_panel_fn(model.faces, cams, hw)
    imgs, masks = panel_fn(jnp.asarray(verts),
                           jnp.stack([c.rotation for c in cams]),
                           jnp.stack([c.translation for c in cams]))
    for v in range(2):
        want = render_mesh_overlay(jnp.asarray(verts[v]), model.faces,
                                   cams[v], None, hw)
        got = composite_panel(np.asarray(imgs[v]), np.asarray(masks[v]),
                              None, hw)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_pretty_ground_plane_covers_width(rng):
    """Large checker quads used to clip to the rasterizer's per-face
    window (scan patch / binning span): with the tessellated plane and
    face_window_params sizing, the ground must show both checker shades
    across the full image width."""
    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.render import render_pretty

    model = synthetic_smpl_model(num_vertices=200, seed=0)
    verts = jnp.asarray(np.asarray(model.v_template)
                        + np.array([0, 0, 4.0], np.float32))
    cam = Camera(rotation=jnp.eye(3), translation=jnp.zeros(3),
                 focal_length=jnp.asarray(200.0),
                 center=jnp.asarray([128.0, 32.0]))
    img = render_pretty([verts], model.faces, cam, (96, 256),
                        ground_width=12.0)
    lum = img.mean(-1)
    bottom = lum[64:]                     # ground-dominated rows
    # under the reference light rig the headlight grazes the floor, so
    # the checkers carry the 0.5 ambient only: white 0.5*220/255 = 0.43,
    # black 0.5*35/255 = 0.07 (pretty_renderer.py:65,116-126)
    for cols in (slice(0, 85), slice(85, 170), slice(170, 256)):
        seg = bottom[:, cols]
        assert (seg < 0.15).any() and (seg > 0.35).any(), cols


class TestReferenceLightRig:
    """shade_vertices: the hmr/renderer.py:100-160 / pretty_renderer.py:
    65-126 rig (ambient 0.5 + three identity-rotation DirectionalLights =
    a triple headlight + MetallicRoughness 0.2/1.0)."""

    def _plane(self):
        # two triangles facing the camera (normal -z), at depth 4
        v = jnp.asarray(np.array(
            [[-1, -1, 4], [1, -1, 4], [1, 1, 4], [-1, 1, 4]], np.float32))
        f = np.array([[0, 2, 1], [0, 3, 2]])
        return v, f

    def test_grazing_surface_is_ambient_only(self):
        """An up-facing floor (normal perpendicular to the headlight)
        keeps exactly ambient * base."""
        from nemo_tpu.render import shade_vertices
        v = jnp.asarray(np.array(
            [[0, 1, 4], [1, 1, 4], [1, 1, 5], [0, 1, 5]], np.float32))
        f = np.array([[0, 1, 2], [0, 2, 3]])
        base = (0.8, 0.6, 0.4)
        c = np.asarray(shade_vertices(v, f, base, "pbr"))
        np.testing.assert_allclose(
            c, np.broadcast_to(0.5 * np.asarray(base), (4, 3)), atol=1e-6)

    def test_headlight_brightens_camera_facing(self):
        from nemo_tpu.render import shade_vertices
        v, f = self._plane()
        base = (0.5, 0.5, 0.5)
        c = np.asarray(shade_vertices(v, f, base, "pbr"))
        assert (c > 0.5 * 0.5 + 0.05).all()      # well above ambient
        assert (c <= 1.0).all()

    def test_metallic_tints_specular(self):
        """metallic raises F0 toward the base color: a red metal surface
        must gain more red than blue from the specular term."""
        from nemo_tpu.render.mesh import shade_vertices
        v, f = self._plane()
        c_dielec = np.asarray(shade_vertices(v, f, (0.8, 0.1, 0.1), "pbr",
                                             metallic=0.0))
        c_metal = np.asarray(shade_vertices(v, f, (0.8, 0.1, 0.1), "pbr",
                                            metallic=1.0))
        gain = c_metal - 0.5 * np.array([0.8, 0.1, 0.1])
        assert (gain[:, 0] > gain[:, 2]).all()
        # dielectric keeps the Lambert term; metal drops it (c_diff = 0)
        assert (c_dielec[:, 2] > c_metal[:, 2]).all()

    def test_per_vertex_base_colors(self):
        from nemo_tpu.render import shade_vertices
        v, f = self._plane()
        base = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]],
                        np.float32)
        c = np.asarray(shade_vertices(v, f, jnp.asarray(base), "pbr"))
        assert c.shape == (4, 3)
        assert c[0, 0] > c[0, 1]                 # red vertex stays red

    def test_diffuse_mode_unchanged(self, rng):
        """shading='diffuse' reproduces the legacy single-light formula."""
        from nemo_tpu.render import shade_vertices
        from nemo_tpu.render.mesh import vertex_normals
        v = jnp.asarray(rng.randn(12, 3).astype(np.float32)
                        + np.array([0, 0, 5], np.float32))
        f = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]])
        l = np.array([0.0, -0.4, -1.0])
        l = l / np.linalg.norm(l)
        n = np.asarray(vertex_normals(v, f))
        want = np.clip(-(n @ l), 0.2, 1.0)[:, None] * np.array(
            [0.65, 0.74, 0.86])
        got = np.asarray(shade_vertices(v, f, (0.65, 0.74, 0.86),
                                        "diffuse"))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_pbr_golden_image(self):
        """render_pretty under the reference rig matches the checked-in
        golden (regenerate: scripts/make_shading_golden.py)."""
        import os
        golden_path = os.path.join(os.path.dirname(__file__), "goldens",
                                   "pbr_shading.npz")
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "make_shading_golden",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "make_shading_golden.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        img = mod.build()
        want = np.load(golden_path)["img"]
        np.testing.assert_allclose(img, want, atol=2e-5)
