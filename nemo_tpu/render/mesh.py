"""Device-side mesh overlay rendering (vertex-splat z-buffer).

Functional stand-in for the reference's pyrender/OSMesa offscreen renderers
(hmr/renderer.py:88-181, pretty_renderer.py, VIBE/lib/utils/renderer.py) —
those need a GL stack; this renders on the accelerator with jnp only:
project vertices through the camera, z-buffer them with scatter-min, splat
normal-shaded colors, and alpha-composite over the frame. Good for overlay
videos and debugging; a triangle rasterizer can replace the splat without
changing the API.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Camera, perspective_projection


def vertex_normals(verts: jnp.ndarray, faces: np.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals. verts (V, 3), faces (F, 3) int."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = jnp.cross(v1 - v0, v2 - v0)  # (F, 3) area-weighted
    n = jnp.zeros_like(verts)
    for i in range(3):
        n = n.at[faces[:, i]].add(fn)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-8)


def splat_render(verts_cam: jnp.ndarray, colors: jnp.ndarray,
                 focal_length: float, center: Tuple[float, float],
                 img_hw: Tuple[int, int], splat: int = 2
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render camera-space vertices to an (H, W, 3) image + coverage mask.

    Z-buffering via scatter-min on a quantized depth key; each vertex covers
    a splat x splat pixel block so the 6890-vertex SMPL mesh closes up at
    typical overlay resolutions.
    """
    H, W = img_hw
    z = verts_cam[:, 2]
    u = focal_length * verts_cam[:, 0] / z + center[0]
    v = focal_length * verts_cam[:, 1] / z + center[1]

    px = jnp.round(u).astype(jnp.int32)
    py = jnp.round(v).astype(jnp.int32)

    zbuf0 = jnp.full((H * W,), jnp.inf)
    img0 = jnp.zeros((H * W, 3))

    def one_offset(buffers, offset):
        zbuf, img = buffers
        dx, dy = offset
        x = jnp.clip(px + dx, 0, W - 1)
        y = jnp.clip(py + dy, 0, H - 1)
        lin = y * W + x
        valid = (z > 1e-3) & (px + dx >= 0) & (px + dx < W) & \
                (py + dy >= 0) & (py + dy < H)
        zv = jnp.where(valid, z, jnp.inf)
        zbuf = zbuf.at[lin].min(zv)
        # winner-writes: a vertex writes its color where it holds the z-buffer
        won = (zbuf[lin] == zv) & valid
        img = img.at[lin].set(jnp.where(won[:, None], colors, img[lin]))
        return (zbuf, img)

    bufs = (zbuf0, img0)
    for dx in range(splat):
        for dy in range(splat):
            bufs = one_offset(bufs, (dx, dy))
    zbuf, img = bufs
    mask = jnp.isfinite(zbuf).astype(jnp.float32)
    return img.reshape(H, W, 3), mask.reshape(H, W)


def upsample_faces(verts: jnp.ndarray, colors: jnp.ndarray,
                   faces: np.ndarray, samples_per_face: int = 8
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Barycentric interior samples of every triangle.

    Turns surface rasterization into dense point splatting — an XLA-clean
    stand-in for a triangle scanline rasterizer: each face contributes
    `samples_per_face` interpolated points (position + color), which close
    up the mesh at overlay resolutions. Deterministic low-discrepancy
    barycentric pattern.
    """
    k = np.arange(1, samples_per_face + 1)
    u = (k * 0.618033988749895) % 1.0     # golden-ratio sequence
    v = (k * 0.754877666246693) % 1.0
    flip = u + v > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    w = 1 - u - v
    bary = jnp.asarray(np.stack([w, u, v], 1), jnp.float32)   # (S, 3)

    tri = verts[faces]                                        # (F, 3, 3)
    tri_c = colors[faces]                                     # (F, 3, 3)
    pts = jnp.einsum('sk,fkd->fsd', bary, tri).reshape(-1, 3)
    cols = jnp.einsum('sk,fkd->fsd', bary, tri_c).reshape(-1, 3)
    return (jnp.concatenate([verts, pts], axis=0),
            jnp.concatenate([colors, cols], axis=0))


def render_mesh_overlay(verts_world: jnp.ndarray, faces: np.ndarray,
                        camera: Camera, image: Optional[np.ndarray],
                        img_hw: Tuple[int, int],
                        base_color=(0.65, 0.74, 0.86),
                        light_dir=(0.0, -0.4, -1.0),
                        alpha: float = 0.9,
                        samples_per_face: int = 8) -> np.ndarray:
    """Render one SMPL mesh over a frame (Renderer.__call__ semantics).

    verts_world: (V, 3); camera: a Camera with batch dims stripped;
    image: (H, W, 3) float [0,1] or None for a white background.
    """
    H, W = img_hw
    R, t = camera.rotation, camera.translation
    verts_cam = verts_world @ R.T + t

    n = vertex_normals(verts_cam, faces)
    l = jnp.asarray(light_dir)
    l = l / jnp.linalg.norm(l)
    diffuse = jnp.clip(-(n @ l), 0.2, 1.0)[:, None]
    colors = diffuse * jnp.asarray(base_color)

    if samples_per_face > 0 and len(faces):
        verts_cam, colors = upsample_faces(verts_cam, colors, faces,
                                           samples_per_face)

    cx, cy = float(camera.center[0]), float(camera.center[1])
    img, mask = splat_render(verts_cam, colors, float(camera.focal_length),
                             (cx, cy), (H, W))
    if image is None:
        image = np.ones((H, W, 3), np.float32)
    out = (np.asarray(img) * np.asarray(mask)[..., None] * alpha
           + np.asarray(image) * (1 - alpha * np.asarray(mask)[..., None]))
    return out.astype(np.float32)
