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


def rasterize_triangles(verts_cam: jnp.ndarray, faces: np.ndarray,
                        focal_length: float, center: Tuple[float, float],
                        img_hw: Tuple[int, int], patch: int = 32,
                        near: float = 1e-3
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Z-buffered barycentric triangle rasterizer (XLA-clean, no GL).

    Replaces the reference's pyrender/OSMesa surface rendering
    (hmr/renderer.py:88-181) with a `lax.scan` over faces: each step
    rasterizes one triangle into a static `patch x patch` window around its
    bbox via dynamic_slice / dynamic_update_slice, so shapes stay static and
    the whole render jits. Perspective projection matches splat_render.

    Returns:
      zbuf:  (H, W) float32, inf where empty.
      fidx:  (H, W) int32 winning face index, -1 where empty.
      bary:  (H, W, 3) float32 perspective-correct barycentric weights of
             the winning face (attribute interpolation weights).

    Triangles whose screen bbox exceeds `patch` pixels are clipped to their
    window (raise `patch` for close-up renders); triangles with any vertex
    closer than `near` are skipped.

    Cost: one scan step per face (~300 ms/frame for a 13.8k-face mesh at
    480x640 on one v5e chip; scan unroll measured slower). Offline use only
    — the fit path never renders. rasterize_triangles_binned is ~1.7x
    faster at the same output.
    """
    H, W = img_hw
    faces = np.asarray(faces)
    z = verts_cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) > near, z, near)
    u = focal_length * verts_cam[:, 0] / safe_z + center[0]
    v = focal_length * verts_cam[:, 1] / safe_z + center[1]
    pix = jnp.stack([u, v], axis=-1)                        # (V, 2)
    tri = pix[faces]                                        # (F, 3, 2)
    tz = z[faces]                                           # (F, 3)

    xs = jnp.arange(patch, dtype=jnp.float32)
    ys = jnp.arange(patch, dtype=jnp.float32)

    zbuf0 = jnp.full((H, W), jnp.inf, jnp.float32)
    fidx0 = jnp.full((H, W), -1, jnp.int32)
    bary0 = jnp.zeros((H, W, 3), jnp.float32)

    def step(carry, inp):
        zbuf, fidx, bary = carry
        p, zf, fi = inp                                     # (3,2) (3,) ()
        ox = jnp.clip(jnp.floor(jnp.min(p[:, 0])).astype(jnp.int32),
                      0, W - patch)
        oy = jnp.clip(jnp.floor(jnp.min(p[:, 1])).astype(jnp.int32),
                      0, H - patch)
        X = ox.astype(jnp.float32) + xs[None, :]            # (1, patch)
        Y = oy.astype(jnp.float32) + ys[:, None]            # (patch, 1)

        x0, y0 = p[0, 0], p[0, 1]
        x1, y1 = p[1, 0], p[1, 1]
        x2, y2 = p[2, 0], p[2, 1]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        w0 = (x2 - x1) * (Y - y1) - (y2 - y1) * (X - x1)    # (patch, patch)
        w1 = (x0 - x2) * (Y - y2) - (y0 - y2) * (X - x2)
        w2 = (x1 - x0) * (Y - y0) - (y1 - y0) * (X - x0)
        s = jnp.sign(area)
        cover = ((w0 * s >= 0) & (w1 * s >= 0) & (w2 * s >= 0)
                 & (jnp.abs(area) > 1e-8))
        inv_area = s / jnp.maximum(jnp.abs(area), 1e-8)
        b0, b1, b2 = w0 * inv_area, w1 * inv_area, w2 * inv_area

        # perspective-correct: interpolate 1/z linearly in screen space
        iz = b0 / zf[0] + b1 / zf[1] + b2 / zf[2]
        zpix = 1.0 / jnp.maximum(iz, 1e-8)
        pb = jnp.stack([b0 / zf[0], b1 / zf[1], b2 / zf[2]], -1) * zpix[
            ..., None]                                      # (patch, patch, 3)

        zpatch = jax.lax.dynamic_slice(zbuf, (oy, ox), (patch, patch))
        fpatch = jax.lax.dynamic_slice(fidx, (oy, ox), (patch, patch))
        bpatch = jax.lax.dynamic_slice(bary, (oy, ox, 0), (patch, patch, 3))

        win = cover & jnp.all(zf > near) & (zpix < zpatch)
        zbuf = jax.lax.dynamic_update_slice(
            zbuf, jnp.where(win, zpix, zpatch), (oy, ox))
        fidx = jax.lax.dynamic_update_slice(
            fidx, jnp.where(win, fi, fpatch), (oy, ox))
        bary = jax.lax.dynamic_update_slice(
            bary, jnp.where(win[..., None], pb, bpatch), (oy, ox, 0))
        return (zbuf, fidx, bary), None

    (zbuf, fidx, bary), _ = jax.lax.scan(
        step, (zbuf0, fidx0, bary0),
        (tri, tz, jnp.arange(len(faces), dtype=jnp.int32)))
    return zbuf, fidx, bary


def rasterize_triangles_binned(verts_cam: jnp.ndarray, faces: np.ndarray,
                               focal_length: float,
                               center: Tuple[float, float],
                               img_hw: Tuple[int, int], tile: int = 64,
                               faces_per_tile: int = 2048,
                               chunk: int = 256, near: float = 1e-3,
                               span: int = 2
                               ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
    """Binned tile rasterizer — same contract as rasterize_triangles,
    measured ~1.7x faster on v5e for a 13.8k-face mesh at 480x640
    (180 vs 298 ms/frame at the default faces_per_tile).

    Classic two-phase GPU/TPU design, fully static-shaped under jit:
      1. bin: each face is assigned to the (up to 2x2) screen tiles its
         bbox corners land in; the (tile_id, face) pairs are sorted and
         segmented into a (T, faces_per_tile) table (argsort +
         searchsorted — no host round-trip),
      2. raster: a scan over tiles; inside, faces stream in chunks while a
         (tile, tile) z-buffer folds the per-chunk minimum — the inner
         math is one big vectorized coverage/bary block instead of the
         per-face dynamic-slice updates of rasterize_triangles.

    Limits (documented, like `patch` of the scan version): faces whose
    bbox spans more than `span` tiles per axis only rasterize into the
    corner/edge tiles of their bbox (raise `tile` or `span` for extreme
    close-ups); tiles touched by more than `faces_per_tile` bbox entries
    drop the overflow.
    """
    H, W = img_hw
    faces = np.asarray(faces)
    F = len(faces)
    nty, ntx = -(-H // tile), -(-W // tile)
    T = nty * ntx

    z = verts_cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) > near, z, near)
    u = focal_length * verts_cam[:, 0] / safe_z + center[0]
    v = focal_length * verts_cam[:, 1] / safe_z + center[1]
    pix = jnp.stack([u, v], axis=-1)
    tri = pix[faces]                                        # (F, 3, 2)
    tz = z[faces]                                           # (F, 3)
    ok = jnp.all(tz > near, axis=1)

    # --- phase 1: face -> tile bins --------------------------------------
    fx0 = jnp.clip(jnp.floor(tri[:, :, 0].min(1) / tile), 0, ntx - 1)
    fx1 = jnp.clip(jnp.floor(tri[:, :, 0].max(1) / tile), 0, ntx - 1)
    fy0 = jnp.clip(jnp.floor(tri[:, :, 1].min(1) / tile), 0, nty - 1)
    fy1 = jnp.clip(jnp.floor(tri[:, :, 1].max(1) / tile), 0, nty - 1)
    entries, eface = [], []
    fids = jnp.arange(F, dtype=jnp.int32)
    for dy in range(span):
        for dx in range(span):
            ty = jnp.minimum(fy0 + dy, fy1)
            tx = jnp.minimum(fx0 + dx, fx1)
            tid = (ty * ntx + tx).astype(jnp.int32)
            entries.append(jnp.where(ok, tid, T))           # T = sentinel
            eface.append(fids)
    tile_ids = jnp.concatenate(entries)                     # (4F,)
    face_ids = jnp.concatenate(eface)
    order = jnp.argsort(tile_ids)
    sorted_ids = tile_ids[order]
    sorted_face = face_ids[order]
    starts = jnp.searchsorted(sorted_ids, jnp.arange(T))
    K = faces_per_tile
    n_entries = span * span * F
    gidx = jnp.clip(starts[:, None] + jnp.arange(K)[None], 0, n_entries - 1)
    tbl_face = sorted_face[gidx]                            # (T, K)
    tbl_valid = sorted_ids[gidx] == jnp.arange(T)[:, None]

    # --- phase 2: per-tile raster ----------------------------------------
    xs = jnp.arange(tile, dtype=jnp.float32)[None, :]       # (1, tile)
    ys = jnp.arange(tile, dtype=jnp.float32)[:, None]
    n_chunks = -(-K // chunk)
    pad_k = n_chunks * chunk - K

    def tile_step(_, t):
        tfaces = jnp.pad(tbl_face[t], (0, pad_k))
        tvalid = jnp.pad(tbl_valid[t], (0, pad_k))
        oy = (t // ntx) * tile
        ox = (t % ntx) * tile
        X = ox.astype(jnp.float32) + xs                     # (1, tile)
        Y = oy.astype(jnp.float32) + ys                     # (tile, 1)

        def chunk_step(carry, inp):
            zbuf, fbuf, bbuf = carry                        # (tile, tile...)
            cf, cv = inp                                    # (chunk,) each
            p = tri[cf]                                     # (c, 3, 2)
            zf = tz[cf]                                     # (c, 3)
            x0, y0 = p[:, 0, 0, None, None], p[:, 0, 1, None, None]
            x1, y1 = p[:, 1, 0, None, None], p[:, 1, 1, None, None]
            x2, y2 = p[:, 2, 0, None, None], p[:, 2, 1, None, None]
            area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
            w0 = (x2 - x1) * (Y - y1) - (y2 - y1) * (X - x1)
            w1 = (x0 - x2) * (Y - y2) - (y0 - y2) * (X - x2)
            w2 = (x1 - x0) * (Y - y0) - (y1 - y0) * (X - x0)
            s = jnp.sign(area)
            cover = ((w0 * s >= 0) & (w1 * s >= 0) & (w2 * s >= 0)
                     & (jnp.abs(area) > 1e-8)
                     & cv[:, None, None])
            inv_area = s / jnp.maximum(jnp.abs(area), 1e-8)
            b0, b1, b2 = w0 * inv_area, w1 * inv_area, w2 * inv_area
            iz = (b0 / zf[:, 0, None, None] + b1 / zf[:, 1, None, None]
                  + b2 / zf[:, 2, None, None])
            zpix = jnp.where(cover, 1.0 / jnp.maximum(iz, 1e-8), jnp.inf)
            best = jnp.argmin(zpix, axis=0)                 # (tile, tile)
            zmin = jnp.take_along_axis(zpix, best[None], 0)[0]
            win = zmin < zbuf
            zq = jnp.stack([b0 / zf[:, 0, None, None],
                            b1 / zf[:, 1, None, None],
                            b2 / zf[:, 2, None, None]], -1)
            pb = jnp.take_along_axis(
                zq, best[None, ..., None], 0)[0] * zmin[..., None]
            zbuf = jnp.where(win, zmin, zbuf)
            fbuf = jnp.where(win, cf[best], fbuf)
            bbuf = jnp.where(win[..., None], pb, bbuf)
            return (zbuf, fbuf, bbuf), None

        init = (jnp.full((tile, tile), jnp.inf, jnp.float32),
                jnp.full((tile, tile), -1, jnp.int32),
                jnp.zeros((tile, tile, 3), jnp.float32))
        (zb, fb, bb), _ = jax.lax.scan(
            chunk_step, init,
            (tfaces.reshape(n_chunks, chunk),
             tvalid.reshape(n_chunks, chunk)))
        return None, (zb, fb, bb)

    _, (zt, ft, bt) = jax.lax.scan(tile_step, None,
                                   jnp.arange(T, dtype=jnp.int32))
    # (T, tile, tile) -> (H, W)
    def untile(a):
        extra = a.shape[3:]
        a = a.reshape((nty, ntx, tile, tile) + extra)
        a = jnp.swapaxes(a, 1, 2).reshape(
            (nty * tile, ntx * tile) + extra)
        return a[:H, :W]

    return untile(zt), untile(ft), untile(bt)


def raster_render(verts_cam: jnp.ndarray, colors: jnp.ndarray,
                  faces: np.ndarray, focal_length: float,
                  center: Tuple[float, float], img_hw: Tuple[int, int],
                  patch: int = 32, span: int = 2
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Surface-rasterized render: (H, W, 3) image + coverage mask.

    Same signature contract as splat_render but draws filled triangles with
    per-pixel barycentric Gouraud shading and correct occlusion.

    On a TPU backend the z-buffer pass runs the Pallas tile-parallel
    kernel (ops/raster_pallas.py — VMEM-resident tiles, streaming-DMA
    face tables; measured 6.24 vs 81.0 ms/frame for the binned XLA
    rasterizer, full SMPL at 480x640, dispatch-amortized on v5e);
    elsewhere the scan rasterizer (kept as the CPU/test oracle).
    NEMO_TPU_RASTER=xla forces the scan path.

    patch / span are the per-face window limits of the two backends
    (scan clips faces to patch x patch px; the tile kernels only bin a
    face into span tiles per axis). Faces larger than these clip —
    callers with big faces (e.g. the checkerboard ground plane) size
    them via face_window_params.
    """
    from ..ops.raster_pallas import (raster_pallas_available,
                                     rasterize_triangles_pallas)
    if raster_pallas_available():
        zbuf, fidx, bary = rasterize_triangles_pallas(
            verts_cam, faces, focal_length, center, img_hw, span=span)
    else:
        zbuf, fidx, bary = rasterize_triangles(
            verts_cam, faces, focal_length, center, img_hw, patch=patch)
    fid = jnp.maximum(fidx, 0)
    tri_c = colors[np.asarray(faces)]                       # (F, 3, 3)
    pix_c = jnp.einsum('hwk,hwkc->hwc', bary, tri_c[fid])
    mask = (fidx >= 0).astype(jnp.float32)
    return pix_c * mask[..., None], mask


def face_window_params(verts_cam: np.ndarray, faces: np.ndarray,
                       focal_length: float, center: Tuple[float, float],
                       img_hw: Tuple[int, int], near: float = 1e-3
                       ) -> Tuple[int, Tuple[int, int]]:
    """(patch, (span_y, span_x)) sized so the largest face's screen bbox
    fits the rasterizers' per-face windows (host-side numpy; callers with
    concrete vertices and large faces — the checkerboard ground plane
    spans hundreds of px — compute these before raster_render; the
    defaults only cover SMPL-sized faces). The spans are per-axis tile
    counts for the Pallas (32, 128) tiles, bounded only by the image's
    own tile grid — no face clips, whatever its size."""
    H, W = img_hw
    v = np.asarray(verts_cam, np.float32)
    z = np.where(np.abs(v[:, 2]) > near, v[:, 2], near)
    u = focal_length * v[:, 0] / z + center[0]
    w = focal_length * v[:, 1] / z + center[1]
    pix = np.stack([np.clip(u, -W, 2 * W), np.clip(w, -H, 2 * H)], -1)
    tri = pix[np.asarray(faces)]                         # (F, 3, 2)
    ok = (v[:, 2][np.asarray(faces)] > near).all(1)
    if not ok.any():
        return 32, (2, 2)
    ext_xy = tri[ok].max(1) - tri[ok].min(1)             # (F_ok, 2)
    ext = float(ext_xy.max())
    patch = int(np.clip(1 << int(np.ceil(np.log2(max(ext, 1) + 2))),
                        32, max(32, min(H, W))))
    # Per-axis spans against the Pallas (32, 128) tiles, uncapped up to
    # the image's own tile counts — a face can never need more tiles than
    # the screen has, so nothing clips regardless of face size (the old
    # single-span cap of 12 row-tiles ~ 352 px could clip very close
    # ground-plane quads).
    ext_x = float(ext_xy[:, 0].max())
    ext_y = float(ext_xy[:, 1].max())
    span_y = int(np.clip(np.ceil(ext_y / 32) + 1, 2, -(-H // 32)))
    span_x = int(np.clip(np.ceil(ext_x / 128) + 1, 2, -(-W // 128)))
    return patch, (span_y, span_x)


def combine_meshes(verts_list, faces_list):
    """Concatenate meshes for joint (correctly occluding) rendering.

    The multi-person path of the reference's renderers: render all people
    into one z-buffer. Returns (verts (sum V_i, 3), faces (sum F_i, 3))."""
    verts_list = list(verts_list)
    faces_list = [np.asarray(f) for f in faces_list]
    off = np.cumsum([0] + [v.shape[0] for v in verts_list])[:-1]
    faces = np.concatenate([f + o for f, o in zip(faces_list, off)], 0)
    return jnp.concatenate(verts_list, axis=0), faces


def shade_vertices(verts_cam: jnp.ndarray, faces: np.ndarray,
                   base_color, shading: str = "pbr",
                   light_dir=(0.0, -0.4, -1.0),
                   ambient: float = 0.5, metallic: float = 0.2,
                   roughness: float = 1.0, n_lights: int = 3,
                   intensity: float = 1.0) -> jnp.ndarray:
    """Per-vertex colors under the reference's pyrender light rig.

    hmr/renderer.py:100-160 composes ambient_light (0.5, 0.5, 0.5), a
    MetallicRoughnessMaterial (metallicFactor 0.2, pyrender default
    roughnessFactor 1.0) and THREE white DirectionalLights (intensity 1)
    whose poses carry only translations ([0,-1,1], [0,1,1], [1,1,2]) —
    pyrender directional lights take their direction from the pose's
    ROTATION alone, so all three actually shine along the scene's -z:
    straight down the view axis (a triple-strength headlight). After the
    180-degree-about-x mesh transform, in CV camera coordinates (z into
    the scene) the direction TO the light is (0, 0, -1).

    shading='pbr' evaluates the glTF metallic-roughness BRDF under that
    rig (Lambertian (1-F) c_diff/pi + GGX specular; alpha = roughness^2
    = 1 collapses D to 1/pi and the Smith visibility to
    0.5/(NdotL+NdotV)), per-vertex with the true view vector, then sums
    the ambient term as ambient * base (pyrender's constant ambient).
    shading='diffuse' keeps the legacy single-light Lambertian with
    light_dir (clip floor 0.2) for callers that want the flat look.

    base_color: (3,) or per-vertex (V, 3) float [0,1].
    """
    n = vertex_normals(verts_cam, faces)
    base = jnp.asarray(base_color)
    if shading == "diffuse":
        l = jnp.asarray(light_dir)
        l = l / jnp.linalg.norm(l)
        return jnp.clip(-(n @ l), 0.2, 1.0)[:, None] * base

    l = jnp.array([0.0, 0.0, -1.0])                        # to-light (CV)
    v = -verts_cam / jnp.linalg.norm(verts_cam, axis=-1,
                                     keepdims=True)        # to-camera
    h = l + v
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
    ndl = jnp.maximum(n @ l, 0.0)
    ndv = jnp.maximum(jnp.sum(n * v, axis=-1), 1e-4)
    ndh = jnp.maximum(jnp.sum(n * h, axis=-1), 0.0)
    vdh = jnp.maximum(jnp.sum(v * h, axis=-1), 0.0)

    alpha2 = (roughness * roughness) ** 2
    d = alpha2 / (jnp.pi * (ndh * ndh * (alpha2 - 1.0) + 1.0) ** 2)
    vis = 0.5 / jnp.maximum(
        ndl * jnp.sqrt(ndv * ndv * (1 - alpha2) + alpha2)
        + ndv * jnp.sqrt(ndl * ndl * (1 - alpha2) + alpha2), 1e-6)
    f0 = 0.04 * (1.0 - metallic) + base * metallic         # (3,)
    fres = f0 + (1.0 - f0) * (1.0 - vdh[:, None]) ** 5     # (V, 3)
    c_diff = base * (1.0 - metallic)
    diffuse = (1.0 - fres) * c_diff / jnp.pi
    spec = fres * (d * vis)[:, None]
    radiance = n_lights * intensity * (diffuse + spec) * ndl[:, None]
    return jnp.clip(ambient * base + radiance, 0.0, 1.0)


def render_mesh_overlay(verts_world: jnp.ndarray, faces: np.ndarray,
                        camera: Camera, image: Optional[np.ndarray],
                        img_hw: Tuple[int, int],
                        base_color=(0.65, 0.74, 0.86),
                        light_dir=(0.0, -0.4, -1.0),
                        alpha: float = 0.9,
                        samples_per_face: int = 8,
                        method: str = "auto",
                        shading: str = "pbr") -> np.ndarray:
    """Render one SMPL mesh over a frame (Renderer.__call__ semantics).

    verts_world: (V, 3); camera: a Camera with batch dims stripped;
    image: (H, W, 3) float [0,1] or None for a white background.
    method: "splat" (fast point splatting), "raster" (triangle
    rasterizer — pyrender-quality surfaces), or "auto" (raster via the
    Pallas tile kernel when a TPU backend is up — ~6 ms/frame for the
    full SMPL at 480x640 — else splat).
    shading: "pbr" = the reference's ambient + triple-headlight
    metallic-roughness rig (shade_vertices); "diffuse" = legacy
    single-light Lambertian with light_dir.
    """
    img, mask = _panel_device(verts_world, faces,
                              camera.rotation, camera.translation,
                              float(camera.focal_length),
                              (float(camera.center[0]),
                               float(camera.center[1])),
                              img_hw, _resolve_method(method), base_color,
                              light_dir, samples_per_face, shading)
    return composite_panel(np.asarray(img), np.asarray(mask), image,
                           img_hw, alpha)


def _resolve_method(method: str) -> str:
    if method == "auto":
        from ..ops.raster_pallas import raster_pallas_available
        return "raster" if raster_pallas_available() else "splat"
    return method


def _panel_device(verts_world, faces, R, t, focal_length, center, img_hw,
                  method, base_color, light_dir, samples_per_face,
                  shading="pbr"):
    """Device half of render_mesh_overlay: world->camera transform,
    diffuse vertex shading, z-buffered render. Pure jnp — callable under
    an outer jit (make_mesh_panel_fn batches many of these per
    dispatch)."""
    H, W = img_hw
    verts_cam = verts_world @ R.T + t
    colors = shade_vertices(verts_cam, faces, base_color, shading,
                            light_dir)
    if method == "raster" and len(faces):
        return raster_render(verts_cam, colors, faces, focal_length,
                             center, (H, W))
    if samples_per_face > 0 and len(faces):
        verts_cam, colors = upsample_faces(verts_cam, colors, faces,
                                           samples_per_face)
    return splat_render(verts_cam, colors, focal_length, center, (H, W))


def composite_panel(img: np.ndarray, mask: np.ndarray,
                    image: Optional[np.ndarray], img_hw: Tuple[int, int],
                    alpha: float = 0.9) -> np.ndarray:
    """Host half: alpha-composite a rendered (img, mask) over a frame."""
    H, W = img_hw
    if image is None:
        image = np.ones((H, W, 3), np.float32)
    out = (img * mask[..., None] * alpha
           + np.asarray(image) * (1 - alpha * mask[..., None]))
    return out.astype(np.float32)


def make_mesh_panel_fn(faces: np.ndarray, cameras, img_hw: Tuple[int, int],
                       base_color=(0.65, 0.74, 0.86),
                       light_dir=(0.0, -0.4, -1.0),
                       samples_per_face: int = 8, method: str = "auto",
                       shading: str = "pbr"):
    """One compiled program rendering ALL views' panels per call.

    render_mesh_video renders views x frames panels; per-panel dispatch
    pays the host->device round trip every panel (~25 ms through the
    axon tunnel — more than the render itself on TPU). This returns a
    jitted fn (verts_stack (N, V, 3), R_stack (N, 3, 3),
    t_stack (N, 3)) -> (imgs (N, H, W, 3), masks (N, H, W)) with each
    view's (static) intrinsics baked in, so a whole frame's views cost
    one dispatch. Compiles once per (N, V, method, img_hw) shape."""
    method = _resolve_method(method)
    intr = [(float(c.focal_length),
             (float(c.center[0]), float(c.center[1]))) for c in cameras]

    @jax.jit
    def panels(verts_stack, R_stack, t_stack):
        imgs, masks = [], []
        for i, (foc, ctr) in enumerate(intr):
            img, mask = _panel_device(
                verts_stack[i], faces, R_stack[i], t_stack[i], foc, ctr,
                img_hw, method, base_color, light_dir, samples_per_face,
                shading)
            imgs.append(img)
            masks.append(mask)
        return jnp.stack(imgs), jnp.stack(masks)

    return panels


# ---------------------------------------------------------------------------
# pretty-renderer extras: checkerboard ground plane + person color spectra
# (pretty_renderer.py:11-41, 90-110)
# ---------------------------------------------------------------------------

def blue_spectrum(n: int) -> np.ndarray:
    """(n, 3) float [0,1] colors: fixed dim R/G, blue ramp 90->255
    (pretty_renderer.py:11-16)."""
    R = np.full(n, 60.0)
    G = np.full(n, 60.0)
    interval = (255.0 - 90.0) / max(n, 1)
    B = 90.0 + interval * np.arange(n)
    return np.stack([R, G, B], axis=1) / 255.0


def checkerboard_plane(plane_width: float = 4.0, num_boxes: int = 9,
                       y: float = 0.0, subdiv: int = 4):
    """A flat checkerboard ground mesh in the x-z plane at height y.

    Software-rasterizer equivalent of get_checkerboard_plane
    (pretty_renderer.py:19-41): num_boxes^2 tiles alternating
    white (220) / black (35). Returns (verts (N, 3), faces (F, 3) int,
    colors (N, 3) float [0,1]) ready for raster_render.

    Each checker quad is tessellated subdiv x subdiv so its faces stay
    within the rasterizers' per-face windows (a whole 0.5-1 m quad can
    project to hundreds of px — see raster_render's patch/span limits).
    """
    pw = plane_width / num_boxes
    white = np.array([220, 220, 220], np.float32) / 255.0
    black = np.array([35, 35, 35], np.float32) / 255.0
    sw = pw / subdiv
    verts, faces, colors = [], [], []
    for i in range(num_boxes):
        for j in range(num_boxes):
            c = black if (i + j) % 2 == 0 else white
            for si in range(subdiv):
                for sj in range(subdiv):
                    x0 = i * pw + si * sw - plane_width / 2
                    z0 = j * pw + sj * sw - plane_width / 2
                    base = len(verts)
                    verts += [[x0, y, z0], [x0 + sw, y, z0],
                              [x0 + sw, y, z0 + sw], [x0, y, z0 + sw]]
                    faces += [[base, base + 1, base + 2],
                              [base, base + 2, base + 3]]
                    colors += [c] * 4
    return (jnp.asarray(np.array(verts, np.float32)),
            np.array(faces, np.int64),
            jnp.asarray(np.stack(colors)))


def render_pretty(verts_list, faces: np.ndarray, camera: Camera,
                  img_hw: Tuple[int, int],
                  image: Optional[np.ndarray] = None,
                  add_ground: bool = True,
                  ground_width: float = 8.0,
                  light_dir=(0.0, -0.4, -1.0),
                  alpha: float = 1.0,
                  person_colors: Optional[np.ndarray] = None,
                  shading: str = "pbr") -> np.ndarray:
    """Multi-person 'pretty' render: blue-spectrum people over a
    checkerboard ground plane, one z-buffer (pretty_renderer.py:44-137).

    verts_list: list of (V, 3) CAMERA-frame vertex sets (the caller applies
    any world->camera transform, like the reference's per-person extrinsics).
    person_colors: optional (n_people, 3) float [0,1] base colors replacing
    the blue spectrum (the reference renderer's set_color path).
    shading: "pbr" = the reference's ambient-0.5 + triple-headlight
    metallic-roughness rig (shade_vertices, hmr/renderer.py:100-160 —
    the paper-figure look); "diffuse" = legacy single-light Lambertian
    (clip floor 0.25) with light_dir.
    """
    H, W = img_hw
    spectrum = (blue_spectrum(len(verts_list)) if person_colors is None
                else np.broadcast_to(np.asarray(person_colors, np.float32),
                                     (len(verts_list), 3)))
    all_v, all_c, all_f = [], [], []
    off = 0
    faces = np.asarray(faces)
    for i, v in enumerate(verts_list):
        v = jnp.asarray(v)
        if shading == "diffuse":
            l = jnp.asarray(light_dir)
            l = l / jnp.linalg.norm(l)
            n = vertex_normals(v, faces)
            c = jnp.clip(-(n @ l), 0.25, 1.0)[:, None] \
                * jnp.asarray(spectrum[i])
        else:
            c = shade_vertices(v, faces, spectrum[i], "pbr")
        all_v.append(v)
        all_c.append(c)
        all_f.append(faces + off)
        off += v.shape[0]
    if add_ground and all_v:
        floor_y = float(jnp.concatenate(all_v)[:, 1].max())  # +y down (cam)
        gv, gf, gc = checkerboard_plane(ground_width, y=floor_y)
        # place the plane at the people's depth
        gz = float(jnp.concatenate(all_v)[:, 2].mean())
        gv = gv + jnp.array([0.0, 0.0, gz])
        all_v.append(gv)
        # under the pbr rig the headlight grazes the floor (n . l = 0),
        # so the plane is lit by the 0.5 ambient alone — same as pyrender
        all_c.append(gc if shading == "diffuse"
                     else shade_vertices(gv, np.asarray(gf), gc, "pbr"))
        all_f.append(np.asarray(gf) + off)
    verts = jnp.concatenate(all_v)
    colors = jnp.concatenate(all_c)
    faces_all = np.concatenate(all_f)
    cx, cy = float(camera.center[0]), float(camera.center[1])
    patch, span = face_window_params(
        np.asarray(verts), faces_all, float(camera.focal_length),
        (cx, cy), (H, W))
    img, mask = raster_render(verts, colors, faces_all,
                              float(camera.focal_length), (cx, cy), (H, W),
                              patch=patch, span=span)
    if image is None:
        image = np.ones((H, W, 3), np.float32)
    m = np.asarray(mask)[..., None]
    return (np.asarray(img) * m * alpha
            + np.asarray(image) * (1 - alpha * m)).astype(np.float32)
