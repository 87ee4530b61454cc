"""Camera models: perspective projection and extrinsics, pure jnp.

Behavioral reference: /root/reference/hmr/geometry.py:63-177 and
/root/reference/utils/geometry.py:95-117 (the epsilon-guarded projection).

The NeMo learned camera is 9 parameters per view: translation (3) followed by
a 6D rotation (6), with intrinsics fixed (f = 5000, principal point at the
image center) — see nemo/neural_motion_model.py:3373-3381 and :3096-3114.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rotations import rot6d_to_rotmat

FOCAL_LENGTH = 5000.0  # constants.py:1


class Camera(NamedTuple):
    """A batch of perspective cameras (leading axes broadcast)."""
    rotation: jnp.ndarray      # (..., 3, 3)
    translation: jnp.ndarray   # (..., 3)
    focal_length: jnp.ndarray  # (...,) or scalar
    center: jnp.ndarray        # (..., 2) principal point (x=D0/2, y=D1/2 —
                               # note the reference swaps image dims; we keep
                               # its exact convention, see camera_from_params)


def camera_from_params(params9: jnp.ndarray, img_d0: float, img_d1: float,
                       focal_length: float = FOCAL_LENGTH) -> Camera:
    """Build a Camera from NeMo's 9-parameter learned encoding.

    params9[..., :3] is camera translation, params9[..., 3:] a 6D rotation.
    The principal point replicates the reference's convention exactly
    (nemo/neural_motion_model.py:3104-3106): center[0] = IMG_D0 // 2,
    center[1] = IMG_D1 // 2, where D0 is image height and D1 width.
    """
    rot = rot6d_to_rotmat(params9[..., 3:])
    trans = params9[..., :3]
    batch_shape = params9.shape[:-1]
    center = jnp.broadcast_to(
        jnp.array([img_d0 // 2, img_d1 // 2], dtype=params9.dtype),
        batch_shape + (2,))
    f = jnp.broadcast_to(jnp.asarray(focal_length, params9.dtype), batch_shape)
    return Camera(rotation=rot, translation=trans, focal_length=f, center=center)


def init_camera_params(key, num_views: int, img_d0: float,
                       focal_length: float = FOCAL_LENGTH) -> jnp.ndarray:
    """Initial learned-camera parameters.

    Replicates nemo/neural_motion_model.py:3375-3381: 1e-4 * N(0,1), then
    +1 on indices 3 and 6 (near-identity 6D rotation) and depth init
    2f / IMG_D0 on index 2.
    """
    p = 1e-4 * jax.random.normal(key, (num_views, 9), dtype=jnp.float32)
    p = p.at[:, 3].add(1.0)
    p = p.at[:, 6].add(1.0)
    p = p.at[:, 2].add(2.0 * focal_length / (img_d0 * 1 + 1e-9))
    return p


def apply_extrinsics(points: jnp.ndarray, rotation: jnp.ndarray,
                     translation: jnp.ndarray, inverse: bool = False
                     ) -> jnp.ndarray:
    """World<->camera transform (hmr/geometry.py:63-76).

    points: (..., N, 3); rotation: (..., 3, 3); translation: (..., 3).
    """
    hi = jax.lax.Precision.HIGHEST
    if not inverse:
        pts = jnp.einsum('...ij,...kj->...ki', rotation, points, precision=hi)
        return pts + translation[..., None, :]
    pts = points - translation[..., None, :]
    # rotation is orthonormal so inverse == transpose; the reference calls
    # torch.inverse, transpose is the idiomatic (and exact) equivalent.
    return jnp.einsum('...ji,...kj->...ki', rotation, pts, precision=hi)


def perspective_projection(points: jnp.ndarray, rotation: jnp.ndarray,
                           translation: jnp.ndarray,
                           focal_length, camera_center,
                           eps: float = 1e-9) -> jnp.ndarray:
    """Project 3D points to the image plane (hmr/geometry.py:78-106).

    Args:
      points: (..., N, 3)
      rotation: (..., 3, 3)
      translation: (..., 3)
      focal_length: (...,) or scalar
      camera_center: (..., 2)
    Returns:
      (..., N, 2) pixel coordinates.

    The divide is epsilon-guarded like utils/geometry.py:109 — the reference's
    plain divide NaNs when a point crosses the camera plane during camera
    optimization; the guard has no effect away from z=0.
    """
    pts = jnp.einsum('...ij,...kj->...ki', rotation, points,
                     precision=jax.lax.Precision.HIGHEST)
    pts = pts + translation[..., None, :]
    z = pts[..., 2:3]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    xy = pts[..., :2] / z
    f = jnp.asarray(focal_length)[..., None, None]
    return f * xy + jnp.asarray(camera_center)[..., None, :]


def project(points: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """Project through a Camera tuple."""
    return perspective_projection(points, camera.rotation, camera.translation,
                                  camera.focal_length, camera.center)


def estimate_translation(S: jnp.ndarray, joints_2d: jnp.ndarray,
                         joints_conf: jnp.ndarray,
                         focal_length: float = 5000.0,
                         img_size: float = 224.0) -> jnp.ndarray:
    """Weighted least-squares camera translation (hmr/geometry.py:109-147).

    Finds t minimizing || w * (project(S + t) - joints_2d) || for a fixed
    intrinsic camera. Vectorized closed form (the reference loops per sample
    on the host with numpy; this is a single batched 3x3 solve).

    Args:
      S: (..., N, 3) 3D joints.
      joints_2d: (..., N, 2).
      joints_conf: (..., N) confidences.
    Returns:
      (..., 3) translation.
    """
    f = focal_length
    cx = cy = img_size / 2.0
    w = jnp.sqrt(jnp.maximum(joints_conf, 0.0))  # (..., N)

    X, Y, Z = S[..., 0], S[..., 1], S[..., 2]
    u, v = joints_2d[..., 0], joints_2d[..., 1]

    # Rows of the stacked system (2 rows per joint):
    #   [f, 0, cx - u] t = (u - cx) Z - f X
    #   [0, f, cy - v] t = (v - cy) Z - f Y
    # Solve the 3x3 normal equations with per-row weights w.
    a1 = jnp.stack([jnp.full_like(u, f), jnp.zeros_like(u), cx - u], axis=-1)
    a2 = jnp.stack([jnp.zeros_like(v), jnp.full_like(v, f), cy - v], axis=-1)
    b1 = (u - cx) * Z - f * X
    b2 = (v - cy) * Z - f * Y

    A = jnp.concatenate([a1, a2], axis=-2)                      # (..., 2N, 3)
    b = jnp.concatenate([b1, b2], axis=-1)                      # (..., 2N)
    W = jnp.concatenate([w, w], axis=-1)                        # (..., 2N)
    # Weighted as in the reference: W is applied once to both A and b
    # (i.e. weights enter the normal equations squared through A^T A).
    Aw = A * W[..., None]
    bw = b * W
    AtA = jnp.einsum('...ni,...nj->...ij', Aw, Aw)
    Atb = jnp.einsum('...ni,...n->...i', Aw, bw)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]


def camera_from_weak_persp(cam4, img_h: float, img_w: float,
                           focal_length: float = FOCAL_LENGTH) -> Camera:
    """VIBE orig_cam (sx, sy, tx, ty) -> an equivalent perspective Camera.

    VIBE's weak-perspective image mapping is x_px = (sx*(X+tx)+1) * W/2
    (VIBE/lib/utils/renderer.py WeakPerspectiveCamera), with orig_cam
    constructed pixel-isotropic (sx*W == sy*H). An identity-rotation
    perspective camera with translation (tx, ty, 2f/(W*sx)) and principal
    point (W/2, H/2) reproduces it exactly — the same trick as SPIN's
    weak->perspective conversion (models/hmr.py:spin_projection,
    VIBE/lib/models/spin.py:309-322). Numpy on purpose (host-side render
    prep). Feeds render_mesh_overlay, whose center[0] is the WIDTH axis."""
    import numpy as np
    cam4 = np.asarray(cam4, np.float32)
    sx, tx, ty = cam4[..., 0], cam4[..., 2], cam4[..., 3]
    tz = 2.0 * np.float32(focal_length) / (np.float32(img_w) * sx + 1e-9)
    trans = np.stack([tx, ty, tz], axis=-1)
    batch_shape = cam4.shape[:-1]
    eye = np.broadcast_to(np.eye(3, dtype=np.float32),
                          batch_shape + (3, 3))
    center = np.broadcast_to(
        np.array([img_w / 2.0, img_h / 2.0], np.float32),
        batch_shape + (2,))
    f = np.broadcast_to(np.float32(focal_length), batch_shape)
    return Camera(rotation=eye, translation=trans, focal_length=f,
                  center=center)


def camera_from_params_np(params9, img_d0: float, img_d1: float,
                          focal_length: float = FOCAL_LENGTH) -> Camera:
    """Numpy twin of camera_from_params for HOST-SIDE rendering/eval prep
    (no eager device dispatches — see rot6d_to_rotmat_np). Same 9-parameter
    encoding and principal-point convention."""
    import numpy as np
    from .rotations import rot6d_to_rotmat_np
    params9 = np.asarray(params9, np.float32)
    batch_shape = params9.shape[:-1]
    center = np.broadcast_to(
        np.array([img_d0 // 2, img_d1 // 2], np.float32),
        batch_shape + (2,))
    f = np.broadcast_to(np.float32(focal_length), batch_shape)
    return Camera(rotation=rot6d_to_rotmat_np(params9[..., 3:]),
                  translation=params9[..., :3], focal_length=f, center=center)
