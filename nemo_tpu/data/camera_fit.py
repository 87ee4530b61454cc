"""Ground-truth camera fitting: recover world->camera extrinsics from mocap.

Behavioral reference: VIBE/lib/data_utils/nemomocap_utils.py:111-211
(re_opt_camera_extrinsics) — optimize a 9-param camera (3 trans + 6D rot)
so projected mocap GT 3D joints match annotated 2D, using a stable joint
subset (ankles/shoulders), Adam lr 1e-2 for ~3000 steps. Produces the
opt_cam_IMG_*.pt initialization consumed by the data layer.

TPU-native: the whole optimization is one jitted lax.scan.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..geometry.camera import camera_from_params, perspective_projection

# Stable joints for camera fitting (OP indices: RAnkle, LAnkle, RShoulder,
# LShoulder, RHip, LHip — the reference's J_idxs selection).
DEFAULT_FIT_JOINTS = (11, 14, 2, 5, 9, 12)


def fit_gt_camera(joints3d: jnp.ndarray, joints2d: jnp.ndarray,
                  img_d0: float, img_d1: float,
                  focal_length: float = 5000.0,
                  joint_idx: Sequence[int] = DEFAULT_FIT_JOINTS,
                  num_steps: int = 3000, lr: float = 1e-2,
                  init: Optional[jnp.ndarray] = None
                  ) -> Dict[str, jnp.ndarray]:
    """Fit one camera to (F, K, 3) world joints vs (F, K, >=2) 2D points.

    joints2d[..., 2] (if present) weights the residuals. Returns
    {'cam9', 'loss'} with the (9,) camera encoding and loss history.
    """
    J3 = joints3d[:, list(joint_idx)]
    J2 = joints2d[:, list(joint_idx)]
    conf = J2[..., 2] if J2.shape[-1] > 2 else jnp.ones(J2.shape[:-1])
    target = J2[..., :2]

    if init is None:
        init = jnp.array([0., 0., 2 * focal_length / img_d0,
                          1., 0., 0., 1., 0., 0.])

    def loss_fn(cam9):
        cam = camera_from_params(cam9[None], img_d0, img_d1, focal_length)
        proj = perspective_projection(
            J3, jnp.broadcast_to(cam.rotation, (J3.shape[0], 3, 3)),
            jnp.broadcast_to(cam.translation, (J3.shape[0], 3)),
            focal_length,
            jnp.broadcast_to(cam.center, (J3.shape[0], 2)))
        return (conf[..., None] * (proj - target) ** 2).mean()

    opt = optax.adam(lr)

    def step(carry, _):
        cam9, state = carry
        loss, g = jax.value_and_grad(loss_fn)(cam9)
        upd, state = opt.update(g, state)
        return (optax.apply_updates(cam9, upd), state), loss

    (cam9, _), losses = jax.lax.scan(step, (init, opt.init(init)), None,
                                     length=num_steps)
    return {"cam9": cam9, "loss": losses}
