"""Regenerate the PBR-shading golden image (tests/goldens/pbr_shading.npz).

Run on the forced-CPU backend so the golden is byte-stable across boxes:

    python scripts/make_shading_golden.py

The golden pins render_pretty's reference-light-rig output
(hmr/renderer.py:100-160 emulation: ambient 0.5 + triple headlight +
metallic-roughness 0.2/1.0) on a deterministic synthetic body. Tests
compare at atol 2e-5 (CPU f32 reproducibility, not bit-exactness).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def build():
    import jax.numpy as jnp

    from nemo_tpu.body import synthetic_smpl_model
    from nemo_tpu.body.smpl import smpl_forward
    from nemo_tpu.geometry.camera import Camera
    from nemo_tpu.render import render_pretty

    smpl = synthetic_smpl_model(num_vertices=200, seed=0)
    rng = np.random.RandomState(0)
    pose = (0.1 * rng.randn(1, 69)).astype(np.float32)
    orient = np.zeros((1, 3), np.float32)
    betas = np.zeros((1, 10), np.float32)
    verts, _ = smpl_forward(smpl, jnp.asarray(betas), jnp.asarray(pose),
                            jnp.asarray(orient), pose2rot=True)
    v = np.asarray(verts[0])
    v = v + np.array([0.0, 0.0, 6.0], np.float32)
    cam = Camera(rotation=jnp.eye(3), translation=jnp.zeros(3),
                 focal_length=jnp.asarray(120.0),
                 center=jnp.asarray([24.0, 24.0]))
    img = render_pretty([jnp.asarray(v)], smpl.faces, cam, (48, 48))
    return np.asarray(img, np.float32)


if __name__ == "__main__":
    img = build()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "pbr_shading.npz")
    np.savez_compressed(path, img=img)
    print(f"wrote {path}  mean={img.mean():.4f}")
