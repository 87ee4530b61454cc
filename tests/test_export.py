"""Motion-export round trip: fit -> export -> reload -> same joints.

The exporter is the bpy-free equivalent of the reference's FBX payload
(/root/reference/VIBE/lib/utils/fbx_output.py:92-340): per-frame axis-angle
SMPL pose + root translation + betas (+ per-view cameras). The round trip
asserts a consumer can rebuild the motion from nothing but the documented
payload fields.
"""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.body import synthetic_smpl_model
from nemo_tpu.body.smpl import smpl_forward
from nemo_tpu.cli.export import export_motion, load_motion, main, save_motion
from nemo_tpu.data import synthetic_problem
from nemo_tpu.fit import NemoConfig, NemoFitter, build_assets
from nemo_tpu.utils import save_fit_state

_CFG = dict(model_version=2, h_dim=32, instance_code_size=4,
            phase_rbf_dim=8, rbf_kernel="quadratic",
            monotonic_network_n_nodes=8, batch_size=16,
            n_steps=4, warmup_step=0, opt_cam_step=0,
            weight_gmm_loss=0.0, weight_vp_loss=0.0, weight_vp_z_loss=0.0)


def _tiny_fit():
    model = synthetic_smpl_model(num_vertices=200, seed=0)
    cfg = NemoConfig(**_CFG)
    bundle, _ = synthetic_problem(model, num_views=3, num_frames=10, seed=0)
    assets = build_assets(bundle, model, cfg)
    fitter = NemoFitter(cfg, assets, seed=0)
    fitter.fit(steps=2, chunk=2)
    return model, cfg, bundle, assets, fitter


def test_export_roundtrip_joints(tmp_path):
    model, cfg, bundle, assets, fitter = _tiny_fit()
    payload = export_motion(fitter.state.params, cfg, assets, fps=25.0)

    V, F = assets.num_views, assets.num_frames
    assert payload["pose"].shape == (V, F, 72)
    assert payload["trans"].shape == (V, F, 3)
    assert payload["betas"].shape == (10,)
    assert payload["cameras"].shape == (V, 9)
    assert payload["cam_rotation"].shape == (V, 3, 3)
    assert float(payload["fps"]) == 25.0

    path = osp.join(tmp_path, "motion.npz")
    save_motion(path, payload, also_json=True)
    back = load_motion(path)

    # reconstruct the motion from nothing but the documented payload fields
    pose = back["pose"].reshape(V * F, 72)
    trans = back["trans"].reshape(V * F, 3)
    _, j49 = smpl_forward(model, jnp.asarray(back["betas"])[None],
                          jnp.asarray(pose[:, 3:]), jnp.asarray(pose[:, :3]),
                          pose2rot=True, want_vertices=False,
                          transl=jnp.asarray(trans))
    np.testing.assert_allclose(np.asarray(j49[:, :15]).reshape(V, F, 15, 3),
                               back["joints15"], atol=2e-4)

    # the json sidecar carries the same payload
    back_json = load_motion(osp.join(tmp_path, "motion.json"))
    np.testing.assert_allclose(back_json["pose"], back["pose"], atol=1e-6)


def test_export_cli_from_checkpoint(tmp_path):
    model, cfg, bundle, assets, fitter = _tiny_fit()
    ckpt = osp.join(tmp_path, "ckpt")
    save_fit_state(ckpt, fitter.state, cfg)

    out = osp.join(tmp_path, "motion.npz")
    assert main(["--load_ckpt_path", ckpt, "--synthetic_assets",
                 "--num_views", "3", "--num_frames", "10",
                 "--out", out]) == 0

    back = load_motion(out)
    # the CLI's rebuilt synthetic assets use the full-size synthetic SMPL,
    # but the motion payload itself must match a direct export from the
    # restored params at the same topology
    direct = export_motion(fitter.state.params, cfg, assets)
    np.testing.assert_allclose(back["pose"], direct["pose"], atol=1e-5)
    np.testing.assert_allclose(back["trans"], direct["trans"], atol=1e-5)
    np.testing.assert_allclose(back["cameras"], direct["cameras"], atol=1e-6)
