"""Initializer model tests: ResNet-50 parity vs torchvision, GRU vs torch,
HMR head refinement semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemo_tpu.body import synthetic_smpl_model
from nemo_tpu.models import (
    convert_torch_gru, convert_torch_resnet50, gru_cell, hmr_forward,
    hmr_head, init_gru, init_hmr_head, init_resnet50, resnet50_features,
    temporal_encoder,
)


class TestResNet:
    def test_shapes_random_weights(self):
        p = init_resnet50(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 224, 224, 3))
        out = resnet50_features(p, x)
        assert out.shape == (1, 2048)

    @pytest.mark.slow
    def test_matches_torchvision(self):
        """Golden: converted torchvision weights reproduce torch's output."""
        import torch
        torchvision = pytest.importorskip("torchvision")
        tm = torchvision.models.resnet50(weights=None)
        tm.eval()
        # randomize BN stats so the test catches stat-mapping bugs
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
        sd = tm.state_dict()
        p = convert_torch_resnet50(sd)

        x = torch.randn(2, 3, 64, 64)  # smaller than 224 for test speed
        with torch.no_grad():
            f = tm.conv1(x)
            f = tm.relu(tm.bn1(f))
            f = tm.maxpool(f)
            f = tm.layer4(tm.layer3(tm.layer2(tm.layer1(f))))
            want = f.mean(dim=(2, 3)).numpy()

        got = np.asarray(resnet50_features(
            p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, atol=2e-3)


class TestGRU:
    def test_matches_torch_gru(self):
        import torch
        T, B, H = 5, 2, 32
        tg = torch.nn.GRU(input_size=H, hidden_size=H, num_layers=1)
        sd = {f"encoder.gru.{k}": v for k, v in tg.state_dict().items()}
        p = convert_torch_gru(sd)
        x = torch.randn(T, B, H)
        with torch.no_grad():
            want, _ = tg(x)
        got = np.asarray(temporal_encoder(
            p, jnp.asarray(x.numpy().transpose(1, 0, 2)),
            use_residual=False))
        np.testing.assert_allclose(got, want.numpy().transpose(1, 0, 2),
                                   atol=2e-4)

    def test_residual_connection(self):
        p = init_gru(jax.random.PRNGKey(0), 16, 16)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
        with_res = temporal_encoder(p, x, use_residual=True)
        without = temporal_encoder(p, x, use_residual=False)
        np.testing.assert_allclose(np.asarray(with_res - without),
                                   np.asarray(x), atol=1e-5)


class TestHMRHead:
    def test_refinement_starts_at_mean(self):
        p = init_hmr_head(jax.random.PRNGKey(0), feat_dim=64)
        feats = jnp.zeros((3, 64))
        pose, shape, cam = hmr_head(p, feats, n_iter=0)
        np.testing.assert_allclose(np.asarray(pose),
                                   np.broadcast_to(np.asarray(p["init_pose"]),
                                                   (3, 144)))

    def test_full_forward_on_synthetic_smpl(self):
        smpl = synthetic_smpl_model(num_vertices=300, seed=0)
        backbone = init_resnet50(jax.random.PRNGKey(0))
        head = init_hmr_head(jax.random.PRNGKey(1))
        img = jnp.zeros((1, 64, 64, 3))
        out = hmr_forward(backbone, head, smpl, img)
        assert out["theta"].shape == (1, 85)
        assert out["kp_3d"].shape == (1, 49, 3)
        assert out["kp_2d"].shape == (1, 49, 2)
        assert np.isfinite(np.asarray(out["theta"])).all()
