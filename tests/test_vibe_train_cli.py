"""Smoke test for the VIBE train CLI (VIBE/train.py + lib/core/config.py
counterpart)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from nemo_tpu.cli.vibe_train import CFG_DEFAULTS, load_cfg, main


class TestConfig:
    def test_defaults_and_yaml_merge(self, tmp_path):
        cfg = load_cfg("")
        assert cfg["LOSS.KP_2D_W"] == 60.0
        assert cfg["TRAIN.MOT_DISCR.FEATURE_POOL"] == "concat"

        y = tmp_path / "cfg.yaml"
        # the shipped reference config shape (VIBE/configs/config.yaml)
        y.write_text(
            "TRAIN:\n  BATCH_SIZE: 8\n  MOT_DISCR:\n"
            "    FEATURE_POOL: attention\n    NUM_LAYERS: 2\n"
            "    ATT:\n      LAYERS: 3\nLOSS:\n  KP_2D_W: 300.0\n")
        cfg = load_cfg(str(y))
        assert cfg["TRAIN.BATCH_SIZE"] == 8
        assert cfg["TRAIN.MOT_DISCR.FEATURE_POOL"] == "attention"
        assert cfg["TRAIN.MOT_DISCR.ATT.LAYERS"] == 3
        assert cfg["LOSS.KP_2D_W"] == 300.0
        # untouched keys keep defaults
        assert cfg["TRAIN.GEN_LR"] == CFG_DEFAULTS["TRAIN.GEN_LR"]


@pytest.mark.slow
class TestTrainCliSmoke:
    def test_synthetic_run(self, tmp_path):
        y = tmp_path / "cfg.yaml"
        y.write_text("TRAIN:\n  BATCH_SIZE: 4\nDATASET:\n  SEQLEN: 4\n")
        out = str(tmp_path / "run")
        rc = main(["--cfg", str(y), "--out", out, "--synthetic", "8",
                   "--epochs", "1", "--iters_per_epoch", "2",
                   "--feat_size", "64", "--debug_viz_every", "1"])
        assert rc == 0
        ckpt = os.path.join(out, "vibe_train_state")
        assert os.path.isdir(ckpt)
        with np.load(os.path.join(ckpt, "gen.npz")) as d:
            assert any("gru" in k for k in d.files)
        assert os.path.exists(os.path.join(out, "debug_epoch0000.png"))
