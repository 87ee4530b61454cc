"""Utils tests: config merge, experiment dirs, checkpoint round-trip."""

import argparse
import json
import os

import jax
import numpy as np
import pytest

from nemo_tpu.utils import (create_latest_child_dir, dataclass_from_namespace,
                            load_fit_state, merge_config, save_fit_state,
                            MetricWriter, Timer)


class TestConfigMerge:
    def _parser(self):
        p = argparse.ArgumentParser()
        p.add_argument("--default_config", type=str, default="")
        p.add_argument("--alpha", type=int, default=1)
        p.add_argument("--beta", type=str, default="x")
        return p

    def test_yaml_overrides_defaults(self, tmp_path):
        cfg = tmp_path / "c.yml"
        cfg.write_text("alpha: 5\n")
        args = merge_config(self._parser(),
                            ["--default_config", str(cfg)])
        assert args.alpha == 5
        assert args.beta == "x"

    def test_explicit_cli_beats_yaml(self, tmp_path):
        cfg = tmp_path / "c.yml"
        cfg.write_text("alpha: 5\nbeta: fromyaml\n")
        args = merge_config(self._parser(),
                            ["--default_config", str(cfg), "--alpha", "9"])
        assert args.alpha == 9          # explicitly typed -> wins
        assert args.beta == "fromyaml"  # not typed -> yaml wins

    def test_no_yaml_plain_args(self):
        args = merge_config(self._parser(), ["--alpha", "3"])
        assert args.alpha == 3

    def test_dataclass_from_namespace_ignores_unknown(self):
        from nemo_tpu.fit import NemoConfig
        ns = argparse.Namespace(h_dim=77, bogus_flag=1, loss="mse")
        cfg = dataclass_from_namespace(NemoConfig, ns)
        assert cfg.h_dim == 77 and cfg.loss == "mse"


class TestExpDirs:
    def test_auto_increment(self, tmp_path):
        d0 = create_latest_child_dir(str(tmp_path / "exp"))
        d1 = create_latest_child_dir(str(tmp_path / "exp"))
        assert d0.endswith("000000") and d1.endswith("000001")

    def test_metric_writer(self, tmp_path):
        p = str(tmp_path / "m.jsonl")
        w = MetricWriter(p)
        w.write({"step": 1, "loss": np.float32(2.5)})
        w.close()
        rec = json.loads(open(p).read().strip())
        assert rec == {"step": 1, "loss": 2.5}

    def test_timer_records(self):
        with Timer("x", quiet=True) as t:
            pass
        assert t.duration is not None and t.duration >= 0


class TestCheckpoint:
    def test_roundtrip_exact(self, tmp_path):
        from nemo_tpu.body import synthetic_smpl_model
        from nemo_tpu.data import synthetic_problem
        from nemo_tpu.fit import NemoConfig, NemoFitter, build_assets

        model = synthetic_smpl_model(num_vertices=150, seed=0)
        bundle, _ = synthetic_problem(model, num_views=2, num_frames=6)
        cfg = NemoConfig(model_version=2, h_dim=8, instance_code_size=2,
                         phase_rbf_dim=4, monotonic_network_n_nodes=3,
                         batch_size=4, weight_gmm_loss=0.0, label_type="gt")
        assets = build_assets(bundle, model, cfg)
        fitter = NemoFitter(cfg, assets, seed=3)
        fitter.fit(steps=3, chunk=3)

        ck = str(tmp_path / "ck")
        save_fit_state(ck, fitter.state, cfg)

        fresh = NemoFitter(cfg, assets, seed=99)
        restored = load_fit_state(ck, fresh.state)
        for a, b in zip(jax.tree_util.tree_leaves(fitter.state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(fitter.state.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert restored.step == fitter.state.step

        # saved config is readable
        from nemo_tpu.utils import load_saved_config
        saved = load_saved_config(ck)
        assert saved["h_dim"] == 8


class TestOrbaxCheckpoint:
    def test_roundtrip(self, tmp_path):
        import pytest
        pytest.importorskip("orbax.checkpoint")
        from nemo_tpu.body import synthetic_smpl_model
        from nemo_tpu.data import synthetic_problem
        from nemo_tpu.fit import NemoConfig, NemoFitter, build_assets
        from nemo_tpu.utils import load_fit_state_orbax, save_fit_state_orbax

        model = synthetic_smpl_model(num_vertices=120, seed=0)
        bundle, _ = synthetic_problem(model, num_views=2, num_frames=5)
        cfg = NemoConfig(model_version=1, h_dim=8, instance_code_size=0,
                         monotonic_network_n_nodes=3, batch_size=4,
                         weight_gmm_loss=0.0, label_type="gt")
        assets = build_assets(bundle, model, cfg)
        fitter = NemoFitter(cfg, assets, seed=5)
        fitter.fit(steps=2, chunk=2)
        ck = str(tmp_path / "orbax_ck")
        save_fit_state_orbax(ck, fitter.state, cfg)
        fresh = NemoFitter(cfg, assets, seed=42)
        restored = load_fit_state_orbax(ck, fresh.state)
        for a, b in zip(jax.tree_util.tree_leaves(fitter.state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert restored.step == 2
