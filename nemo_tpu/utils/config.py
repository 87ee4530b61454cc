"""Three-layer configuration merge: defaults <- YAML <- explicit CLI.

Behavioral reference: nemo/utils/exp_utils.py:60-81 (process_default_config):
values from a --default_config YAML override script defaults, and only flags
explicitly typed on the command line override the YAML.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from types import SimpleNamespace
from typing import Any, Dict, List, Optional

import yaml


def explicit_cli_keys(argv: Optional[List[str]] = None) -> List[str]:
    """The --flag names the user actually typed (exp_utils invocation
    pattern, scripts/learned_multi_view_recon_nn.py:124-125)."""
    argv = sys.argv[1:] if argv is None else argv
    return [a[2:].split("=")[0] for a in argv if a.startswith("--")]


def merge_config(parser: argparse.ArgumentParser,
                 argv: Optional[List[str]] = None) -> SimpleNamespace:
    """defaults <- YAML(--default_config) <- explicitly-passed CLI flags."""
    args = parser.parse_args(argv)
    passed = explicit_cli_keys(argv)
    cfg = vars(parser.parse_args([]))  # pure defaults
    if getattr(args, "default_config", ""):
        with open(args.default_config) as f:
            yaml_cfg = yaml.safe_load(f) or {}
        cfg.update(yaml_cfg)
    for k in vars(args):
        if k in passed:
            cfg[k] = getattr(args, k)
    return SimpleNamespace(**cfg)


def dataclass_from_namespace(cls, ns, **overrides) -> Any:
    """Populate a dataclass from a namespace, ignoring unknown fields."""
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs: Dict[str, Any] = {k: v for k, v in vars(ns).items()
                              if k in fields}
    kwargs.update({k: v for k, v in overrides.items() if k in fields})
    return cls(**kwargs)


def load_action_config(path: str) -> Dict[str, Any]:
    """Per-action dataset YAML (nemo/config/*.yml: exp_dir, videos.names)."""
    with open(path) as f:
        return yaml.safe_load(f)
