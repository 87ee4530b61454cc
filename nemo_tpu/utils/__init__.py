"""Utilities: config merge, experiment dirs/timers/metrics, checkpointing."""

from .config import (dataclass_from_namespace, explicit_cli_keys,
                     load_action_config, merge_config)
from .exp import (MetricWriter, Timer, create_latest_child_dir,
                  find_latest_ckpt, profile_trace)
from .checkpoint import (load_fit_state, load_fit_state_orbax,
                         load_saved_config, save_fit_state,
                         save_fit_state_orbax)

__all__ = [
    "dataclass_from_namespace", "explicit_cli_keys", "load_action_config",
    "merge_config", "MetricWriter", "Timer", "create_latest_child_dir",
    "find_latest_ckpt", "profile_trace", "load_fit_state",
    "load_fit_state_orbax", "load_saved_config", "save_fit_state",
    "save_fit_state_orbax",
]
