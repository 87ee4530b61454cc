"""Experiment directories, timers, structured metric logging.

Behavioral reference: nemo/utils/exp_utils.py:10-57 (Timer, auto-increment
run dirs, latest-checkpoint finder). Adds what the reference lacks
(SURVEY.md §5): a structured JSONL metric writer and a jax profiler hook.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from contextlib import contextmanager
from typing import Any, Dict, Iterator, Optional


class Timer:
    """Wall-clock section timer (exp_utils.py:10-24 semantics)."""

    def __init__(self, name: str, quiet: bool = False):
        self.name = name
        self.quiet = quiet
        self.duration: Optional[float] = None

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.duration = time.time() - self.t0
        if not self.quiet:
            print(f"[timer] {self.name}: {self.duration:.2f}s")


def find_latest_ckpt(ckpt_dir: str) -> str:
    if not osp.exists(ckpt_dir):
        return ""
    names = sorted(os.listdir(ckpt_dir))
    return names[-1] if names else ""


def create_latest_child_dir(exp_dir: str) -> str:
    """Auto-incrementing run directory out/<exp>/000NNN."""
    os.makedirs(exp_dir, exist_ok=True)
    existing = [int(d) for d in os.listdir(exp_dir) if d.isdigit()]
    nxt = (max(existing) + 1) if existing else 0
    child = osp.join(exp_dir, f"{nxt:06d}")
    os.makedirs(child, exist_ok=True)
    return child


class MetricWriter:
    """Append-only JSONL metric log (one record per step/phase)."""

    def __init__(self, path: str):
        os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a")

    def write(self, record: Dict[str, Any]) -> None:
        record = {k: (float(v) if hasattr(v, "item") else v)
                  for k, v in record.items()}
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


@contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
