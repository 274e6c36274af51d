"""Traveling-sideinfo telemetry + CSV logging.

The reference's observability design (SURVEY.md §5): a ``sideinfo`` dict
travels with every segment through every hop, accumulating lifecycle
timestamps and per-step codec timings (E1-E7 / D1-D6); each end appends a
flattened row to a CSV keyed by segment id (reference
``shared/file_utils.py:6-27``, writes at ``media_server.py:166-168`` and
``client.py:156-180``). Same schema here so ``evaluation/plot.py``-style
tooling works across implementations.
"""

from __future__ import annotations

import csv
import os
import threading
import time
from typing import Any, Mapping

_locks: dict[str, threading.Lock] = {}
_locks_guard = threading.Lock()


def stamp(sideinfo: dict, name: str, t: float | None = None) -> dict:
    """Record a lifecycle timestamp (``timestamps_<name>`` column family)."""
    sideinfo.setdefault("timestamps", {})[name] = time.time() if t is None else t
    return sideinfo


def flatten_dict(d: Mapping[str, Any], parent: str = "", sep: str = "_") -> dict:
    """Nested dict -> underscore-joined flat dict (reference CSV schema)."""
    out: dict[str, Any] = {}
    for k, v in d.items():
        key = f"{parent}{sep}{k}" if parent else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_dict(v, key, sep))
        elif isinstance(v, (list, tuple)):
            out[key] = repr(list(v))
        else:
            out[key] = v
    return out


def _lock_for(path: str) -> threading.Lock:
    with _locks_guard:
        return _locks.setdefault(path, threading.Lock())


def append_csv_row(path: str, row: Mapping[str, Any]) -> None:
    """Append one flattened row, writing a header on first write.

    Later rows with extra keys are trimmed to the established header (the
    reference appends blindly; trimming keeps files parsable)."""
    flat = flatten_dict(row)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with _lock_for(path):
        exists = os.path.exists(path) and os.path.getsize(path) > 0
        if exists:
            with open(path, newline="") as f:
                header = next(csv.reader(f))
        else:
            header = list(flat.keys())
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=header, extrasaction="ignore")
            if not exists:
                w.writeheader()
            w.writerow(flat)


class StepTimer:
    """Context-managed named step timer collecting into a dict."""

    def __init__(self, into: dict, name: str):
        self.into = into
        self.name = name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.into[self.name] = self.into.get(self.name, 0.0) + time.time() - self.t0
        return False
