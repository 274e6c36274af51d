"""Blocking queues + stage-graph runner for the pipelined codecs.

The reference pipelines its codec steps as daemon threads joined by tiny
condition-variable queues (``shared/notifying_queue.py``, used by
``codec_pipeline.py:42-54`` / ``codec_parallel.py:34-43``) so GPU NN stages
overlap CPU entropy/G-PCC stages. The TPU build keeps that architecture —
JAX's async dispatch overlaps device compute with host work within a stage,
and the stage threads overlap host-bound steps across segments.
"""

from __future__ import annotations

import threading
import traceback
from typing import Any, Callable, Optional


class NotifyingQueue:
    """Unbounded blocking FIFO (reference ``shared/notifying_queue.py``)."""

    def __init__(self):
        self._items: list[Any] = []
        self._cv = threading.Condition()

    def put(self, item: Any) -> None:
        with self._cv:
            self._items.append(item)
            self._cv.notify()

    def get(self, timeout: Optional[float] = None) -> Any:
        with self._cv:
            if not self._cv.wait_for(lambda: self._items, timeout=timeout):
                raise TimeoutError("queue get timed out")
            return self._items.pop(0)

    def __len__(self) -> int:
        with self._cv:
            return len(self._items)


class Stage(threading.Thread):
    """Daemon worker: pull from ``inq``, apply ``fn``, push to ``outq``.

    Exceptions are forwarded downstream as ``StageError`` items so a failing
    segment surfaces at the join instead of silently stalling the pipeline
    (a gap the reference's TODOs acknowledge, SURVEY.md §5)."""

    def __init__(self, name: str, fn: Callable[[Any], Any], inq: NotifyingQueue, outq: NotifyingQueue):
        super().__init__(name=name, daemon=True)
        self.fn = fn
        self.inq = inq
        self.outq = outq
        self.start()

    def run(self):
        while True:
            item = self.inq.get()
            if isinstance(item, StageError):
                self.outq.put(item)
                continue
            try:
                self.outq.put(self.fn(item))
            except Exception as e:  # noqa: BLE001
                self.outq.put(StageError(e, traceback.format_exc()))


class StageError:
    def __init__(self, exc: Exception, tb: str):
        self.exc = exc
        self.tb = tb

    def reraise(self):
        raise RuntimeError(f"pipeline stage failed:\n{self.tb}") from self.exc
