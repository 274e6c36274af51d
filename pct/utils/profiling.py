"""Device-level tracing (SURVEY.md §5: jax.profiler + per-stage host timers).

The per-stage host timers live in the traveling sideinfo
(:mod:`pct.utils.telemetry`); this module adds the device-side view: a
context manager around ``jax.profiler`` producing a TensorBoard/Perfetto
trace directory, plus named ``TraceAnnotation`` spans so codec stages show up
labeled on the device timeline.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/pct_trace", enabled: bool = True):
    """``with device_trace("/tmp/trace"):`` — captures a jax.profiler trace
    (view with TensorBoard or ui.perfetto.dev). No-op when disabled or when
    the backend doesn't support profiling (e.g. relay-attached chips)."""
    if not enabled:
        yield None
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:  # backend without profiler support
        started = False
    try:
        yield log_dir if started else None
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def span(name: str):
    """Named span: shows on the device timeline inside a trace, and falls
    back to a host wall-clock print-nothing timer otherwise."""
    import jax

    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        t0 = time.time()
        yield
        _ = time.time() - t0
