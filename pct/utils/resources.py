"""Host resource monitoring (the reference suggests jtop/jetson_stats for its
Jetsons, reference ``README.md:127-136``): a dependency-free /proc sampler
that appends cpu%, rss, and load to a CSV on an interval. TPU-side device
metrics come from ``jax.profiler`` traces (see ``pct.utils.telemetry``);
this covers the host processes (entropy coding, octree coding, services)."""

from __future__ import annotations

import os
import threading
import time

from pct.utils.telemetry import append_csv_row


def _read_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:8]))
    idle = vals[3] + vals[4]
    total = sum(vals)
    return idle, total


def _read_self_rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1])
    return 0


class ResourceMonitor:
    def __init__(self, csv_path: str, interval: float = 1.0):
        self.csv_path = csv_path
        self.interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "ResourceMonitor":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self):
        prev_idle, prev_total = _read_stat()
        while not self._stop.wait(self.interval):
            idle, total = _read_stat()
            didle, dtotal = idle - prev_idle, total - prev_total
            prev_idle, prev_total = idle, total
            cpu = 100.0 * (1 - didle / dtotal) if dtotal else 0.0
            append_csv_row(
                self.csv_path,
                {
                    "time": time.time(),
                    "cpu_percent": round(cpu, 2),
                    "rss_kb": _read_self_rss_kb(),
                    "load1": os.getloadavg()[0],
                },
            )

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
