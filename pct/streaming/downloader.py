"""Segment downloader + ABR quality decision.

Reference: ``receiver/client/downloader.py`` — HTTP GET with 3 retries and a
quality decision that is fixed-quality by default (settable from the GUI)
with a bandwidth-threshold ABR hook."""

from __future__ import annotations

import time
import urllib.error
import urllib.request
from typing import Optional


class SegmentDownloader:
    def __init__(
        self,
        base_url: str,
        retries: int = 3,
        fixed_quality_mode: bool = True,
        init_quality: int = 1,
    ):
        self.base_url = base_url.rstrip("/")
        self.retries = retries
        self.fixed_quality_mode = fixed_quality_mode
        self.fixed_quality = init_quality
        self.bandwidth_estimate: float = 0.0  # bits/sec EWMA

    def download_segment(self, rep_id: int, number: int) -> Optional[bytes]:
        url = f"{self.base_url}/ID{rep_id}/segment-{number:015d}.bin"
        for _ in range(self.retries):
            try:
                t0 = time.time()
                with urllib.request.urlopen(url, timeout=5) as r:
                    data = r.read()
                dt = max(time.time() - t0, 1e-4)
                sample = len(data) * 8 / dt
                self.bandwidth_estimate = (
                    sample
                    if self.bandwidth_estimate == 0
                    else 0.8 * self.bandwidth_estimate + 0.2 * sample
                )
                return data
            except (urllib.error.URLError, OSError):
                time.sleep(0.05)
        return None

    def decide_quality(self, representations: list[dict]) -> int:
        """Fixed-quality mode unless disabled; otherwise pick the highest
        representation whose advertised bandwidth fits the EWMA estimate."""
        if self.fixed_quality_mode or not representations:
            return self.fixed_quality
        affordable = [
            int(r["id"])
            for r in representations
            if r["bandwidth"] <= self.bandwidth_estimate * 0.8
        ]
        return max(affordable) if affordable else int(representations[0]["id"])
