"""Capture service: camera / recording / playback frame sources.

Reference: ``sender/capturer/capturer.py`` — grabs XYZRGBA frames from a ZED
camera, voxel-downsamples/quantizes/caps them, and PUSHes
``{points, colors, timestamp}`` to the encoder. Three modes:

- ``demo``      — live camera (requires the ZED SDK; gated, optional),
- ``recording`` — live camera + dump each frame to ``frame_%05d.pkl``,
- ``playback``  — replay a recorded ``.pkl`` directory with timestamps
  rebased to now and sleep-to-schedule pacing (reference
  ``capturer.py:148-173``) — the deterministic, hardware-free source that
  doubles as the test harness input.

Voxelization math lives in :mod:`pct.sparse.voxelize` (device-capable); the
playback path replays already-voxelized int16 frames untouched.
"""

from __future__ import annotations

import glob
import os
import pickle
import threading
import time
from typing import Iterator, Optional

import numpy as np

from pct.config import Config
from pct.streaming.transport import PushSocket


def load_recorded_frames(path: str) -> list[dict]:
    frames = []
    for f in sorted(glob.glob(os.path.join(path, "*.pkl"))):
        with open(f, "rb") as fh:
            d = pickle.load(fh)
        frames.append(
            {
                "points": np.asarray(d["points"], np.int16),
                "colors": np.asarray(d["colors"], np.float32),
                "timestamp": float(d["timestamp"]),
            }
        )
    if not frames:
        raise FileNotFoundError(f"no recorded frames under {path}")
    return frames


class Capturer:
    def __init__(self, config: Optional[Config] = None):
        self.config = config or Config.load()
        self.mode = self.config.get("mode", "playback")
        self.socket = PushSocket(self.config["encoder_address"])
        self._stop = threading.Event()
        self.voxel_size = float(self.config.get("voxel_size", 0.005))
        self.max_points = int(self.config.get("max_points", 150_000))
        self.recording_path = self.config.get("recording_path", "")

    # ------------------------------------------------------------------
    def playback_frames(self, loop: bool = True) -> Iterator[dict]:
        """Replay recorded frames, rebasing timestamps to wall clock and
        sleeping to the original schedule."""
        frames = load_recorded_frames(self.recording_path)
        t_rec0 = frames[0]["timestamp"]
        while True:
            t_play0 = time.time()
            for fr in frames:
                due = t_play0 + (fr["timestamp"] - t_rec0)
                delay = due - time.time()
                if delay > 0:
                    time.sleep(delay)
                yield {
                    "points": fr["points"],
                    "colors": fr["colors"],
                    "timestamp": due,
                }
            if not loop:
                return

    def camera_frames(self) -> Iterator[dict]:  # pragma: no cover - hardware
        """Live ZED capture (demo/recording modes). Gated on pyzed."""
        try:
            import pyzed.sl as sl  # type: ignore
        except ImportError as e:
            raise RuntimeError(
                "camera mode requires the ZED SDK (pyzed); use mode=playback"
            ) from e
        import jax.numpy as jnp

        from pct.sparse import devoxelize, voxelize_points

        cam = sl.Camera()
        init = sl.InitParameters()
        init.camera_resolution = sl.RESOLUTION.HD720
        init.camera_fps = 15
        init.depth_mode = sl.DEPTH_MODE.ULTRA
        if cam.open(init) != sl.ERROR_CODE.SUCCESS:
            raise RuntimeError("failed to open ZED camera")
        runtime = sl.RuntimeParameters()
        cloud = sl.Mat()
        depth_clip = float(self.config.get("depth_clip", 3.0))
        while True:
            if cam.grab(runtime) != sl.ERROR_CODE.SUCCESS:
                continue
            cam.retrieve_measure(cloud, sl.MEASURE.XYZRGBA)
            data = cloud.get_data().reshape(-1, 4)
            xyz = data[:, :3]
            rgba = data[:, 3].view(np.uint32)
            colors = (
                np.stack(
                    [(rgba >> 0) & 0xFF, (rgba >> 8) & 0xFF, (rgba >> 16) & 0xFF], 1
                ).astype(np.float32)
                / 255.0
            )
            ok = np.isfinite(xyz).all(axis=1) & (np.abs(xyz[:, 2]) < depth_clip)
            blk = voxelize_points(
                jnp.asarray(xyz[ok]),
                jnp.asarray(colors[ok]),
                voxel_size=self.voxel_size,
                max_points=self.max_points,
            )
            pts, cols, mask = devoxelize(blk)
            m = np.asarray(mask)
            yield {
                "points": (np.asarray(pts)[m] / self.voxel_size).astype(np.int16),
                "colors": np.asarray(cols)[m],
                "timestamp": time.time(),
            }

    # ------------------------------------------------------------------
    def record_frame(self, frame: dict, index: int) -> None:
        os.makedirs(self.recording_path, exist_ok=True)
        with open(os.path.join(self.recording_path, f"frame_{index:05d}.pkl"), "wb") as f:
            pickle.dump(frame, f)

    def stop(self) -> None:
        """Graceful shutdown: run() returns after the current frame
        (ADVICE r4 — sender services had no shutdown path)."""
        self._stop.set()

    def run(self, max_frames: Optional[int] = None) -> None:
        source = (
            self.playback_frames() if self.mode == "playback" else self.camera_frames()
        )
        for i, frame in enumerate(source):
            if self._stop.is_set():
                return
            if self.mode == "recording":
                self.record_frame(frame, i)
            self.socket.send(
                {
                    "points": np.asarray(frame["points"], np.int16),
                    "colors": np.asarray(frame["colors"], np.float32),
                    "timestamp": frame["timestamp"],
                }
            )
            if max_frames is not None and i + 1 >= max_frames:
                return


if __name__ == "__main__":
    import sys

    cfg = Config.load(sys.argv[1] if len(sys.argv) > 1 else None)
    Capturer(cfg).run()
