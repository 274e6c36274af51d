"""Global service configuration — the ``shared/config.yaml`` analog.

One flat YAML shared by every service, read with ``cfg.get(key, default)`` in
each service constructor (mirrors the reference's config surface and key
names, reference ``shared/config.yaml`` / SURVEY.md §2.1, so a reference
deployment's config carries over)."""

from __future__ import annotations

import os
from typing import Any

import yaml

DEFAULTS: dict[str, Any] = {
    # capture
    "mode": "playback",  # demo | recording | playback
    "recording_path": "/root/reference/evaluation/data/test",
    "depth_clip": 3.0,
    "voxel_size": 0.005,
    "max_points": 150_000,
    # segmentation / timing
    "target_fps": 5,
    "segment_duration": 1.0,
    "publish_offset": 3.0,
    "request_offset": 0.3,
    "playout_offset": 3.0,
    # codec
    "encoding_settings": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
    "lossless_rep": False,
    "lossless_color_step": 12,  # exact-geometry-rung color-residual step (1/255 units); per-rung list or int
    "geometry_mode": "latent",  # latent | guided | lossless; per-rung list or str
    # pre-compile the codec bucket ladder at service startup (warmup.py)
    "prewarm_buckets": False,
    "prewarm_max_points": 0,  # 0 -> min(max_points, frames*20k)
    "prewarm_example_path": "",  # recorded frames for density-matched shapes
    "decoder_type": "Pipelined",  # Single | Pipelined
    "checkpoint_path": "",  # empty -> deterministic random init
    "init_quality": 1,
    "fixed_quality_mode": True,
    # transport addresses
    "encoder_address": "tcp://127.0.0.1:5555",
    "media_server_address": "tcp://127.0.0.1:5556",
    "decoder_address": "tcp://127.0.0.1:5557",
    "client_address": "tcp://127.0.0.1:5558",
    "visualizer_address": "tcp://127.0.0.1:5559",
    # media server
    "media_server_ip": "127.0.0.1",
    "media_server_port": 8080,
    "media_dir": "/tmp/pct_media",
    "mpd_url": "http://127.0.0.1:8080/manifest.mpd",
    # gui / visualizer
    "gui_port": 5000,
    "websocket_port": 8765,
    "visualizer_http_port": 5173,
    # logging
    "log_dir": "/tmp/pct_logs",
}


class Config(dict):
    @classmethod
    def load(cls, path: str | None = None) -> "Config":
        cfg = cls(DEFAULTS)
        if path and os.path.exists(path):
            with open(path) as f:
                cfg.update(yaml.safe_load(f) or {})
        return cfg

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(dict(self), f, sort_keys=False)
