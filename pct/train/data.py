"""Training input pipeline: pre-canonicalized frame cache + batch sampler.

The reference demo trains nothing (weights come from the external
Unified-Point-Cloud-Compression trainer); pct trains in-framework, and at
dataset scale the round-1 path — host-canonicalizing every frame on every
step (``frames_to_training_batch``) — is a wall.  This module canonicalizes
each recorded frame ONCE into fixed-capacity arrays and memmaps them, so a
training step is a pure integer-index gather into host RAM followed by one
device_put.

Cache layout (npz, one per (data dirs, capacity) signature):
  coords [F, cap, 4] int16   — canonical (batch=0, x, y, z), padded rows 0
  colors [F, cap, 3] uint8   — RGB in [0,255]
  mask   [F, cap]    bool
  counts [F]         int32

Frames larger than ``capacity`` are random-subsampled (deterministic per
frame index) rather than prefix-truncated — a prefix slice of a canonically
sorted cloud is a spatial crop, which biases training.
"""

from __future__ import annotations

import hashlib
import os
from typing import Sequence

import numpy as np


def _canonical_frame(pts: np.ndarray, cols: np.ndarray, capacity: int, seed: int):
    """Dedup + canonical-sort one frame into fixed-capacity numpy arrays."""
    pts = np.asarray(pts, np.int32)
    cols = np.asarray(cols, np.float32)
    if cols.max() > 1.5:  # already [0,255]
        cols = cols / 255.0
    n = pts.shape[0]
    if n > capacity:
        sel = np.random.default_rng(seed).choice(n, capacity, replace=False)
        pts, cols = pts[sel], cols[sel]
        n = capacity
    # canonical lexicographic order on (x, y, z) then dedup (batch col is 0)
    order = np.lexsort((pts[:, 2], pts[:, 1], pts[:, 0]))
    pts, cols = pts[order], cols[order]
    keep = np.ones(n, bool)
    keep[1:] = np.any(pts[1:] != pts[:-1], axis=1)
    pts, cols = pts[keep], cols[keep]
    n = pts.shape[0]
    coords = np.zeros((capacity, 4), np.int16)
    colors = np.zeros((capacity, 3), np.uint8)
    mask = np.zeros(capacity, bool)
    coords[:n, 1:] = pts.astype(np.int16)
    colors[:n] = np.clip(np.round(cols * 255.0), 0, 255).astype(np.uint8)
    mask[:n] = True
    return coords, colors, mask, n


def build_cache(
    data_dirs: Sequence[str],
    capacity: int,
    cache_dir: str = "/root/repo/.data_cache",
    limit_per_dir: int = 0,
) -> str:
    """Canonicalize all frames from ``data_dirs`` into one npz cache; returns
    its path (reused if it already exists)."""
    from pct.streaming.capturer import load_recorded_frames

    sig = hashlib.sha1(
        ("|".join(sorted(data_dirs)) + f":{capacity}:{limit_per_dir}").encode()
    ).hexdigest()[:12]
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"frames_{sig}.npz")
    if os.path.exists(path):
        return path

    coords, colors, masks, counts = [], [], [], []
    for d in data_dirs:
        recs = load_recorded_frames(d)
        if limit_per_dir:
            recs = recs[:limit_per_dir]
        for i, fr in enumerate(recs):
            c, col, m, n = _canonical_frame(
                fr["points"], fr["colors"], capacity, seed=len(coords)
            )
            coords.append(c)
            colors.append(col)
            masks.append(m)
            counts.append(n)
    np.savez(
        path + ".tmp.npz",
        coords=np.stack(coords),
        colors=np.stack(colors),
        mask=np.stack(masks),
        counts=np.asarray(counts, np.int32),
    )
    os.replace(path + ".tmp.npz", path)
    return path


class FrameDataset:
    """Random-access canonical frames; ``sample(rng, batch)`` returns numpy
    arrays ready for one ``device_put`` (coords int32 [B,cap,4], feats
    float32 [B,cap,4] with the constant-1 channel, mask bool [B,cap])."""

    def __init__(self, cache_path: str):
        z = np.load(cache_path, mmap_mode="r")
        self.coords = z["coords"]
        self.colors = z["colors"]
        self.mask = z["mask"]
        self.counts = z["counts"]

    def __len__(self) -> int:
        return self.coords.shape[0]

    def sample(self, rng: np.random.Generator, batch: int):
        idx = rng.integers(0, len(self), batch)
        return self.get(idx)

    def get(self, idx):
        coords = np.ascontiguousarray(self.coords[idx]).astype(np.int32)
        cols = np.ascontiguousarray(self.colors[idx]).astype(np.float32) / 255.0
        mask = np.ascontiguousarray(self.mask[idx])
        feats = np.concatenate([mask[..., None].astype(np.float32), cols], axis=-1)
        return coords, feats, mask
