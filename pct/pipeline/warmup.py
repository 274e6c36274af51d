"""Bucket-ladder pre-compilation for the live streaming services.

The codec's XLA graphs are keyed on static bucket capacities
(``pct.sparse.block.bucket_size``): a live segment whose point count lands in
a bucket never seen by this process triggers a 20-90 s compile *on the hot
path* — at 10 fps that alone produced 40% segment loss in the round-2
campaign. The fix is the reference systems' standard one (warm every shape at
startup): walk the whole bucket ladder up to the configured maximum with
synthetic surface clouds, running both codec sides, before any live traffic.
Together with the persistent compilation cache the cost is one-time per
machine, not per run.

Decode capacities are static per encode tier (``serial._synth_caps``), so
warming a tier once covers every live segment that lands in it; a
steady-state cold compile can then only come from an encoder capacity
overflow (falls back to full capacity — loud, rare). ``pct.pipeline.serial``
logs any jitted call that both sees a new shape key and takes >1 s, so such
events are loud instead of silent stalls (VERDICT round-2 item 3).
"""

from __future__ import annotations

import time
from typing import Sequence

import numpy as np

from pct.sparse.block import bucket_size


def bucket_ladder(lo: int, hi: int, minimum: int = 256) -> list[int]:
    """All half-octave bucket capacities b with lo <= b <= bucket_size(hi)."""
    out = []
    b = bucket_size(max(lo, 1), minimum)
    top = bucket_size(max(hi, 1), minimum)
    n = b
    while n <= top:
        out.append(n)
        # next half-octave bucket strictly above n
        n = bucket_size(n + 1, minimum)
    return out


def synthetic_gop(
    total_points: int,
    num_frames: int,
    seed: int = 0,
    example_frames: Sequence[dict] | None = None,
) -> list[dict]:
    """A GOP of surface-like frames whose POST-DEDUP total is exactly
    ``total_points`` (so the encoder buckets to bucket_size(total_points)).

    The decoder's phase-2 capacities bucket the GOP's per-stride occupancy
    sums, which depend on the content's stride-shrink ratios — a thin
    analytic shell shrinks ~4x per stride while noisy camera surfaces shrink
    ~2.7x, landing in different buckets. When ``example_frames`` are given
    (e.g. recorded frames), targets are built by spatially CROPPING /
    translate-tiling them, preserving the live density statistics exactly;
    otherwise a +-1-voxel-jittered shell approximates a sensor surface."""
    rng = np.random.default_rng(seed)
    counts = [total_points // num_frames] * num_frames
    counts[0] += total_points - sum(counts)
    frames = []
    examples = list(example_frames) if example_frames else None
    for b, n in enumerate(counts):
        if examples:
            ex = examples[b % len(examples)]
            pts = np.unique(np.asarray(ex["points"], np.int32), axis=0)
            extent = int(np.abs(pts).max()) + 1 if pts.size else 1
            while pts.shape[0] < n:  # tile shifted copies to grow
                shift = np.array([2 * extent, 0, 0], np.int32) * (
                    1 + pts.shape[0] // max(len(ex["points"]), 1)
                )
                pts = np.unique(np.concatenate([pts, pts + shift]), axis=0)
            if pts.shape[0] > n:  # spatial crop keeps local density
                order = np.argsort(pts[:, 2], kind="stable")
                pts = pts[order[:n]]
        else:
            extent = max(64, int(3.0 * np.sqrt(max(n, 1))))
            u = rng.uniform(0, np.pi, 4 * n + 64)
            v = rng.uniform(0, 2 * np.pi, 4 * n + 64)
            r = extent * 0.4
            pts = np.stack(
                [
                    r * np.sin(u) * np.cos(v),
                    r * np.sin(u) * np.sin(v),
                    r * np.cos(u),
                ],
                axis=1,
            )
            pts = (pts + rng.uniform(-1.2, 1.2, pts.shape)).astype(np.int32)
            pts = np.unique(pts, axis=0)
            if pts.shape[0] < n:  # denser shell for tiny extents
                extra = rng.integers(-extent, extent, (2 * n, 3)).astype(np.int32)
                pts = np.unique(np.concatenate([pts, extra]), axis=0)
            pts = pts[rng.permutation(pts.shape[0])[:n]]
        cols = rng.random((pts.shape[0], 3)).astype(np.float32)
        frames.append({"points": pts, "colors": cols})
    return frames


def prewarm_codec(
    encoder,
    decoder=None,
    num_frames: int = 5,
    max_points: int = 120_000,
    settings: Sequence[Sequence[float]] | None = None,
    lossless: bool = False,
    geometry_mode="latent",
    lossless_color_step=0,
    min_points: int = 2048,
    verbose: bool = True,
    example_frames: Sequence[dict] | None = None,
    multi_level: bool = True,
) -> dict:
    """Compile the full bucket ladder on both codec sides.

    ``encoder``/``decoder`` expose the serial/pipelined surfaces
    (``compress(frames, settings, lossless_extra=...)`` /
    ``decompress(level)`` + ``decompress_levels(levels)``). Returns per-tier
    wall times (compile-inclusive; re-runs are cache hits).

    ``multi_level=False`` skips the batched multi-rate decode graphs
    (``decompress_levels``): the live decoder service only ever decodes the
    client's ONE selected representation, and the large fused multi graphs
    are the ones that can crash the v5e TPU worker at big tiers (observed at
    tier 49152 with 3 fused levels) — warm them only for RD tooling that
    actually batches levels (``scripts/eval_rd.py``).
    """
    settings = [list(s) for s in (settings or [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])]
    tiers = bucket_ladder(min_points, max_points)
    report = {}
    t_all = time.time()
    for tier in tiers:
        t0 = time.time()
        # One fill per tier suffices: decode phase-1/2 capacities are static
        # functions of the encode tier (serial._synth_caps derives them from
        # the encoder's own LEVEL_CAP_FRACTIONS, not from live per-stride
        # sums), so any fill inside the tier compiles the tier's graphs.
        for fill in (0.9,):
            count = max(1, int(fill * tier))
            if bucket_size(count) != tier:
                continue
            frames = synthetic_gop(count, num_frames, seed=tier, example_frames=example_frames)
            levels, _ = encoder.compress(
                frames, settings, geometry_mode=geometry_mode,
                lossless_extra=lossless, lossless_color_step=lossless_color_step,
            )
            if decoder is not None:
                # pipelined wrappers expose decompress() only; the batched
                # multi-rate graph lives on the serial core
                serial = getattr(decoder, "_serial", decoder)
                latent = [lv for lv in levels if lv.geometry_mode == "latent"]
                if latent:
                    if multi_level:
                        serial.decompress_levels(latent)
                    serial.decompress(latent[-1])
                for lv in levels:
                    # exact-geometry rungs (lossless/guided) decode solo
                    if lv.geometry_mode != "latent":
                        serial.decompress(lv)
        report[tier] = time.time() - t0
        if verbose:
            print(
                f"[pct] prewarm bucket {tier}: {report[tier]:.1f}s",
                flush=True,
            )
    if verbose:
        print(
            f"[pct] prewarm done: {len(tiers)} buckets x {num_frames} frames "
            f"in {time.time() - t_all:.1f}s",
            flush=True,
        )
    return report
