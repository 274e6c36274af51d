"""fps-vs-points scaling bench: encode/decode wall time from demo scale up
to vox10-scale synthetic segments (VERDICT round-1 item 3).

The recorded demo data tops out at ~100k points/segment; 8iVFB vox10
(~800k points/frame) is not present in the image, so larger operating points
use synthetic *surface-like* clouds (voxelized spherical shell patches with
smooth radial noise — similar occupancy statistics to a scanned human:
levels shrink ~3-4x per stride, matching the codec's capacity model).

Writes one CSV row per operating point:
  points, frames, encode_s, decode_s, fps, enc_device_s, dec_synth_s

Usage: python scripts/bench_scale.py [--out perf_scale.csv] [--points ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def surface_cloud(rng, n_target: int, extent: int = 1024):
    """Voxelized spherical shell patch with smooth noise: ~n_target unique
    voxels on a 2D surface embedded in [0, extent)^3.

    The shell must be CONTIGUOUS like a real scan: radial jitter is an
    ABSOLUTE ~0.6-voxel sigma (plus a smooth structured component), not a
    fraction of the radius — relative noise at vox10 radii (sigma ~6 voxels)
    shredded the surface into dust whose stride-2 occupancy barely shrank,
    silently flipping the codec into its full-capacity overflow graphs
    (round-2/3 scale rows measured THOSE; at 800k points the 1M-row
    full-capacity encode graph OOMs 16 GB HBM at compile). Real captures
    shrink ~3-4x per stride level; this generator now does too (checked by
    the caller's overflow print)."""
    # voxelized shell count ~= 4*pi*r^2 * thickness(~1.5 voxels)
    r = np.sqrt(n_target / (4 * np.pi * 1.5))
    r = float(np.clip(r, 8.0, extent / 2 - extent * 0.13))
    oversample = int(n_target * 4)
    u = rng.uniform(0, np.pi, oversample)
    v = rng.uniform(0, 2 * np.pi, oversample)
    rr = r * (1.0 + 0.08 * np.sin(5 * u) * np.cos(4 * v)) + 0.6 * rng.standard_normal(oversample)
    c = extent / 2
    pts = np.stack(
        [
            rr * np.sin(u) * np.cos(v) + c,
            rr * np.sin(u) * np.sin(v) + c,
            rr * np.cos(u) + c,
        ],
        axis=1,
    )
    pts = np.clip(np.round(pts), 0, extent - 1).astype(np.int32)
    pts = np.unique(pts, axis=0)
    if pts.shape[0] > n_target:
        sel = rng.choice(pts.shape[0], n_target, replace=False)
        pts = pts[sel]
    cols = (0.5 + 0.5 * np.sin(pts * np.array([[0.02, 0.013, 0.007]]))).astype(np.float32)
    return {"points": pts, "colors": cols}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="75000,150000,400000,800000")
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ckpt", default="checkpoints/demo.msgpack")
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--bf16", action="store_true",
        help="A/B: run the feature path (conv gathers + GEMMs) in bfloat16 "
        "(compute_dtype override; the parity-critical hyperprior path stays "
        "float32 by construction — pct/models/unified.py h_s)",
    )
    ap.add_argument(
        "--cap-mode", default="counted", choices=("tier", "counted"),
        help="decoder synthesis capacity policy (counted = tight per-level "
        "buckets, the right policy for offline scale measurement; output is "
        "bit-identical either way — tests/test_counted_caps.py)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pct.utils.jaxcache import setup_compile_cache
    setup_compile_cache(cpu=args.cpu)
    print("devices:", jax.devices(), flush=True)

    from pct.models import ColorModel, UnifiedConfig, checkpoint
    from pct.pipeline import SerialDecoder, SerialEncoder

    if os.path.exists(args.ckpt):
        model, params, tables = checkpoint.load_with_tables(args.ckpt)
        print("checkpoint:", args.ckpt, flush=True)
    else:
        model = ColorModel(UnifiedConfig(channels=(16, 32, 64), latent_channels=64, hyper_channels=32))
        params, tables = model.init_params(jax.random.key(0)), None
    if args.bf16:
        import dataclasses

        model = ColorModel(
            dataclasses.replace(model.config, compute_dtype="bfloat16")
        )
        print("compute_dtype override: bfloat16", flush=True)
    enc = SerialEncoder(model, params, tables)
    dec = SerialDecoder(model, params, tables, cap_mode=args.cap_mode)
    settings = [[1.0, 1.0]]

    rng = np.random.default_rng(0)
    rows = []
    for n in [int(x) for x in args.points.split(",")]:
        frames = [surface_cloud(rng, n) for _ in range(args.frames)]
        tot = sum(f["points"].shape[0] for f in frames)
        t0 = time.time()
        levels, einfo = enc.compress(frames, settings)
        out, dinfo = dec.decompress(levels[0])
        warm = time.time() - t0
        # step columns average over the SAME reps as the walls (the round-4
        # table reported the last rep's step against a mean wall, which let a
        # relay latency spike on the final rep print enc_device_s > encode_s
        # — VERDICT r4 weak #4)
        t_enc = t_dec = dev_enc = dev_syn = 0.0
        for _ in range(args.reps):
            t0 = time.time()
            levels, einfo = enc.compress(frames, settings)
            t_enc += time.time() - t0
            t0 = time.time()
            out, dinfo = dec.decompress(levels[0])
            t_dec += time.time() - t0
            dev_enc += einfo["time_measurements"]["analysis"]
            dev_syn += dinfo["time_measurements"]["synthesis_transform"]
        t_enc /= args.reps
        t_dec /= args.reps
        row = {
            "points": tot,
            "frames": args.frames,
            "encode_s": round(t_enc, 4),
            "decode_s": round(t_dec, 4),
            "fps": round(args.frames / (t_enc + t_dec), 3),
            "decode_fps": round(args.frames / t_dec, 3),
            "enc_device_s": round(dev_enc / args.reps, 4),
            "dec_synth_s": round(dev_syn / args.reps, 4),
            "warmup_s": round(warm, 1),
        }
        assert row["enc_device_s"] <= row["encode_s"] * 1.02, row
        assert row["dec_synth_s"] <= row["decode_s"] * 1.02, row
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        import csv

        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
