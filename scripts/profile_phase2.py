"""Op-level profile of the latent decode's device graphs at a given scale.

Runs one warm decode under ``jax.profiler.trace`` and aggregates the XLA
device-op durations from the trace, so the decode wall's remaining terms
are attributed by MEASUREMENT (the round-5 rule: the descriptor-cost model
under-predicted the family-synthesis wall, so rank levers by trace, not by
estimates).

Usage: python scripts/profile_phase2.py [--points 400000] [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def aggregate_trace(trace_dir: str, top: int) -> list[tuple[str, float, int]]:
    """Sum device-lane event durations by name from the trace_viewer json."""
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing "TPU" / "Device" (host lanes carry
    # python/runtime noise)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if any(k in name for k in ("TPU", "Device", "/device:", "XLA")):
                dev_pids.add(e["pid"])
    agg: dict[str, list[float]] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        # XLA fusions carry the source op path in args (tf_op / long_name) —
        # fold it into the key so fusion.NN becomes attributable
        a = e.get("args", {}) or {}
        src = a.get("tf_op") or a.get("long_name") or a.get("name") or ""
        if src:
            name = f"{name} <- {src}"
        agg.setdefault(name, [0.0, 0])
        agg[name][0] += e.get("dur", 0.0) / 1e3  # us -> ms
        agg[name][1] += 1
    rows = sorted(
        ((k, v[0], v[1]) for k, v in agg.items()), key=lambda r: -r[1]
    )
    return rows[:top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=400_000)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--encode", action="store_true", help="also trace the encode graph")
    ap.add_argument("--trace-dir", default="/tmp/pct_phase2_trace")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pct.utils.jaxcache import setup_compile_cache

    setup_compile_cache(cpu=args.cpu)
    print("devices:", jax.devices(), flush=True)

    from pct.models import checkpoint
    from pct.pipeline import SerialDecoder, SerialEncoder
    from scripts.bench_scale import surface_cloud

    model, params, tables = checkpoint.load_with_tables("checkpoints/demo.msgpack")
    enc = SerialEncoder(model, params, tables)
    dec = SerialDecoder(model, params, tables, cap_mode="counted")
    rng = np.random.default_rng(0)
    frames = [surface_cloud(rng, args.points)]
    levels, _ = enc.compress(frames, [[1.0, 1.0]])
    blob = levels[0].pack()
    out, info = dec.decompress(blob)  # warm every graph
    t0 = time.time()
    out, info = dec.decompress(blob)
    print(f"warm decode {time.time() - t0:.3f}s; steps:", flush=True)
    print(json.dumps({k: round(v, 4) for k, v in info["time_measurements"].items()}))

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        out, info = dec.decompress(blob)
    print("traced decode steps:", flush=True)
    print(json.dumps({k: round(v, 4) for k, v in info["time_measurements"].items()}))
    for name, ms, cnt in aggregate_trace(args.trace_dir, args.top):
        print(json.dumps({"op": name[:160], "ms": round(ms, 2), "n": cnt}), flush=True)

    if args.encode:
        enc_dir = args.trace_dir + "_enc"
        os.makedirs(enc_dir, exist_ok=True)
        with jax.profiler.trace(enc_dir):
            levels, info = enc.compress(frames, [[1.0, 1.0]])
        print("traced encode steps:", flush=True)
        print(json.dumps({k: round(v, 4) for k, v in info["time_measurements"].items()}))
        for name, ms, cnt in aggregate_trace(enc_dir, args.top):
            print(json.dumps({"op": name[:160], "ms": round(ms, 2), "n": cnt}), flush=True)


if __name__ == "__main__":
    main()
