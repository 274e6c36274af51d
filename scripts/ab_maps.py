"""A/B the octree-derived kernel maps against the searched merge-join build.

Times SerialEncoder.compress / SerialDecoder.decompress with
``derived_maps`` on and off (same checkpoint, same input — outputs are
bit-identical by construction, asserted here) at one or more synthetic
operating points. One JSON line per (points, variant).

Usage:
  python scripts/ab_maps.py [--points 76000,150000] [--frames 1] [--reps 3]
      [--cpu] [--ckpt checkpoints/demo.msgpack]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="76000")
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ckpt", default="checkpoints/demo.msgpack")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pct.utils.jaxcache import setup_compile_cache
    setup_compile_cache(cpu=args.cpu)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    from pct.models import checkpoint
    from pct.models.unified import ColorModel
    from pct.pipeline.serial import SerialDecoder, SerialEncoder
    from scripts.bench_scale import surface_cloud

    model, params, tables = checkpoint.load_with_tables(args.ckpt)
    rng = np.random.default_rng(0)

    for n_pts in [int(p) for p in args.points.split(",")]:
        per = n_pts // args.frames
        frames = [surface_cloud(rng, per) for _ in range(args.frames)]
        outputs = {}
        for variant in ("derived", "searched"):
            m = ColorModel(
                dataclasses.replace(model.config, derived_maps=(variant == "derived"))
            )
            enc = SerialEncoder(m, params, tables)
            dec = SerialDecoder(m, params, tables)
            levels, _ = enc.compress(frames, [[0.5, 0.5]])  # warm
            out, _ = dec.decompress(levels[-1])
            t_enc = t_dec = 0.0
            for _ in range(args.reps):
                t0 = time.time()
                levels, _ = enc.compress(frames, [[0.5, 0.5]])
                t_enc += time.time() - t0
                t0 = time.time()
                out, info = dec.decompress(levels[-1])
                t_dec += time.time() - t0
            outputs[variant] = (levels[-1].pack(), out)
            print(
                json.dumps(
                    {
                        "points": n_pts,
                        "frames": args.frames,
                        "variant": variant,
                        "encode_s": round(t_enc / args.reps, 4),
                        "decode_s": round(t_dec / args.reps, 4),
                        "synth_s": round(
                            info["time_measurements"]["synthesis_transform"], 4
                        ),
                    }
                ),
                flush=True,
            )
        assert outputs["derived"][0] == outputs["searched"][0], "bitstreams differ"
        for a, b in zip(outputs["derived"][1], outputs["searched"][1]):
            assert np.array_equal(a["points"], b["points"])
            assert np.array_equal(a["colors"], b["colors"])
        print(f"# {n_pts}: bit-identical across variants", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
