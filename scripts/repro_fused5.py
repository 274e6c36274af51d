"""Minimal repro / bisect for the 5-level fused multi-rate decode crash.

Round-3 observation: jitting ``SerialDecoder._phase2_multi`` over 5 quality
levels at demo shapes killed the v5e TPU worker (process restart, no Python
exception); the workaround chunks ``decompress_levels`` at
``MAX_FUSED_LEVELS = 3`` (pct/pipeline/serial.py). This script bisects the
trigger along two axes — fused level count and input scale — so the real
limit can be filed (graph size? HBM? relay message size?) and encoded as a
checked constraint (VERDICT r3 item 6).

Each (nq, points) cell runs in a SUBPROCESS so a worker crash is contained
and reported as the cell's outcome instead of killing the sweep.

Usage: python scripts/repro_fused5.py [--nq 3,4,5,6] [--points 15000,76000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
import numpy as np

nq, n_points = int(sys.argv[1]), int(sys.argv[2])
sys.path.insert(0, {repo!r})
import jax
_cpu = len(sys.argv) > 3 and sys.argv[3] == "cpu"
if _cpu:
    jax.config.update("jax_platforms", "cpu")
from pct.utils.jaxcache import setup_compile_cache
setup_compile_cache(cpu=_cpu)

from pct.models import checkpoint
from pct.pipeline.serial import SerialDecoder, SerialEncoder
from scripts.bench_scale import surface_cloud

model, params, tables = checkpoint.load_with_tables({repo!r} + "/checkpoints/demo.msgpack")
enc = SerialEncoder(model, params, tables)
dec = SerialDecoder(model, params, tables)
dec.MAX_FUSED_LEVELS = 99  # force a single fused graph over all nq levels
rng = np.random.default_rng(0)
frames = [surface_cloud(rng, n_points)]
settings = [[1.0, i / max(nq - 1, 1)] for i in range(nq)]
levels, _ = enc.compress(frames, settings)
t0 = time.time()
outs, _ = dec.decompress_levels(levels)
t_cold = time.time() - t0
t0 = time.time()
outs, _ = dec.decompress_levels(levels)
t_warm = time.time() - t0
assert len(outs) == nq
print(f"CHILD_OK nq={{nq}} points={{n_points}} cold={{t_cold:.1f}}s warm={{t_warm:.3f}}s", flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", default="3,4,5,6")
    ap.add_argument("--points", default="15000,76000")
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    child_src = CHILD.format(repo=REPO)
    results = []
    for n_points in (int(x) for x in args.points.split(",")):
        for nq in (int(x) for x in args.nq.split(",")):
            proc = subprocess.run(
                [sys.executable, "-c", child_src, str(nq), str(n_points)]
                + (["cpu"] if args.cpu else []),
                capture_output=True,
                text=True,
                timeout=args.timeout,
                cwd=REPO,
            )
            ok = proc.returncode == 0 and "CHILD_OK" in proc.stdout
            tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
            row = {
                "nq": nq,
                "points": n_points,
                "ok": ok,
                "rc": proc.returncode,
                "tail": " | ".join(tail)[-400:],
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            if not ok:
                # one level count fails -> larger ones will too at this size
                break
    return results


if __name__ == "__main__":
    main()
