"""Octree-coder rate table: v2 (spatial contexts) vs v1 vs raw, across the
densities the codec actually codes (VERDICT r3 item 8 — rate parity evidence
for the self-defined lossless coder, reference contract
`/root/reference/shared/utils.py:169-240`).

Inputs measured:
  - recorded demo frames (voxelized, the full-resolution lossless-rung set)
  - their stride-8 latent skeletons (coords // 8 — what the latent rungs code)
  - synthetic surface clouds at 76k..800k points on a 1024^3 (vox10) grid
    (`scripts.bench_scale.surface_cloud`, the vox10-density stand-in)

The v1 coder is rebuilt from the last committed gpcc.cpp (git show) so both
run side by side. Output: one JSON line per (input, coder) with bytes and
bits-per-point, plus a summary table on stderr.

tmc13 itself cannot be built in this image (no network); the comparison
anchor is its published lossless-geometry octree rate on 8iVFB vox10
(~1.0 bpp, MPEG CTC results for tmc13 octree, e.g. ISO/IEC JTC1/SC29/WG7
G-PCC CTC reports) — see PERF.md for the measured table.

Usage: python scripts/gpcc_rate.py [--out evaluation/r4/gpcc_rate.csv]
"""

from __future__ import annotations

import argparse
import csv
import ctypes
import glob
import json
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_v1_lib() -> ctypes.CDLL | None:
    """Compile the newest committed v1-context coder to a side .so."""
    revs = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H", "--", "pct/gpcc/cpp/gpcc.cpp"],
        capture_output=True,
        text=True,
    ).stdout.split()
    src = None
    for rev in revs:
        blob = subprocess.run(
            ["git", "-C", REPO, "show", f"{rev}:pct/gpcc/cpp/gpcc.cpp"],
            capture_output=True,
        )
        if blob.returncode == 0 and b"v2" not in blob.stdout[:2048]:
            src = blob
            break
    if src is None:
        return None
    cpp = "/tmp/gpcc_v1.cpp"
    so = "/tmp/libgpcc_v1.so"
    with open(cpp, "wb") as f:
        f.write(src.stdout)
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", so, cpp],
        check=True,
        capture_output=True,
    )
    lib = ctypes.CDLL(so)
    lib.pct_gpcc_encode.restype = ctypes.c_int
    lib.pct_gpcc_decode.restype = ctypes.c_int
    return lib


def lib_encode(lib, xyz: np.ndarray) -> bytes:
    xyz = np.ascontiguousarray(xyz, np.int32)
    capacity = 64 + 8 * xyz.shape[0] + xyz.nbytes
    out = np.empty(capacity, np.uint8)
    n = lib.pct_gpcc_encode(
        xyz.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(xyz.shape[0]),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(capacity),
    )
    assert n > 0
    return out[:n].tobytes()


def demo_inputs():
    files = sorted(glob.glob("/root/reference/evaluation/data/test/*.pkl"))
    out = []
    for f in files[:3]:
        d = pickle.load(open(f, "rb"))
        pts = np.unique(np.asarray(d["points"], np.int64), axis=0).astype(np.int32)
        out.append((os.path.basename(f), pts))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evaluation/r4/gpcc_rate.csv")
    ap.add_argument("--points", default="76000,150000,400000,800000")
    args = ap.parse_args()

    from pct.gpcc import coder  # current (v2) build

    v1 = build_v1_lib()
    rows = []

    def measure(name, pts):
        pts = np.unique(pts, axis=0)
        n = pts.shape[0]
        t0 = time.time()
        blob2 = coder.encode_points(pts)
        t_enc = time.time() - t0
        t0 = time.time()
        dec = coder.decode_points(blob2)
        t_dec = time.time() - t0
        dec = dec[np.lexsort(dec.T[::-1])]
        srt = pts[np.lexsort(pts.T[::-1])]
        assert np.array_equal(dec, srt), f"round-trip mismatch on {name}"
        row = {
            "input": name,
            "points": n,
            "v2_bytes": len(blob2),
            "v2_bpp": 8.0 * len(blob2) / n,
            "v2_enc_s": round(t_enc, 4),
            "v2_dec_s": round(t_dec, 4),
        }
        if v1 is not None:
            blob1 = lib_encode(v1, pts)
            row["v1_bytes"] = len(blob1)
            row["v1_bpp"] = 8.0 * len(blob1) / n
            row["v2_vs_v1"] = round(len(blob2) / len(blob1), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    for name, pts in demo_inputs():
        measure(f"demo:{name}", pts)
        measure(f"demo_lat8:{name}", pts // 8)

    from scripts.bench_scale import surface_cloud

    rng = np.random.default_rng(0)
    for n in (int(x) for x in args.points.split(",")):
        pts = surface_cloud(rng, n)["points"]
        measure(f"surf{n}", pts)
        measure(f"surf{n}_lat8", np.unique(pts // 8, axis=0))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    keys = sorted({k for r in rows for k in r})
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
