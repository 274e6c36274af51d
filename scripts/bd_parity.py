"""BD-rate parity artifact (VERDICT r4 item 5 / BASELINE.json north star).

What IS computable offline, and what is not — stated precisely:

- The reference's sender logs (/root/reference/evaluation/logs/sender/
  final_test_*.csv) record measured RATES per representation — raw 48 bpp,
  q=[1,0] ~2.97 bpp, q=[0,1] ~4.82 bpp over ~72 segments/run — but NO
  distortion columns, and its learned codec's weights (the external
  Unified-Point-Cloud-Compression checkpoint) are not in the snapshot, so a
  true BD-rate against the reference model cannot be computed here. This
  script instead produces:

  1. **BD-rate vs a G-PCC-class octree anchor** on the same recorded
     sequences: geometry coded losslessly at quantization scales s (our
     tmc13-class coder, pct/gpcc) vs the pct learned ladder's (bpp, D1)
     points — the standard learned-vs-octree-anchor comparison the
     BASELINE.json target ("BD-rate parity within 0.5%" vs tmc13 anchors)
     is defined against, with our own octree coder standing in for tmc13
     (no network; tmc3 cannot be built offline — its measured rate gap is
     bounded separately by scripts/gpcc_rate.py).
  2. **A rate-matched table at the reference's measured operating points**:
     what the pct ladder delivers at ~2.97 / ~4.82 bpp on the same data.

Usage: python scripts/bd_parity.py [--rd evaluation/r5/rd_r5.csv]
    [--data /root/reference/evaluation/data/test] [--out evaluation/r5]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def anchor_curve(frames, scales, peak):
    """Octree-coded geometry at quantization scale s: rate (bpp of the
    original point count) + D1 PSNR of the dequantized reconstruction."""
    from pct.eval.metrics import d1_psnr
    from pct.gpcc import decode_points, encode_points

    rows = []
    n_orig = sum(f["points"].shape[0] for f in frames)
    for s in scales:
        nbytes = 0
        d1s = []
        for f in frames:
            pts = np.asarray(f["points"], np.int32)
            q = np.unique(pts // s, axis=0)
            stream = encode_points(q)
            nbytes += len(stream)
            rec = decode_points(stream) * s + s // 2 if s > 1 else decode_points(stream)
            d1s.append(d1_psnr(pts, rec, peak=peak))
        rows.append(
            {"scale": s, "bpp": nbytes * 8 / n_orig, "d1_psnr": float(np.mean(d1s))}
        )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rd", default="evaluation/r4/rd_r4ckpt.csv")
    ap.add_argument("--data", default="/root/reference/evaluation/data/test")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--stride", type=int, default=17)
    ap.add_argument("--scales", default="2,3,4,6,8")
    ap.add_argument("--out", default="evaluation/r5")
    args = ap.parse_args()

    from pct.eval.metrics import bd_rate
    from pct.streaming.capturer import load_recorded_frames

    recs = load_recorded_frames(args.data)[:: args.stride][: args.frames]
    frames = [
        {"points": f["points"].astype(np.int32), "colors": f["colors"]}
        for f in recs
    ]
    extent = max(np.abs(f["points"]).max() for f in frames)
    peak = float(2 ** int(np.ceil(np.log2(extent + 1))) - 1)
    n_pts = sum(f["points"].shape[0] for f in frames)
    print(f"{len(frames)} frames, {n_pts} pts, peak={peak}", flush=True)

    anchor = anchor_curve(frames, [int(s) for s in args.scales.split(",")], peak)
    for r in anchor:
        print("anchor", r, flush=True)

    rd = list(csv.DictReader(open(args.rd)))
    lat = [r for r in rd if r["mode"] == "latent"]
    lat.sort(key=lambda r: float(r["bpp"]))
    pct_rate = [float(r["bpp"]) for r in lat]
    pct_d1 = [float(r["d1_psnr"]) for r in lat]

    a_rate = [r["bpp"] for r in anchor]
    a_d1 = [r["d1_psnr"] for r in anchor]
    bd = bd_rate(a_rate, a_d1, pct_rate, pct_d1)
    lo = max(min(a_d1), min(pct_d1))
    hi = min(max(a_d1), max(pct_d1))
    print(f"BD-rate (pct latent ladder vs octree anchor, D1): {bd:+.1f}% "
          f"over D1 [{lo:.1f}, {hi:.1f}] dB", flush=True)

    # rate-matched rows at the reference's measured operating points
    ref_points = [2.97, 4.82]
    matched = []
    for target in ref_points:
        usable = [r for r in rd if r["mode"].startswith("latent")]
        best = min(usable, key=lambda r: abs(float(r["bpp"]) - target))
        matched.append((target, best))
        print(f"at reference {target} bpp: closest pct row mode={best['mode']} "
              f"bpp={best['bpp']} d1={best['d1_psnr']} color={best['color_psnr']} "
              f"hit_color={best['hit_color_psnr']}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "bd_parity.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["curve", "label", "bpp", "d1_psnr"])
        for r in anchor:
            w.writerow(["octree_anchor", f"s={r['scale']}", round(r["bpp"], 4), round(r["d1_psnr"], 3)])
        for r, d in zip(pct_rate, pct_d1):
            w.writerow(["pct_latent", "", round(r, 4), round(d, 3)])
        w.writerow(["bd_rate_pct_vs_anchor_percent", f"D1 overlap [{lo:.1f},{hi:.1f}] dB", round(bd, 2), ""])
    with open(os.path.join(args.out, "bd_parity.md"), "w") as f:
        f.write("# BD-rate parity artifact (round 5)\n\n")
        f.write(
            "**What is and isn't comparable.** The reference's `final_test` sender logs "
            "record measured rates (raw 48 bpp; learned rungs ~2.97 / ~4.82 bpp over ~72 "
            "segments x 10 runs) but **no distortion columns**, and its learned codec's "
            "weights are not in the snapshot — a true BD-rate against the reference "
            "model is not computable offline. The two artifacts below are the honest "
            "substitutes; both run on the same recorded sequences the reference ships.\n\n"
        )
        f.write("## 1. BD-rate vs the octree (G-PCC-class) anchor — geometry\n\n")
        f.write("| curve | point | bpp | D1 (dB, peak %d) |\n|---|---|---|---|\n" % int(peak))
        for r in anchor:
            f.write(f"| octree anchor | s={r['scale']} | {r['bpp']:.3f} | {r['d1_psnr']:.2f} |\n")
        for r, d in zip(pct_rate, pct_d1):
            f.write(f"| pct latent ladder | | {r:.3f} | {d:.2f} |\n")
        f.write(
            f"\n**BD-rate of the pct latent ladder vs the anchor: {bd:+.1f}%** "
            f"(negative = pct cheaper at equal D1) over the overlapping D1 interval "
            f"[{lo:.1f}, {hi:.1f}] dB.\n\n"
            "**Read this number with its structure.** The anchor codes GEOMETRY "
            "ONLY, while every pct row's bytes carry geometry + the color latents "
            "in one joint stream (they are not separable in this architecture), so "
            "a geometry-only BD-rate structurally over-charges the learned ladder. "
            "What it does establish honestly: on this noisy 5 mm-voxelized camera "
            "data, octree coding of quantized geometry is very strong in pure D1 "
            "terms, and the learned rungs' value is the JOINT rate — at ~3 bpp the "
            "pct rung delivers geometry + color where the anchor's 3 bpp delivers "
            "geometry alone (raw color alone costs 24 bpp; the reference streams "
            "48 bpp raw). The same framing applies to the reference's learned "
            "codec, whose measured rates sit at 2.97/4.82 bpp on this data.\n\n"
        )
        # exact-geometry comparison: like-for-like with the octree coder
        from pct.gpcc import encode_points

        ll_bytes = sum(
            len(encode_points(np.unique(np.asarray(f["points"], np.int32), axis=0)))
            for f in frames
        )
        ll_bpp = ll_bytes * 8 / n_pts
        guided = [r for r in rd if r["mode"].startswith("guided")]
        f.write("## 1b. Exact-geometry rungs vs lossless octree\n\n")
        f.write(
            f"Lossless octree geometry (our coder, s=1): **{ll_bpp:.2f} bpp**. "
            "Guided rungs (exact geometry + learned colors, occupancy coded under "
            "the synthesis heads):\n\n"
        )
        if guided:
            f.write("| mode | q | bpp | joint color (dB) |\n|---|---|---|---|\n")
            for r in guided[:6]:
                f.write(
                    f"| {r['mode']} | ({r['q_g']},{r['q_a']}) | {r['bpp']} | "
                    f"{r['color_psnr']} |\n"
                )
        f.write("\n")
        f.write("## 2. The reference's measured operating points, rate-matched\n\n")
        f.write("| reference rate (measured) | closest pct row | bpp | D1 | joint color | hit color |\n|---|---|---|---|---|---|\n")
        for target, best in matched:
            f.write(
                f"| {target} bpp | {best['mode']} q=({best['q_g']},{best['q_a']}) | "
                f"{best['bpp']} | {best['d1_psnr']} | {best['color_psnr']} | "
                f"{best['hit_color_psnr']} |\n"
            )
        f.write(
            "\nSource: reference logs `/root/reference/evaluation/logs/sender/"
            "final_test_*.csv` (`gop_info_bpp` column, mean over segments); pct rows "
            f"from `{args.rd}` (held-out recorded frames, same capture rig).\n"
        )
    print(f"wrote {args.out}/bd_parity.csv and bd_parity.md", flush=True)


if __name__ == "__main__":
    main()
