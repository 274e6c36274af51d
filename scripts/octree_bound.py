"""Conditional-entropy bounds for the octree occupancy coder (VERDICT r4
item 6 / missing #2): how close is the shipped v2 coder to the best ANY
coder could do with (a) its own context set, and (b) a richer tmc13-class
context set (full known-sibling occupancy + full 6-neighbor mask +
planar-so-far flags) — measured on the REAL recorded frames at full
resolution, their stride-8 latent skeletons, and vox10-scale surfaces.

For a context set C, the oracle bound is the empirical conditional entropy
sum_ctx n_ctx * H(p_hat_ctx) over the frame's occupancy bits — the bytes an
arithmetic coder with per-frame oracle probabilities would spend. Reported
per frame (oracle, optimistic for rich contexts on small frames) and POOLED
over the sequence (the achievable rate of a trained/shared model). v2's
actual bytes / its own-context bound = pure adaptation loss; the rich bound
shows what the next context dimension would buy (the tmc13 feature v2
lacks is planar + full-resolution neighbor/sibling patterns:
``/root/reference/shared/utils.py:178-188`` pins tmc13's octree flags).

The traversal replicates pct/gpcc/cpp/gpcc.cpp's BFS and bit order exactly
(same Morton convention, same slot order) in vectorized numpy.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def morton3(xyz: np.ndarray, depth: int) -> np.ndarray:
    m = np.zeros(xyz.shape[0], np.uint64)
    x, y, z = (xyz[:, d].astype(np.uint64) for d in range(3))
    for i in range(depth - 1, -1, -1):
        m = (m << np.uint64(3)) | (((x >> np.uint64(i)) & np.uint64(1)) << np.uint64(2)) \
            | (((y >> np.uint64(i)) & np.uint64(1)) << np.uint64(1)) \
            | ((z >> np.uint64(i)) & np.uint64(1))
    return m


def morton_xyz(m: np.ndarray, bits: int):
    x = np.zeros_like(m)
    y = np.zeros_like(m)
    z = np.zeros_like(m)
    for b in range(bits):
        x |= ((m >> np.uint64(3 * b + 2)) & np.uint64(1)) << np.uint64(b)
        y |= ((m >> np.uint64(3 * b + 1)) & np.uint64(1)) << np.uint64(b)
        z |= ((m >> np.uint64(3 * b)) & np.uint64(1)) << np.uint64(b)
    return x.astype(np.int64), y.astype(np.int64), z.astype(np.int64)


def pop_bucket(pp: np.ndarray) -> np.ndarray:
    return np.where(pp <= 1, 0, np.where(pp == 2, 1, np.where(pp <= 4, 2, 3)))


def traverse(points: np.ndarray):
    """Yield per-level arrays of the coder's bit stream with context
    features: (level, slot, bit, parent_pop, occ_so_far, neigh6) — exactly
    the information available to both sides when each bit is coded."""
    mn = points.min(axis=0)
    q = (points - mn).astype(np.int64)
    depth = int(max(1, np.ceil(np.log2(q.max() + 1)))) if q.max() > 0 else 1
    codes = np.sort(morton3(q, depth))
    n = codes.shape[0]
    rows = []
    # parent prefixes at each level: level l nodes are unique codes >> 3*(depth-l)
    for level in range(depth):
        pshift = np.uint64(3 * (depth - level))
        cshift = np.uint64(3 * (depth - 1 - level))
        node_of_point = codes >> pshift  # level-l node containing each point
        child_of_point = codes >> cshift
        nodes, node_start = np.unique(node_of_point, return_index=True)
        children = np.unique(child_of_point)
        cparent = children >> np.uint64(3)
        cslot = (children & np.uint64(7)).astype(np.int64)
        # per-node occupancy byte
        nid = np.searchsorted(nodes, cparent)
        occ = np.zeros(nodes.shape[0], np.int64)
        np.add.at(occ, nid, 1 << cslot)
        # parent_pop: number of occupied siblings of the node itself at the
        # parent level (root gets 8 as in the C++)
        if level == 0:
            ppop = np.full(nodes.shape[0], 8, np.int64)
        else:
            gp = nodes >> np.uint64(3)
            gpu, gpi = np.unique(gp, return_inverse=True)
            cnt = np.bincount(gpi)
            ppop = cnt[gpi].astype(np.int64)
        # 6-neighbor mask at this level (bits 5..0 = +x,-x,+y,-y,+z,-z)
        if level == 0:
            neigh6 = np.zeros(nodes.shape[0], np.int64)
        else:
            x, y, z = morton_xyz(nodes, level)
            lim = (1 << level) - 1
            neigh6 = np.zeros(nodes.shape[0], np.int64)
            for bit, (dx, dy, dz) in zip(
                (5, 4, 3, 2, 1, 0),
                ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)),
            ):
                nx, ny, nz = x + dx, y + dy, z + dz
                ok = (nx >= 0) & (ny >= 0) & (nz >= 0) & (nx <= lim) & (ny <= lim) & (nz <= lim)
                nm = morton3(
                    np.stack([np.clip(nx, 0, lim), np.clip(ny, 0, lim), np.clip(nz, 0, lim)], 1),
                    level,
                )
                j = np.searchsorted(nodes, nm)
                hit = ok & (j < nodes.shape[0]) & (nodes[np.minimum(j, nodes.shape[0] - 1)] == nm)
                neigh6 |= hit.astype(np.int64) << bit
        rows.append((level, occ, ppop, neigh6))
    return rows, n, depth


def _ctx_v2(level, slot, ppop, occ_so_far, neigh6, use_sib):
    adj = np.zeros_like(occ_so_far)
    for a, m in enumerate((4, 2, 1)):
        sib = slot ^ m
        known = sib < slot
        adj |= (known & (((occ_so_far >> sib) & 1) > 0)).astype(np.int64) << a
    nb = (((neigh6 >> np.where(slot & 4, 5, 4)) & 1) << 2) \
        | (((neigh6 >> np.where(slot & 2, 3, 2)) & 1) << 1) \
        | ((neigh6 >> np.where(slot & 1, 1, 0)) & 1)
    base = ((((level & 1) * 4 + pop_bucket(ppop)) * 8 + slot) * 8 + adj) * 8 + nb
    sibb = np.minimum(np.vectorize(lambda v: bin(v).count("1"))(occ_so_far), 3) if use_sib else 0
    return base * 4 + sibb


def _planar_so_far(slot, occ_so_far):
    """3 bits: for each axis, are ALL so-far-coded occupied siblings on one
    side (planar) — the tmc13-planar-style context proxy."""
    out = np.zeros_like(occ_so_far)
    for a, m in enumerate((4, 2, 1)):
        lo = np.zeros_like(occ_so_far, bool)
        hi = np.zeros_like(occ_so_far, bool)
        for s in range(8):
            occ_bit = ((occ_so_far >> s) & 1) > 0
            if True:
                side = (s & m) > 0
                lo |= occ_bit & ~np.bool_(side)
                hi |= occ_bit & np.bool_(side)
        out |= (~(lo & hi)).astype(np.int64) << a
    return out


def collect_bits(points: np.ndarray):
    """Flatten the traversal into per-bit arrays (vectorized over nodes x 8
    slots in coding order within each node)."""
    rows, n, depth = traverse(points)
    use_sib = n >= 32768
    levels, slots, bits, ctx_v2, ctx_rich = [], [], [], [], []
    for level, occ, ppop, neigh6 in rows:
        for c in range(8):
            slot = np.full(occ.shape[0], c, np.int64)
            occ_so_far = occ & ((1 << c) - 1)
            bit = ((occ >> c) & 1).astype(np.int64)
            v2 = _ctx_v2(level, slot, ppop, occ_so_far, neigh6, use_sib)
            planar = _planar_so_far(slot, occ_so_far)
            # rich tmc13-class: full known-sibling occupancy value (2^c),
            # full neigh6 (64), planar-so-far (8), pop bucket, level parity
            rich = ((((level & 1) * 4 + pop_bucket(ppop)) * 8 + slot) * 64 + neigh6)
            rich = (rich * 256 + occ_so_far) * 8 + planar
            levels.append(np.full(occ.shape[0], level))
            slots.append(slot)
            bits.append(bit)
            ctx_v2.append(v2)
            ctx_rich.append(rich)
    return (
        np.concatenate(bits),
        np.concatenate(ctx_v2),
        np.concatenate(ctx_rich),
        n,
    )


def cond_entropy_bits(bits: np.ndarray, ctx: np.ndarray) -> float:
    """sum_ctx n_ctx * H(p_hat) in bits."""
    _, inv = np.unique(ctx, return_inverse=True)
    n1 = np.bincount(inv, weights=bits)
    nt = np.bincount(inv).astype(np.float64)
    p = np.clip(n1 / nt, 1e-12, 1 - 1e-12)
    h = -(p * np.log2(p) + (1 - p) * np.log2(1 - p))
    return float(np.sum(nt * h))


def v2_bytes(points: np.ndarray) -> int:
    from pct.gpcc import encode_points

    return len(encode_points(points.astype(np.int32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/evaluation/data/test")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--surf", default="400000,800000")
    ap.add_argument("--out", default="evaluation/r5/octree_bound.csv")
    args = ap.parse_args()

    from pct.streaming.capturer import load_recorded_frames
    from scripts.bench_scale import surface_cloud

    inputs = []
    frames = load_recorded_frames(args.data)
    idx = np.linspace(0, len(frames) - 1, args.frames).astype(int)
    for i in idx:
        pts = np.unique(np.asarray(frames[i]["points"], np.int64), axis=0)
        inputs.append((f"demo:frame_{i:05d}", pts))
        lat = np.unique(pts // 8, axis=0)
        inputs.append((f"demo_lat8:frame_{i:05d}", lat))
    rng = np.random.default_rng(0)
    for s in [int(x) for x in args.surf.split(",") if x]:
        inputs.append((f"surf{s}", surface_cloud(rng, s)["points"].astype(np.int64)))

    rows = []
    pooled = {}  # family -> list of (bits, ctx_v2, ctx_rich)
    for name, pts in inputs:
        bits, cv2, crich, n = collect_bits(pts)
        actual = v2_bytes(pts) * 8.0
        hv2 = cond_entropy_bits(bits, cv2)
        hrich = cond_entropy_bits(bits, crich)
        row = {
            "input": name,
            "points": int(n),
            "v2_bpp": round(actual / n, 4),
            "bound_v2ctx_bpp": round(hv2 / n, 4),
            "bound_rich_bpp": round(hrich / n, 4),
            "v2_over_bound": round(actual / hv2, 4),
            "rich_gain": round(1 - hrich / hv2, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        fam = name.split(":")[0]
        pooled.setdefault(fam, []).append((bits, cv2, crich, n))

    # pooled bounds per family: the achievable rate of a SHARED model over
    # the sequence (honest for rich contexts, which overfit per-frame)
    for fam, items in pooled.items():
        if len(items) < 2:
            continue
        bits = np.concatenate([b for b, _, _, _ in items])
        cv2 = np.concatenate([c for _, c, _, _ in items])
        crich = np.concatenate([c for _, _, c, _ in items])
        n = sum(i[3] for i in items)
        row = {
            "input": f"{fam}:POOLED({len(items)})",
            "points": int(n),
            "v2_bpp": "",
            "bound_v2ctx_bpp": round(cond_entropy_bits(bits, cv2) / n, 4),
            "bound_rich_bpp": round(cond_entropy_bits(bits, crich) / n, 4),
            "v2_over_bound": "",
            "rich_gain": "",
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        import csv

        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
