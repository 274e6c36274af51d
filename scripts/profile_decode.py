"""Micro-profile of the decode-side hot ops at a given segment scale.

Times each primitive standalone under jit (canonical sort, self kernel-map
build, 27-tap gather-GEMM conv, generative expansion + per-frame top-k) on
GOP-shaped synthetic blocks, so perf work (e.g. GOP-union kernel-map reuse,
BASELINE north-star config 5) is ranked by measured cost instead of guesses.

Usage: python scripts/profile_decode.py [--points 76000] [--frames 5]
    [--channels 32] [--reps 5] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gop_frames(rng, n_per_frame: int, num_frames: int, overlap: float = 0.7):
    """Frames sharing ``overlap`` of their voxels with a common base set —
    the GOP coordinate statistics kernel-map reuse would exploit."""
    from scripts.bench_scale import surface_cloud

    base = surface_cloud(rng, int(n_per_frame * (1 + (1 - overlap))))["points"]
    frames = []
    for _ in range(num_frames):
        sel = rng.choice(base.shape[0], n_per_frame, replace=False)
        frames.append(base[sel])
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=76_000, help="total GOP points")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--overlap", type=float, default=0.7)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pct.utils.jaxcache import setup_compile_cache
    setup_compile_cache(cpu=args.cpu)
    print("devices:", jax.devices(), flush=True)

    from pct.ops.conv import build_kmap, sparse_conv
    from pct.ops.topk import topk_per_batch_mask
    from pct.sparse.block import bucket_size, canonicalize

    rng = np.random.default_rng(0)
    per = args.points // args.frames
    pts = gop_frames(rng, per, args.frames, args.overlap)
    coords = np.concatenate(
        [np.concatenate([np.full((p.shape[0], 1), b, np.int32), p], axis=1) for b, p in enumerate(pts)]
    )
    uniq = np.unique(coords[:, 1:], axis=0).shape[0]
    n = coords.shape[0]
    cap = bucket_size(n)
    print(f"GOP rows n={n} cap={cap} union xyz={uniq} ({uniq/n:.2f} of rows)", flush=True)

    feats = jnp.asarray(rng.standard_normal((n, args.channels)), jnp.float32)
    block = canonicalize(jnp.asarray(coords), feats).pad_to(cap)

    C = args.channels
    w = jnp.asarray(rng.standard_normal((27, C, C)) * 0.05, jnp.float32)
    b = jnp.zeros((C,), jnp.float32)
    logits_w = jnp.asarray(rng.standard_normal((27, C, 1)) * 0.05, jnp.float32)

    def timed(name, fn, *a):
        fn_j = jax.jit(fn)
        out = jax.block_until_ready(fn_j(*a))  # compile
        t0 = time.time()
        for _ in range(args.reps):
            out = jax.block_until_ready(fn_j(*a))
        dt = (time.time() - t0) / args.reps
        print(json.dumps({"op": name, "ms": round(dt * 1e3, 2)}), flush=True)
        return dt

    # 1. canonical sort of the block (the per-level re-sort cost)
    timed("canonical_sort", lambda blk: canonicalize(blk.coords, blk.feats, blk.mask).coords, block)

    # 2. self kernel-map build (the merge-rank join, symmetric path)
    timed("self_kmap_build", lambda blk: build_kmap(blk, 3), block)

    # 2b. GOP-union variant (capacity from the measured union + margin)
    cap_u = bucket_size(int(uniq * 1.15))
    timed(
        f"self_kmap_build_union(cap_u={cap_u})",
        lambda blk: build_kmap(blk, 3, num_frames=args.frames, union_frac=cap_u / cap),
        block,
    )

    # 3. 27-tap conv WITH a prebuilt map (pure gather-GEMM)
    kmap = jax.jit(lambda blk: build_kmap(blk, 3))(block)
    kmap = jax.block_until_ready(kmap)
    timed("conv_gather_gemm", lambda blk, km: sparse_conv(blk, w, b, kmap=km).feats, block, kmap)

    # 4. conv including its map build (what one synthesis level pays)
    timed(
        "conv_with_map_build",
        lambda blk: sparse_conv(blk, w, b, kmap=build_kmap(blk, 3)).feats,
        block,
    )

    # 5. occupancy logits + per-frame top-k
    def occ_topk(blk, km):
        logits = sparse_conv(blk, logits_w, jnp.zeros((1,), jnp.float32), kmap=km).feats[:, 0]
        cand_b = jnp.repeat(blk.coords[:, 0], 1)  # per-row batch ids
        k = jnp.full((args.frames,), per // 2, jnp.int32)
        return topk_per_batch_mask(cand_b, logits, blk.mask, k)

    timed("occ_logits_topk", occ_topk, block, kmap)


if __name__ == "__main__":
    main()
