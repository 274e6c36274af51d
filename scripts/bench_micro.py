"""Micro-benchmarks of the codec's hot device ops (kernel-map builds, sorts,
top-k, gather-GEMM convs, full synthesis) — the profile that ranks where
decode time actually goes at scale (PERF.md round-3 "Next").

Usage: python scripts/bench_micro.py [--points 150000] [--cpu] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def surface(rng, n, extent=1024):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scale import surface_cloud

    return surface_cloud(rng, n, extent)


def timeit(fn, reps):
    import jax

    jax.block_until_ready(fn())  # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=150_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pct.utils.jaxcache import setup_compile_cache
    setup_compile_cache(cpu=args.cpu)
    import jax.numpy as jnp

    from pct.ops.conv import build_kmap, sparse_conv
    from pct.ops.kernel_maps import build_kernel_map, kernel_offsets
    from pct.ops.topk import topk_per_batch_mask
    from pct.sparse import coords as coords_lib
    from pct.sparse.block import SparseBlock, bucket_size, canonicalize

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    fr = surface(rng, args.points)
    n = fr["points"].shape[0]
    cap = bucket_size(n)
    coords = np.zeros((cap, 4), np.int32)
    coords[:n, 1:] = fr["points"]
    feats = np.zeros((cap, 32), np.float32)
    feats[:n] = rng.standard_normal((n, 32)).astype(np.float32)
    mask = np.zeros(cap, bool)
    mask[:n] = True
    block = canonicalize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(mask))
    block = jax.block_until_ready(block)

    rows = {}
    offs = kernel_offsets(3)

    f_self = jax.jit(lambda b: build_kmap(b, 3))
    rows["kmap_self_13q"] = timeit(lambda: f_self(block), args.reps)

    f_gen = jax.jit(
        lambda b: build_kernel_map(b, b.coords, b.mask, offs, b.stride)
    )
    rows["kmap_general_27q"] = timeit(lambda: f_gen(block), args.reps)

    kmap = jax.block_until_ready(f_self(block))
    w = jnp.asarray(rng.standard_normal((27, 32, 32)), jnp.float32)
    b_ = jnp.zeros((32,), jnp.float32)
    f_conv = jax.jit(lambda blk, km: sparse_conv(blk, w, b_, kmap=km).feats)
    rows["conv27_gather_gemm_c32"] = timeit(lambda: f_conv(block, kmap), args.reps)

    f_sort = jax.jit(lambda c, m: coords_lib.lex_argsort(c, m))
    big_c = jnp.tile(block.coords, (8, 1))
    big_m = jnp.tile(block.mask, (8,))
    rows["lex_argsort_8n"] = timeit(lambda: f_sort(big_c, big_m), args.reps)

    scores = jnp.asarray(rng.standard_normal(8 * cap), jnp.float32)
    ks = jnp.asarray([[n]], jnp.int32)[0]
    f_topk = jax.jit(
        lambda s, m: topk_per_batch_mask(big_c[:, 0], s, m, ks)
    )
    rows["topk_8n"] = timeit(lambda: f_topk(scores, big_m), args.reps)

    f_canon = jax.jit(lambda c, f, m: canonicalize(c, f, m, dedup=True).coords)
    rows["canonicalize_dedup_n"] = timeit(
        lambda: f_canon(block.coords, block.feats, block.mask), args.reps
    )

    out = {"points": int(n), "cap": int(cap), "ms": {k: round(v * 1e3, 2) for k, v in rows.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
