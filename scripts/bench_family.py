"""Microbench: plain 27-tap gather-GEMM conv vs FAMILY-form conv.

The round-4 scale measurement (evaluation/r4/scale.csv) put the 800k decode
wall at 5.37 s of device synthesis; the descriptor-cost model (TPU row
gathers cost ~40 ns/row regardless of width, PERF.md round-4 #4) attributes
~4.9 s of that to conv tap gathers: every 27-tap conv at child-grid
capacity N gathers 27*N rows. The family form exploits the octree
structure every synthesis grid has (each row is a child slot of a parent
cell): hold features as [n_parent, 8, C] family blocks and compute the
child-grid conv as 27 gathers of [8C]-wide PARENT rows (the parent grid's
own 27-tap kernel map) contracted with block weights W[t][(s',c),(s,d)] =
w27[2*dp_t + s' - s][c, d] — 8x fewer gather descriptors at the same
(width-independent) per-row cost.

Usage: python scripts/bench_family.py [--parents 327680] [--cin 32] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parents", type=int, default=327_680)
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
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
    from pct.sparse.block import bucket_size, canonicalize
    from scripts.bench_scale import surface_cloud

    rng = np.random.default_rng(0)
    npar = args.parents
    # parent grid: a surface cloud at stride 2 (so children at stride 1)
    cloud = surface_cloud(rng, npar, extent=2048)["points"] // 2 * 2
    cloud = np.unique(cloud, axis=0)
    npar_v = cloud.shape[0]
    pcap = bucket_size(npar_v)
    coords = np.concatenate([np.zeros((npar_v, 1), np.int32), cloud], axis=1)
    cin, cout = args.cin, args.cout

    parent = canonicalize(
        jnp.asarray(coords), jnp.asarray(rng.standard_normal((npar_v, cin)), jnp.float32)
    ).pad_to(pcap).with_stride(2)
    print(f"parents={npar_v} pcap={pcap}", flush=True)

    # children: ~3 of 8 slots occupied (surface shrink ratio ~2.97)
    slots = rng.random((npar_v, 8)) < 0.38
    ch = []
    offs = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.int32)
    for s in range(8):
        sel = cloud[slots[:, s]]
        ch.append(sel + offs[s])
    ch = np.unique(np.concatenate(ch), axis=0)
    nch = ch.shape[0]
    ccap = bucket_size(nch)
    ccoords = np.concatenate([np.zeros((nch, 1), np.int32), ch], axis=1)
    child = canonicalize(
        jnp.asarray(ccoords), jnp.asarray(rng.standard_normal((nch, cin)), jnp.float32)
    ).pad_to(ccap).with_stride(1)
    print(f"children={nch} ccap={ccap}", flush=True)

    w27 = jnp.asarray(rng.standard_normal((27, cin, cout)) * 0.05, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    def timed(name, fn, *a):
        fn_j = jax.jit(fn)
        out = jax.block_until_ready(fn_j(*a))
        t0 = time.time()
        for _ in range(args.reps):
            out = jax.block_until_ready(fn_j(*a))
        dt = (time.time() - t0) / args.reps
        print(json.dumps({"op": name, "ms": round(dt * 1e3, 2)}), flush=True)
        return out

    # ---------------- plain child-grid conv (current path) ----------------
    kmap_c = jax.block_until_ready(jax.jit(lambda b: build_kmap(b, 3))(child))
    timed("plain_conv_child(27xN gathers)", lambda b, km: sparse_conv(b, w27, bias, kmap=km).feats, child, kmap_c)
    timed("child_kmap_build", lambda b: build_kmap(b, 3)[0], child)

    # ---------------- family-form conv ----------------
    kmap_p = jax.block_until_ready(jax.jit(lambda b: build_kmap(b, 3))(parent))

    # family layout: F [pcap, 8, cin]; child (prow, slot)
    pxyz = np.asarray(parent.coords[:, 1:]) // 2 * 2
    # map child -> parent row: children were built from cloud rows; recompute
    from pct.sparse import coords as coords_lib

    cc = np.asarray(child.coords)
    par_of_child = np.concatenate([cc[:, :1], (cc[:, 1:] // 2) * 2], axis=1)
    prow, found = coords_lib.find_coords(
        parent.coords, jnp.asarray(par_of_child), parent.mask, child.mask
    )
    prow = jax.block_until_ready(prow)
    slot_xyz = cc[:, 1:] - (cc[:, 1:] // 2) * 2
    slot = jnp.asarray((slot_xyz[:, 0] * 2 + slot_xyz[:, 1]) * 2 + slot_xyz[:, 2])

    # block weights: W[t] [(s'*cin+c), (s*cout+d)] = w27[delta(s,t,s')][c,d]
    def fam_weights(w):
        dps = np.array([[x, y, z] for x in (-1, 0, 1) for y in (-1, 0, 1) for z in (-1, 0, 1)])
        svec = offs  # [8, 3] in {0,1}
        W = np.zeros((27, 8 * cin, 8 * cout), np.float32)
        wn = np.asarray(w)
        for t, dp in enumerate(dps):
            for si, s in enumerate(svec):
                for spi, sp in enumerate(svec):
                    d = 2 * dp + sp - s
                    if np.all(np.abs(d) <= 1):
                        didx = (d[0] + 1) * 9 + (d[1] + 1) * 3 + (d[2] + 1)
                        W[t, spi * cin : (spi + 1) * cin, si * cout : (si + 1) * cout] = wn[didx]
        return jnp.asarray(W)

    W_fam = fam_weights(w27)

    def family_conv(child_feats, child_mask, prow, slot, pidx, pfound):
        # scatter child rows into family blocks
        flat = jnp.where(child_mask, prow * 8 + slot, pcap * 8)
        F = (
            jnp.zeros((pcap * 8 + 1, cin), jnp.float32)
            .at[flat]
            .set(jnp.where(child_mask[:, None], child_feats, 0), mode="drop")[: pcap * 8]
            .reshape(pcap, 8 * cin)
        )
        # 27 wide gathers over the parent grid + block GEMMs
        from pct.ops.conv import _gather_gemm

        fam_out = _gather_gemm(
            F, pidx, pfound, W_fam, None, parent.mask
        )  # [pcap, 8*cout]
        # back to child rows
        out = fam_out.reshape(pcap * 8, cout)[jnp.where(child_mask, prow * 8 + slot, 0)]
        return jnp.where(child_mask[:, None], out + bias, 0)

    out_fam = timed(
        "family_conv(27xNp wide gathers + scatter/out-gather)",
        family_conv,
        child.feats,
        child.mask,
        prow,
        slot,
        kmap_p[0],
        kmap_p[1],
    )

    # family conv WITHOUT the scatter/out-gather (features already family-major)
    flat = jnp.where(child.mask, prow * 8 + slot, pcap * 8)
    F0 = (
        jnp.zeros((pcap * 8 + 1, cin), jnp.float32)
        .at[flat]
        .set(jnp.where(child.mask[:, None], child.feats, 0), mode="drop")[: pcap * 8]
        .reshape(pcap, 8 * cin)
    )
    F0 = jax.block_until_ready(F0)

    def family_core(F, pidx, pfound):
        from pct.ops.conv import _gather_gemm

        return _gather_gemm(F, pidx, pfound, W_fam, None, parent.mask)

    timed("family_core(gathers+GEMM only)", family_core, F0, kmap_p[0], kmap_p[1])

    # correctness: family == plain at child rows (tolerance: different
    # accumulation order)
    ref = jax.jit(lambda b, km: sparse_conv(b, w27, bias, kmap=km).feats)(child, kmap_c)
    ref = np.asarray(ref)
    got = np.asarray(out_fam)
    m = np.asarray(child.mask)
    err = np.abs(ref[m] - got[m]).max() / (np.abs(ref[m]).max() + 1e-9)
    print(json.dumps({"rel_err": float(err)}), flush=True)

    # parent kmap build cost (amortized across all convs of the grid)
    timed("parent_kmap_build", lambda b: build_kmap(b, 3)[0], parent)


if __name__ == "__main__":
    main()
