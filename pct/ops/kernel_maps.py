"""Kernel-map construction for sparse convolutions.

A *kernel map* pairs every output voxel with the input voxel (if any) at each
kernel offset. MinkowskiEngine builds these with a GPU hash map; here they are
vectorized lower-bound binary searches over the canonically sorted input
coordinates (the Minuet-style sorted-search pattern, PAPERS.md) — static
shapes, gather-only, TPU-friendly.

Offset conventions (match MinkowskiEngine's generative region semantics used
by the reference model, SURVEY.md §2.3):
- odd kernel size k: offsets in ``[-(k//2), k//2]^3`` (centered),
- even kernel size k: offsets in ``[0, k)^3`` (corner-anchored) — the layout
  used by stride-2 down-convs and their generative transposes.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from pct.sparse import coords as coords_lib
from pct.sparse.block import SparseBlock


def kernel_offsets(kernel_size: int, dimension: int = 3) -> np.ndarray:
    """Integer kernel offsets ``[K, dimension]`` in lexicographic order."""
    if kernel_size % 2 == 1:
        r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        r = range(0, kernel_size)
    return np.array(list(itertools.product(r, repeat=dimension)), dtype=np.int32)


def build_self_kernel_map(
    block: SparseBlock,
    offsets: np.ndarray,
    offset_stride: int,
) -> tuple[jax.Array, jax.Array]:
    """Kernel map of a SAME-grid conv (out coords == in coords), exploiting
    symmetry: for an odd, centered offset set, ``offsets[t] == -offsets[K-1-t]``,
    so a hit ``coords[j] == coords[i] + off_t`` implies the mirror entry
    ``idx[j, K-1-t] = i``. Only the K//2 "negative" offsets are queried — the
    center tap is the identity and the positive half is scattered from the
    hits — HALVING the dominant sort volume of the merge-rank join
    (PERF.md: kernel-map builds are the largest sort term of both codec
    sides). Requires a deduplicated block (canonical blocks are).

    Returns ``(idx [N, K] int32, found [N, K] bool)`` exactly as
    :func:`build_kernel_map` would.
    """
    k = offsets.shape[0]
    assert k % 2 == 1, "self-map symmetry needs an odd (centered) kernel"
    half = k // 2
    assert (offsets[:half] == -offsets[:half:-1]).all(), "offsets not mirrored"
    n = block.capacity
    coords, mask = block.coords, block.mask

    off = jnp.asarray(offsets[:half], jnp.int32) * jnp.int32(offset_stride)
    off4 = jnp.concatenate([jnp.zeros((half, 1), jnp.int32), off], axis=1)
    queries = (coords[:, None, :] + off4[None, :, :]).reshape(n * half, 4)
    qmask = jnp.broadcast_to(mask[:, None], (n, half)).reshape(n * half)
    idx_lo, found_lo = coords_lib.find_coords(coords, queries, mask, qmask)
    idx_lo = idx_lo.reshape(n, half)
    found_lo = found_lo.reshape(n, half)

    # mirror scatter: hit (i, t) -> row j=idx_lo[i,t] has input i at tap K-1-t.
    # Flattened upper-half layout [N, half] indexed by u = (K-1-t) - (half+1)
    # = half-1-t. Each (j, u) slot has at most one writer (i is determined by
    # j and the offset), so the scatter is collision-free.
    rows = idx_lo  # [n, half] = j
    taps = jnp.broadcast_to(
        jnp.arange(half - 1, -1, -1, dtype=jnp.int32)[None, :], (n, half)
    )  # u = half-1-t
    slot = jnp.where(found_lo, rows * half + taps, n * half)
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, half))
    idx_hi = (
        jnp.zeros((n * half + 1,), jnp.int32)
        .at[slot.reshape(-1)]
        .set(src.reshape(-1), mode="drop")[: n * half]
        .reshape(n, half)
    )
    found_hi = (
        jnp.zeros((n * half + 1,), bool)
        .at[slot.reshape(-1)]
        .set(found_lo.reshape(-1), mode="drop")[: n * half]
        .reshape(n, half)
    )

    center_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    idx = jnp.concatenate([idx_lo, center_idx, idx_hi], axis=1)
    found = jnp.concatenate([found_lo, mask[:, None], found_hi], axis=1)
    return idx, found


def build_self_kernel_map_gop(
    block: SparseBlock,
    offsets: np.ndarray,
    offset_stride: int,
    num_frames: int,
    union_cap: int,
) -> tuple[jax.Array, jax.Array]:
    """Self kernel map via the GOP-union coordinate set (the batched
    kernel-map reuse of BASELINE.json north-star config 5).

    Frames of a GOP share xyz coordinates, so the dominant merge-rank join
    (13 offset queries per row, PERF.md) is run ONCE on the deduplicated
    xyz union — capacity ``union_cap`` — instead of on every frame's rows,
    then composed back per frame through a scatter table
    ``R[(frame, union id)] -> block row``. The result is **bit-identical**
    to :func:`build_self_kernel_map` (same ``(idx, found)``, hence the same
    gathers and the same GEMM accumulation), so encoder/decoder parity is
    unaffected; this is purely a sort-volume optimization. Sort volume:
    ``N + 14*union_cap`` keys vs the direct path's ``14*N``.

    If the union overflows ``union_cap`` the direct map is computed instead
    (``lax.cond`` — correctness never depends on the overlap assumption).
    Measured GOP union ratios (recorded demo data, 5 frames): 0.70 of rows
    at stride 1 (sensor noise decorrelates fine voxels), 0.39 at stride 8 —
    so set ``union_cap`` from the caller's knowledge of the data; low-noise
    content (synthetic/scanned sequences) sits far lower.
    """
    k = offsets.shape[0]
    assert k % 2 == 1, "GOP-union map is for odd (centered) self kernels"
    n = block.capacity
    cap_u = int(union_cap)
    coords, mask = block.coords, block.mask

    # order rows by xyz alone (batch column zeroed; padding -> sentinel keys)
    xyz = coords.at[:, 0].set(0)
    hi, lo = coords_lib._masked_keys(xyz, mask)
    row = jnp.arange(n, dtype=jnp.int32)
    shi, slo, perm = jax.lax.sort((hi, lo, row), num_keys=2, is_stable=True)
    mask_s = mask[perm]
    change = jnp.concatenate(
        [jnp.ones((1,), bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])]
    )
    first = change & mask_s
    uid_s = jnp.cumsum(first.astype(jnp.int32)) - 1  # union id per sorted row
    n_u = jnp.sum(first.astype(jnp.int32))

    def union_branch(_):
        from pct.sparse.block import PAD_COORD

        # union coordinate table: xyz-canonical, batch column 0, deduplicated
        slot = jnp.where(first, jnp.minimum(uid_s, cap_u), cap_u)
        pad_row = jnp.array(PAD_COORD, jnp.int32)
        u_coords = (
            jnp.broadcast_to(pad_row, (cap_u + 1, 4))
            .at[slot]
            .set(xyz[perm], mode="drop")[:cap_u]
        )
        u_mask = jnp.arange(cap_u, dtype=jnp.int32) < n_u
        ublock = SparseBlock(
            coords=u_coords,
            feats=jnp.zeros((cap_u, 1), jnp.float32),
            mask=u_mask,
            stride=block.stride,
        )
        idx_u, found_u = build_self_kernel_map(ublock, offsets, offset_stride)

        # union id of every block row (perm is a permutation: collision-free)
        u_row = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.minimum(uid_s, cap_u - 1))
        # R: (frame, union id) -> block row; n = "absent in this frame"
        bcol = jnp.where(mask, coords[:, 0], 0)
        rslot = jnp.where(mask, bcol * cap_u + u_row, num_frames * cap_u)
        table = (
            jnp.full((num_frames * cap_u + 1,), n, jnp.int32)
            .at[rslot]
            .set(row, mode="drop")
        )
        idx_rows = idx_u[u_row]  # [n, K] row gather at per-row union ids
        found_rows = found_u[u_row]
        addr = bcol[:, None] * cap_u + idx_rows
        j = table[addr.reshape(-1)].reshape(n, k)
        found = found_rows & (j < n) & mask[:, None]
        idx = jnp.minimum(j, n - 1)
        return idx, found

    def direct_branch(_):
        return build_self_kernel_map(block, offsets, offset_stride)

    return jax.lax.cond(n_u <= cap_u, union_branch, direct_branch, None)


def derive_child_self_kmap(
    parent_kmap: tuple[jax.Array, jax.Array],
    parent_row: jax.Array,
    slot: jax.Array,
    child_coords: jax.Array,
    child_mask: jax.Array,
    child_stride: int,
    parent_found: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Derive a child grid's 27-tap self kernel map from its PARENT grid's
    map — octree arithmetic + gathers, **no merge-join sort**.

    Every child voxel ``c`` sits in slot ``s = (c/stride) & 1`` (per axis) of
    parent ``floor(c/stride/2)``; its neighbor at offset ``d`` has parent at
    offset ``dp = floor((g+d)/2) - floor(g/2) in {-1,0,1}^3`` (a tap of the
    parent map) and slot ``(g+d) & 1``. So the child map is two gathers per
    tap: the parent map entry at ``dp``, then a ``(parent row, slot) ->
    child row`` table scattered from ``(parent_row, slot)``. Bit-identical
    to :func:`build_self_kernel_map` on the child block whenever every
    child's parent is a valid row of the parent map's block (true for all
    decode paths: children are expanded from the parent set). Replaces the
    dominant decode-side sort (PERF.md: kernel-map merge joins) for every
    synthesis level except the coarsest.

    Args:
      parent_kmap: ``(idx [Np, 27], found [Np, 27])`` — the parent grid's
        self map (offsets in :func:`kernel_offsets` lexicographic order,
        built at ``offset_stride = 2 * child_stride``).
      parent_row: int32 ``[Nc]`` — each child row's parent row index in the
        parent block (garbage allowed on masked rows).
      slot: int32 ``[Nc]`` in ``[0, 8)`` — child slot ``sx*4 + sy*2 + sz``
        (the :func:`kernel_offsets(2)` enumeration used by
        ``expand_children`` / ``up_features_at``).
      child_coords/child_mask: the child block's padded canonical rows.
      child_stride: the child grid's tensor stride (parent is ``2x``).

    Returns ``(idx [Nc, 27] int32, found [Nc, 27] bool)`` exactly as
    :func:`build_self_kernel_map` would.
    """
    p_idx, p_found = parent_kmap
    np_cap = p_idx.shape[0]
    nc = child_coords.shape[0]
    k = p_idx.shape[1]
    assert k == 27, "derivation is specific to 3^3 self kernels"

    prow = jnp.clip(parent_row.astype(jnp.int32), 0, np_cap - 1)
    slot = jnp.clip(slot.astype(jnp.int32), 0, 7)

    # (parent row, slot) -> child row. Each (prow, slot) pair is unique
    # (coordinates are deduplicated), so the scatter is collision-free.
    # ``parent_found`` guards rows whose parent lookup failed (possible only
    # on corrupt/inconsistent streams) from colliding with real entries.
    valid = child_mask if parent_found is None else (child_mask & parent_found)
    addr = jnp.where(valid, prow * 8 + slot, np_cap * 8)
    lookup = (
        jnp.full((np_cap * 8 + 1,), nc, jnp.int32)
        .at[addr]
        .set(jnp.arange(nc, dtype=jnp.int32), mode="drop")
    )

    g = jnp.floor_divide(child_coords[:, 1:], jnp.int32(child_stride))  # [Nc, 3]
    pc = g >> 1
    offs = jnp.asarray(kernel_offsets(3), jnp.int32)  # [27, 3]
    p_idx_flat = p_idx.reshape(-1)
    p_found_flat = p_found.reshape(-1)

    idx_parts, found_parts = [], []
    for t0 in range(0, k, 9):  # tap chunks bound the [Nc, 9, 3] intermediates
        gq = g[:, None, :] + offs[None, t0 : t0 + 9, :]  # [Nc, 9, 3]
        dp = (gq >> 1) - pc[:, None, :]
        tp = (dp[..., 0] + 1) * 9 + (dp[..., 1] + 1) * 3 + (dp[..., 2] + 1)
        sq = (gq[..., 0] & 1) * 4 + (gq[..., 1] & 1) * 2 + (gq[..., 2] & 1)
        pn = p_idx_flat[(prow[:, None] * k + tp).reshape(-1)].reshape(tp.shape)
        fn = p_found_flat[(prow[:, None] * k + tp).reshape(-1)].reshape(tp.shape)
        j = lookup[jnp.where(fn, pn * 8 + sq, np_cap * 8).reshape(-1)].reshape(tp.shape)
        found_parts.append(fn & (j < nc) & child_mask[:, None])
        idx_parts.append(jnp.minimum(j, nc - 1))
    return jnp.concatenate(idx_parts, axis=1), jnp.concatenate(found_parts, axis=1)


def build_kernel_map(
    in_block: SparseBlock,
    out_coords: jax.Array,
    out_mask: jax.Array,
    offsets: np.ndarray,
    offset_stride: int,
) -> tuple[jax.Array, jax.Array]:
    """Map each (output row, kernel offset) to an input row index.

    Queries ``out_coords + offset * offset_stride`` (batch column untouched)
    against the sorted input coordinates.

    Returns ``(idx [N_out, K] int32, found [N_out, K] bool)``; ``idx`` is
    always a safe gather index.
    """
    k = offsets.shape[0]
    n_out = out_coords.shape[0]
    off = jnp.asarray(offsets, jnp.int32) * jnp.int32(offset_stride)  # [K, 3]
    off4 = jnp.concatenate([jnp.zeros((k, 1), jnp.int32), off], axis=1)  # [K, 4]
    queries = (out_coords[:, None, :] + off4[None, :, :]).reshape(n_out * k, 4)
    qmask = jnp.broadcast_to(out_mask[:, None], (n_out, k)).reshape(n_out * k)
    idx, found = coords_lib.find_coords(in_block.coords, queries, in_block.mask, qmask)
    return idx.reshape(n_out, k), found.reshape(n_out, k)
