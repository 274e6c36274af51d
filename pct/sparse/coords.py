"""Canonical coordinate ordering and sorted-search joins for sparse voxel tensors.

The reference establishes a *canonical lexicographic order* on batched voxel
coordinates ``(batch, x, y, z)`` as the contract that aligns entropy-coded
feature rows with independently (G-PCC) coded coordinates — see reference
``shared/utils.py:116-165`` (``sort_tensor`` / ``sort_points``), which sorts by
the weighted sum ``[1e15, 1e10, 1e5, 1]``. That float-weighted trick loses
exactness for large grids; here the same total order is realised exactly by
packing each coordinate row into a pair of ``uint32`` keys and using XLA's
multi-key ``lax.sort`` — int64-free (TPU friendly) and collision-free for
coordinates in ``[-2^15, 2^15)`` and batch indices in ``[0, 2^16)``.

Joins (``features_at_coordinates``, kernel-map construction) are vectorized
binary searches over the sorted key pairs — a static-shape, gather-only
pattern that XLA maps well to TPU, replacing MinkowskiEngine's GPU hash map.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# Bias added to signed voxel coordinates so they pack into unsigned 16-bit
# lanes. Valid coordinate range is [-COORD_BIAS, COORD_BIAS).
COORD_BIAS = 1 << 15

# Sentinel key pair that sorts after every valid coordinate (used for padding
# rows so they collect at the tail of a canonically sorted block).
SENTINEL_HI = jnp.uint32(0xFFFFFFFF)
SENTINEL_LO = jnp.uint32(0xFFFFFFFF)


def pack_keys(coords: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pack int32 ``(b, x, y, z)`` rows into lexicographically ordered uint32 pairs.

    ``hi = (b << 16) | (x + COORD_BIAS)``, ``lo = ((y + COORD_BIAS) << 16) | (z + COORD_BIAS)``.
    Comparing ``(hi, lo)`` as unsigned pairs is exactly lexicographic comparison
    of ``(b, x, y, z)``.
    """
    c = coords.astype(jnp.int32)
    b = c[..., 0].astype(jnp.uint32)
    x = (c[..., 1] + COORD_BIAS).astype(jnp.uint32)
    y = (c[..., 2] + COORD_BIAS).astype(jnp.uint32)
    z = (c[..., 3] + COORD_BIAS).astype(jnp.uint32)
    hi = (b << 16) | (x & jnp.uint32(0xFFFF))
    lo = (y << 16) | (z & jnp.uint32(0xFFFF))
    return hi, lo


def _masked_keys(coords: jax.Array, mask: jax.Array | None) -> tuple[jax.Array, jax.Array]:
    hi, lo = pack_keys(coords)
    if mask is not None:
        hi = jnp.where(mask, hi, SENTINEL_HI)
        lo = jnp.where(mask, lo, SENTINEL_LO)
    return hi, lo


def lex_argsort(coords: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Permutation that sorts rows into canonical order; masked rows go last.

    Stable, so ties (duplicate coordinates) keep their input order.
    """
    hi, lo = _masked_keys(coords, mask)
    idx = jnp.arange(coords.shape[0], dtype=jnp.int32)
    _, _, perm = jax.lax.sort((hi, lo, idx), num_keys=2, is_stable=True)
    return perm


def lex_sort_coords(
    coords: jax.Array, mask: jax.Array | None = None, *arrays: jax.Array
) -> tuple[jax.Array, ...]:
    """Sort ``coords`` (+ optional companion arrays and the mask) canonically."""
    perm = lex_argsort(coords, mask)
    out = [coords[perm]]
    if mask is not None:
        out.append(mask[perm])
    out.extend(a[perm] for a in arrays)
    return tuple(out)


def _keys_less(hi_a, lo_a, hi_b, lo_b):
    return (hi_a < hi_b) | ((hi_a == hi_b) & (lo_a < lo_b))


def searchsorted_keys(hi_sorted, lo_sorted, hi_q, lo_q):
    """Lower-bound search of query keys in sorted table keys.

    Dispatches to the merge-rank join (:func:`merge_join_keys`) for large
    query sets — TPU random row gathers serialize badly on the
    duplicate/clustered addresses that kernel-map queries produce (measured
    157 ms vs 25 ms for a 98k-table / 2.65M-query conv kernel map on v5e) —
    and to the log2(N)-round binary search for small ones, where the
    fixed cost of a full table+query sort would dominate."""
    if _use_merge_join(hi_sorted.shape[0], hi_q.shape[0]):
        pos, _ = merge_join_keys(hi_sorted, lo_sorted, hi_q, lo_q)
        return pos
    return _searchsorted_keys_xla(hi_sorted, lo_sorted, hi_q, lo_q)


def find_keys(hi_sorted, lo_sorted, hi_q, lo_q):
    """Exact-match membership of query key pairs in a sorted key table.

    Key-level twin of :func:`find_coords` for callers that already hold
    packed key pairs (e.g. the guided encoder's ground-truth occupancy
    tables, built host-side and uploaded once per segment). Table padding
    rows must be ``SENTINEL`` pairs; sentinel queries never match.
    Returns ``found`` bool in query order."""
    n = hi_sorted.shape[0]
    if _use_merge_join(n, hi_q.shape[0]):
        _, found = merge_join_keys(hi_sorted, lo_sorted, hi_q, lo_q)
        return found
    pos = _searchsorted_keys_xla(hi_sorted, lo_sorted, hi_q, lo_q)
    idx = jnp.clip(pos, 0, n - 1)
    k = jnp.stack([hi_sorted, lo_sorted], axis=1)[idx]
    return (k[:, 0] == hi_q) & (k[:, 1] == lo_q) & (hi_q != SENTINEL_HI)


def _use_merge_join(ns: int, nq: int) -> bool:
    # Sort cost ~ (ns + nq); binary-search cost ~ nq * log(ns) rounds of
    # duplicate-address gathers. Merge wins except when queries are few
    # relative to the table or the whole problem is tiny.
    return (ns + nq) >= 8192 and 4 * nq >= ns


@jax.jit
def merge_join_keys(
    hi_sorted: jax.Array,
    lo_sorted: jax.Array,
    hi_q: jax.Array,
    lo_q: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Sort-based join: ``(lower_bound, found)`` for every query key.

    One stable-free 3-operand ``lax.sort`` of the concatenated
    (queries ⧺ table) keys replaces the ~log2(N) dependent gather rounds of
    binary search.  TPU row gathers serialize on duplicate addresses — and
    kernel-map queries are 27 shifted copies of the table, so nearly every
    search round hits duplicated rows; sorts and scans are
    sequential-access and run at HBM bandwidth instead.

    Mechanics: the third sort key puts table rows BEFORE equal query keys,
    so for a query at merged position p
      - ``cnt[p] - 1`` (inclusive table-row cumsum) is the rank of the
        largest table key <= q, and
      - the query matches iff its run of equal keys contains a table row,
        i.e. the position of the nearest preceding table row
        (``cummax(is_table ? p : -1)``) is >= the start of the query's
        equal-key run (``cummax(key_change ? p : 0)``) —
    no data-dependent gathers anywhere.  Returns ``(pos [Nq] int32,
    found [Nq] bool)`` in query order; ``pos`` is lower-bound semantics
    (first table index with key >= q), clamp before gathering.
    """
    ns, nq = hi_sorted.shape[0], hi_q.shape[0]
    n = ns + nq
    hi = jnp.concatenate([hi_q, hi_sorted])
    lo = jnp.concatenate([lo_q, lo_sorted])
    # third key: table rows (bit31=0) before queries (bit31=1) on equal keys;
    # low bits carry the query index for the scatter back to query order.
    key3 = jnp.concatenate(
        [
            jnp.uint32(1 << 31) | jnp.arange(nq, dtype=jnp.uint32),
            jnp.arange(ns, dtype=jnp.uint32),
        ]
    )
    shi, slo, sk3 = jax.lax.sort((hi, lo, key3), num_keys=3, is_stable=False)
    is_query = (sk3 >> 31).astype(jnp.int32)
    is_table = 1 - is_query
    pos_m = jnp.arange(n, dtype=jnp.int32)

    cnt = jnp.cumsum(is_table)  # inclusive: # table rows at-or-before p
    last_table = jax.lax.cummax(jnp.where(is_table == 1, pos_m, -1))
    key_change = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1]),
        ]
    )
    run_start = jax.lax.cummax(jnp.where(key_change, pos_m, 0))
    matched = last_table >= run_start
    # lower bound: with table-first tie-break, cnt counts table keys <= q when
    # matched (subtract the match itself) and table keys < q when not.
    lb = jnp.where(matched, cnt - 1, cnt)

    qslot = jnp.where(is_query == 1, (sk3 & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32), nq)
    pos = jnp.zeros((nq + 1,), jnp.int32).at[qslot].set(lb, mode="drop")[:nq]
    fnd = jnp.zeros((nq + 1,), bool).at[qslot].set(matched, mode="drop")[:nq]
    fnd = fnd & (hi_q != SENTINEL_HI)
    return pos, fnd


@functools.partial(jax.jit, static_argnames=())
def _searchsorted_keys_xla(
    hi_sorted: jax.Array,
    lo_sorted: jax.Array,
    hi_q: jax.Array,
    lo_q: jax.Array,
) -> jax.Array:
    """Vectorized lower-bound binary search over sorted uint32 key pairs.

    Returns for each query the first index ``i`` with ``key[i] >= q``
    (``left`` semantics). Static shapes; ``ceil(log2(N))`` gather steps.

    The (hi, lo) table is stacked into ``[N, 2]`` rows so each step performs
    one vectorized *row* gather — TPU gathers of multi-element rows run ~30x
    faster than two scalar-element gathers (measured: 1.5 s -> row-gather
    path for 3.5M queries over a 131k table).
    """
    n = hi_sorted.shape[0]
    nq = hi_q.shape[0]
    keys = jnp.stack([hi_sorted, lo_sorted], axis=1)  # [N, 2]

    # Materialize the inputs once: without the barrier XLA fuses the query
    # key construction INTO every search step and recomputes it ~18x
    # (measured 2x total kernel-map cost).
    keys, hi_q, lo_q = jax.lax.optimization_barrier((keys, hi_q, lo_q))

    # Unrolled binary search (dependent row gathers). Unrolled rather than a
    # fori_loop: TPU pays ~10 ms per loop iteration regardless of size. A
    # broadcast-compare fence prefilter was tried and reverted — the
    # [nq, 128] compare materializes hundreds of MB at multi-million query
    # counts and costs more than the ~7 gather rounds it saves.
    lo_bound = jnp.zeros((nq,), dtype=jnp.int32)
    hi_bound = jnp.full((nq,), n, dtype=jnp.int32)
    for _ in range(max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)):
        active = lo_bound < hi_bound
        mid = (lo_bound + hi_bound) >> 1
        mid_c = jnp.clip(mid, 0, n - 1)
        k = keys[mid_c]  # [nq, 2] single row gather
        less = _keys_less(k[:, 0], k[:, 1], hi_q, lo_q)
        lo_bound = jnp.where(active & less, mid + 1, lo_bound)
        hi_bound = jnp.where(active & ~less, mid, hi_bound)
    return lo_bound


def searchsorted_coords(
    sorted_coords: jax.Array,
    query_coords: jax.Array,
    sorted_mask: jax.Array | None = None,
    query_mask: jax.Array | None = None,
) -> jax.Array:
    """Lower-bound insertion indices of ``query_coords`` in ``sorted_coords``."""
    hi_s, lo_s = _masked_keys(sorted_coords, sorted_mask)
    hi_q, lo_q = _masked_keys(query_coords, query_mask)
    return searchsorted_keys(hi_s, lo_s, hi_q, lo_q)


def find_coords(
    sorted_coords: jax.Array,
    query_coords: jax.Array,
    sorted_mask: jax.Array | None = None,
    query_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact-match join: index of each query row in the sorted table.

    Returns ``(idx, found)`` where ``idx`` is a valid gather index for every
    row (clamped) and ``found`` marks exact hits. Padding rows never match.
    """
    n = sorted_coords.shape[0]
    hi_s, lo_s = _masked_keys(sorted_coords, sorted_mask)
    hi_q, lo_q = _masked_keys(query_coords, query_mask)
    if _use_merge_join(n, hi_q.shape[0]):
        pos, found = merge_join_keys(hi_s, lo_s, hi_q, lo_q)
        return jnp.clip(pos, 0, n - 1), found
    pos = _searchsorted_keys_xla(hi_s, lo_s, hi_q, lo_q)
    idx = jnp.clip(pos, 0, n - 1)
    # row gather for the equality check (two scalar gathers are ~30x slower)
    k = jnp.stack([hi_s, lo_s], axis=1)[idx]
    found = (k[:, 0] == hi_q) & (k[:, 1] == lo_q) & (hi_q != SENTINEL_HI)
    return idx, found


def mark_first_occurrences(sorted_coords: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """On canonically-sorted rows, mark the first row of each distinct coordinate.

    Used for voxel dedup (reference ``capturer.py:114-116``) and for deriving
    downsampled coordinate sets. Masked rows are never marked.
    """
    hi, lo = _masked_keys(sorted_coords, mask)
    prev_hi = jnp.concatenate([jnp.full((1,), 0xFFFFFFFE, jnp.uint32), hi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), 0xFFFFFFFE, jnp.uint32), lo[:-1]])
    first = (hi != prev_hi) | (lo != prev_lo)
    if mask is not None:
        first = first & mask
    else:
        first = first & (hi != SENTINEL_HI)
    return first
