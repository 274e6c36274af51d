"""Per-frame top-k occupancy selection inside batched padded blocks.

The reference decoder's generative upsampler prunes each level's candidate
children to exactly ``k_i`` voxels *per frame* (the ``k`` lists written into
the bitstream — SURVEY.md §2.3, reference ``codec_parallel.py:465-472``).
With frames batched along the coordinate batch column, that is a segmented
top-k: implemented as one multi-key sort by ``(batch asc, score desc)``
followed by an in-batch rank computation — no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _float_sort_key_desc(x: jax.Array) -> jax.Array:
    """Map float32 to uint32 so ascending uint order == descending float order."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    # Standard order-preserving flip for ascending order...
    asc = jnp.where(
        (u >> 31) == 1, ~u, u | jnp.uint32(0x80000000)
    )
    # ...then invert for descending.
    return ~asc


def topk_per_batch_mask(
    batch_ids: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    k_per_batch: jax.Array,
) -> jax.Array:
    """Boolean keep-mask selecting the ``k[b]`` highest-scoring valid rows of
    each batch.

    Ties are broken by input position (stable). ``k_per_batch`` is ``[B]``
    (int); batch ids must lie in ``[0, B)``.

    For ``B <= 255`` (every codec configuration — segments carry at most
    ~16 frames) the two sort keys are PACKED into one uint32:
    ``(batch << sbits) | (desc_score_key >> bbits)`` with
    ``bbits = ceil(log2(B + 1))`` — the all-ones batch field is reserved
    for invalid rows, so the packed invalid key ``0xFFFFFFFF`` still sorts
    last. This turns the 3-operand 2-key ``lax.sort`` (the decode
    synthesis path's single largest op at vox10 scale — PERF.md) into a
    2-operand single-key sort. Truncating the score key's low ``bbits``
    bits only collapses scores equal in their top ``32 - bbits`` bits
    (>= 24; ~2^-19 relative) — such near-ties then break by input
    position, exactly like exact ties today; encoder and decoder share
    this code, so the selection contract stays consistent.
    """
    n = batch_ids.shape[0]
    num_b = int(k_per_batch.shape[0])
    idx = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)
    s_key = _float_sort_key_desc(jnp.where(valid, scores, -jnp.inf))
    if num_b <= 255:
        bbits = max(1, (num_b + 1 - 1).bit_length())  # ceil(log2(B+1))
        sbits = 32 - bbits
        packed = (batch_ids.astype(jnp.uint32) << sbits) | (s_key >> bbits)
        packed = jnp.where(valid, packed, jnp.uint32(0xFFFFFFFF))
        p_sorted, orig = jax.lax.sort((packed, idx), num_keys=1, is_stable=True)
        b_sorted = p_sorted >> sbits
        valid_sorted = p_sorted != jnp.uint32(0xFFFFFFFF)
    else:
        b_key = jnp.where(valid, batch_ids.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
        b_sorted, _, orig = jax.lax.sort((b_key, s_key, idx), num_keys=2, is_stable=True)
        valid_sorted = b_sorted != jnp.uint32(0xFFFFFFFF)

    first = jnp.concatenate([jnp.ones((1,), bool), b_sorted[1:] != b_sorted[:-1]])
    seg_start = jax.lax.cummax(jnp.where(first, pos, 0))
    rank = pos - seg_start

    b_clamped = jnp.clip(b_sorted.astype(jnp.int32), 0, k_per_batch.shape[0] - 1)
    keep_sorted = valid_sorted & (rank < k_per_batch[b_clamped])
    return jnp.zeros((n,), bool).at[orig].set(keep_sorted)


def compact_mask(keep_full: jax.Array, cap: int) -> tuple[jax.Array, jax.Array]:
    """Compact the true rows of ``keep_full`` to a ``[cap]`` prefix in input
    (candidate-index) order: ``(sel [cap] int32 indices, keep [cap] bool)``.
    Cumsum + collision-free scatter — O(n), no sort. Rows beyond ``cap`` are
    dropped (the callers' capacity-overflow contract). Shared by
    :func:`topk_compact` and the guided-occupancy OC3 decode, whose survivor
    set comes from decoded bits instead of a score sort."""
    n = keep_full.shape[0]
    pos = jnp.cumsum(keep_full.astype(jnp.int32)) - 1
    slot = jnp.where(keep_full, jnp.minimum(pos, cap), cap)
    sel = (
        jnp.zeros((cap + 1,), jnp.int32)
        .at[slot]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
    )
    keep = jnp.zeros((cap + 1,), bool).at[slot].set(keep_full, mode="drop")[:cap]
    return sel, keep


def topk_compact(
    batch_ids: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    k_per_batch: jax.Array,
    cap: int,
) -> tuple[jax.Array, jax.Array]:
    """Like :func:`topk_per_batch_mask`, but returns the survivors already
    COMPACTED to a ``[cap]`` prefix in candidate-index order: ``(sel [cap]
    int32 indices into the candidate arrays, keep [cap] bool)``.

    Selects the same rows as the mask variant; the compaction is a cumsum +
    collision-free scatter (O(n), no second sort). Callers that previously
    masked, padded, and re-sorted 8x-candidate arrays into canonical order
    (the per-level pattern of ``ColorModel.g_s``) skip that full-size sort;
    only the level whose ORDER is observable (the final output) needs a
    canonical re-sort, over ``cap`` rows instead of the 8x candidate count.
    Candidate-index order is parent-major, so downstream gathers (parent
    premultiply rows, derived-kmap tables, conv taps) stay near-sequential —
    (batch, score-rank) order was measured 2x slower end-to-end on XLA:CPU
    from gather cache misses alone. Survivors beyond ``cap`` are dropped
    (the callers' capacity-overflow contract).
    """
    keep_full = valid & topk_per_batch_mask(batch_ids, scores, valid, k_per_batch)
    return compact_mask(keep_full, cap)


def counts_per_batch(batch_ids: jax.Array, valid: jax.Array, num_batches: int) -> jax.Array:
    """Number of valid rows per batch index — the ground-truth ``k`` values the
    encoder transmits (reference ``codec_pipeline.py:505-507``)."""
    contrib = valid.astype(jnp.int32)
    b = jnp.clip(batch_ids, 0, num_batches - 1)
    return jnp.zeros((num_batches,), jnp.int32).at[b].add(contrib)
