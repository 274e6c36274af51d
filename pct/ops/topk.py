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
    """
    n = batch_ids.shape[0]
    b_key = jnp.where(valid, batch_ids.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
    s_key = _float_sort_key_desc(jnp.where(valid, scores, -jnp.inf))
    idx = jnp.arange(n, dtype=jnp.int32)
    b_sorted, _, orig = jax.lax.sort((b_key, s_key, idx), num_keys=2, is_stable=True)

    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), b_sorted[1:] != b_sorted[:-1]])
    seg_start = jax.lax.cummax(jnp.where(first, pos, 0))
    rank = pos - seg_start

    valid_sorted = b_sorted != jnp.uint32(0xFFFFFFFF)
    b_clamped = jnp.clip(b_sorted.astype(jnp.int32), 0, k_per_batch.shape[0] - 1)
    keep_sorted = valid_sorted & (rank < k_per_batch[b_clamped])
    return jnp.zeros((n,), bool).at[orig].set(keep_sorted)


def counts_per_batch(batch_ids: jax.Array, valid: jax.Array, num_batches: int) -> jax.Array:
    """Number of valid rows per batch index — the ground-truth ``k`` values the
    encoder transmits (reference ``codec_pipeline.py:505-507``)."""
    contrib = valid.astype(jnp.int32)
    b = jnp.clip(batch_ids, 0, num_batches - 1)
    return jnp.zeros((num_batches,), jnp.int32).at[b].add(contrib)
