"""Padded sparse voxel blocks — the core tensor type of the framework.

The reference builds on ``MinkowskiEngine.SparseTensor`` (dynamic row counts,
GPU hash-map coordinate manager; constructed at reference
``sender/encoder/codec_pipeline.py:262`` and used throughout). XLA wants
static shapes, so the TPU-native representation is a *padded flat block*:

- ``coords``: int32 ``[N, 4]`` rows ``(batch, x, y, z)``; padding rows hold a
  sentinel that sorts after every valid coordinate,
- ``feats``:  ``[N, C]`` features (zero on padding rows),
- ``mask``:   bool ``[N]`` validity,
- ``stride``: static int tensor stride (grid spacing), like ME's
  ``tensor_stride``.

Blocks are kept in *canonical form*: rows sorted in the lexicographic
``(batch, x, y, z)`` order of :mod:`pct.sparse.coords` with padding at the
tail. Canonical form is the bit-alignment contract between entropy-coded
features and independently coded coordinates (reference
``shared/utils.py:116-165``), and makes joins/merges sorted-search problems.

``N`` is bucketed (powers of two) so jit re-traces only on bucket changes,
not on every frame.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from pct.sparse import coords as coords_lib

# Sentinel coordinate stored on padding rows (sorts last; see coords.pack_keys).
PAD_COORD = (0xFFFF, coords_lib.COORD_BIAS - 1, coords_lib.COORD_BIAS - 1, coords_lib.COORD_BIAS - 1)


def bucket_size(n: int, minimum: int = 256) -> int:
    """Smallest half-octave bucket >= n (>= minimum): powers of two plus their
    1.5x midpoints — stable jit shapes across frames with <=33% padding waste
    (full octaves waste up to 2x, which is real money on search/gather-bound
    sparse kernels)."""
    m = minimum
    while m < n:
        if (m + (m >> 1)) >= n and m >= 2 * minimum:
            return m + (m >> 1)
        m <<= 1
    return m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseBlock:
    """A batched sparse voxel tensor in padded canonical form."""

    coords: jax.Array  # int32 [N, 4] (batch, x, y, z)
    feats: jax.Array  # [N, C]
    mask: jax.Array  # bool [N]
    stride: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    def count(self) -> jax.Array:
        """Number of valid rows (traced scalar)."""
        return jnp.sum(self.mask.astype(jnp.int32))

    def with_feats(self, feats: jax.Array) -> "SparseBlock":
        feats = jnp.where(self.mask[:, None], feats, 0)
        return dataclasses.replace(self, feats=feats)

    def with_stride(self, stride: int) -> "SparseBlock":
        return dataclasses.replace(self, stride=stride)

    def pad_to(self, capacity: int) -> "SparseBlock":
        """Grow capacity (no-op if already >=). Keeps canonical form."""
        n = self.capacity
        if capacity <= n:
            return self
        extra = capacity - n
        pad_c = jnp.broadcast_to(
            jnp.array(PAD_COORD, jnp.int32)[None, :], (extra, 4)
        )
        return SparseBlock(
            coords=jnp.concatenate([self.coords, pad_c], axis=0),
            feats=jnp.concatenate(
                [self.feats, jnp.zeros((extra, self.num_channels), self.feats.dtype)], axis=0
            ),
            mask=jnp.concatenate([self.mask, jnp.zeros((extra,), bool)], axis=0),
            stride=self.stride,
        )


def truncate_capacity(block: SparseBlock, capacity: int) -> SparseBlock:
    """Shrink the padded capacity of a canonical block to ``capacity`` rows.

    Canonical blocks keep valid rows first, so truncation only drops padding
    as long as ``capacity >= count()`` (asserted when run eagerly). Used by
    the decoder to keep per-level capacities tight after top-k pruning
    instead of letting the 8x child expansion compound.
    """
    if capacity >= block.capacity:
        return block.pad_to(capacity)
    return SparseBlock(
        coords=block.coords[:capacity],
        feats=block.feats[:capacity],
        mask=block.mask[:capacity],
        stride=block.stride,
    )


def canonicalize(
    coords: jax.Array,
    feats: jax.Array,
    mask: Optional[jax.Array] = None,
    stride: int = 1,
    dedup: bool = False,
) -> SparseBlock:
    """Build a canonical SparseBlock from arbitrary-order rows.

    Sorts rows into canonical order (padding to tail), rewrites padding rows
    to the sentinel coordinate / zero features, and optionally drops duplicate
    coordinates (first occurrence in the *sorted* order wins — matching the
    stable-sort dedup of reference ``capturer.py:114-116``).
    """
    n = coords.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    coords = coords.astype(jnp.int32)
    perm = coords_lib.lex_argsort(coords, mask)
    coords, feats, mask = coords[perm], feats[perm], mask[perm]
    if dedup:
        mask = coords_lib.mark_first_occurrences(coords, mask)
        # Re-sort so newly-invalidated duplicate rows move to the tail.
        perm = coords_lib.lex_argsort(coords, mask)
        coords, feats, mask = coords[perm], feats[perm], mask[perm]
    pad_c = jnp.array(PAD_COORD, jnp.int32)
    coords = jnp.where(mask[:, None], coords, pad_c[None, :])
    feats = jnp.where(mask[:, None], feats, 0)
    return SparseBlock(coords=coords, feats=feats, mask=mask, stride=stride)


def features_at_coordinates(block: SparseBlock, query_coords: jax.Array,
                            query_mask: Optional[jax.Array] = None) -> jax.Array:
    """Gather ``block`` features at the queried coordinates (zeros if absent).

    TPU-native equivalent of ``ME.SparseTensor.features_at_coordinates``
    (used to join hyperprior params onto latent coords — reference
    ``codec_pipeline.py:365,401`` and ``codec_parallel.py:387``): a sorted
    binary-search join instead of a hash-map probe.
    """
    idx, found = coords_lib.find_coords(block.coords, query_coords, block.mask, query_mask)
    out = block.feats[idx]
    return jnp.where(found[:, None], out, 0)


def merge_blocks(a: SparseBlock, b: SparseBlock, dedup: bool = True) -> SparseBlock:
    """Concatenate two blocks into one canonical block (capacity = sum)."""
    assert a.stride == b.stride, "cannot merge blocks with different strides"
    return canonicalize(
        jnp.concatenate([a.coords, b.coords], axis=0),
        jnp.concatenate([a.feats, b.feats], axis=0),
        jnp.concatenate([a.mask, b.mask], axis=0),
        stride=a.stride,
        dedup=dedup,
    )
