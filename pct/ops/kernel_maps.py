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
