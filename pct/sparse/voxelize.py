"""Point-cloud voxelization (the capture-side quantization math).

Mirrors the behavior of the reference capturer (``sender/capturer/capturer.py:97-124``):
float XYZ points are quantized to integer voxel indices ``round(p / voxel_size)``,
duplicate voxels are dropped, and the cloud is capped at ``max_points`` keeping
the points with the largest z (nearest to the camera in the demo's frame).
Implemented as pure JAX on padded blocks so it can run on-device and fuse with
the analysis transform's first layer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


from pct.sparse.block import SparseBlock, canonicalize


def voxelize_points(
    points: jax.Array,
    colors: jax.Array,
    voxel_size: float = 1.0,
    batch_index: int = 0,
    mask: Optional[jax.Array] = None,
    max_points: Optional[int] = None,
) -> SparseBlock:
    """Quantize float points to a canonical sparse voxel block.

    Args:
      points: ``[N, 3]`` float coordinates (or already-integer voxel indices
        with ``voxel_size=1``).
      colors: ``[N, C]`` per-point attributes.
      voxel_size: quantization step; voxel index = round(p / voxel_size).
      batch_index: value for the batch column.
      mask: optional validity of input rows.
      max_points: if set, keep at most this many voxels, preferring largest z.

    Returns a canonical :class:`SparseBlock` with capacity ``N`` (valid count
    may be smaller after dedup/capping).
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    vox = jnp.round(points.astype(jnp.float32) / voxel_size).astype(jnp.int32)
    b = jnp.full((n, 1), batch_index, jnp.int32)
    coords = jnp.concatenate([b, vox], axis=1)
    # voxel indices outside the packed-key range would wrap into corrupt
    # canonical order (pct/sparse/coords.py contract) — drop them instead
    from pct.sparse.coords import COORD_BIAS

    in_range = jnp.all((vox >= -COORD_BIAS) & (vox < COORD_BIAS), axis=1)
    mask = mask & in_range

    if max_points is not None and max_points < n:
        # Dedup first (stable: first occurrence wins), then cap by largest z.
        blk = canonicalize(coords, colors, mask, stride=1, dedup=True)
        z = jnp.where(blk.mask, blk.coords[:, 3], jnp.iinfo(jnp.int32).min)
        order = jnp.argsort(-z, stable=True)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        keep = blk.mask & (rank < max_points)
        return canonicalize(blk.coords, blk.feats, keep, stride=1)
    return canonicalize(coords, colors, mask, stride=1, dedup=True)


def devoxelize(block: SparseBlock, voxel_size: float = 1.0) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Back to float points: ``(points [N,3], colors [N,C], mask [N])``."""
    pts = block.coords[:, 1:].astype(jnp.float32) * voxel_size
    return pts, block.feats, block.mask
