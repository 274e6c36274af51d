"""Sparse convolutions as gather-GEMM over kernel maps.

TPU-native re-design of MinkowskiEngine's sparse conv stack (used throughout
the reference codec model, SURVEY.md §2.2-2.3):

- ``sparse_conv``            — same-grid convolution (out coords = in coords,
  or an explicit target coordinate set),
- ``sparse_conv_down``       — strided downsampling conv (tensor stride ×f),
- ``generative_conv_up``     — generative transposed conv (stride ÷f): every
  input voxel expands to ``f^3`` candidate children. For kernel_size == f the
  children of distinct parents are distinct, so the op is a pure expansion —
  a reshape + one GEMM, no scatter-add; this is the decoder's hot op
  (reference D6, ``g_s`` generative upsampling).

Compute shape: for each kernel offset, gather input rows and accumulate a
``[N, C_in] @ [C_in, C_out]`` matmul — K MXU matmuls, no K*C_in-wide
intermediate. Weight layout is ``[K, C_in, C_out]``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pct.sparse import coords as coords_lib
from pct.sparse.block import PAD_COORD, SparseBlock
from pct.ops.kernel_maps import build_kernel_map, kernel_offsets


def _gather_gemm(
    feats: jax.Array,
    idx: jax.Array,
    found: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array],
    out_mask: jax.Array,
) -> jax.Array:
    """sum_k feats[idx[:, k]] @ weight[k] with missing taps zeroed.

    One gather + one K-contracted einsum: the contraction folds the K*C_in
    dims into a single [N, K*C_in] @ [K*C_in, C_out] MXU matmul and keeps the
    traced graph small (a per-tap Python loop makes jaxprs/compile blow up
    ~K-fold through vmap+grad)."""
    gathered = feats[idx] * found[..., None].astype(feats.dtype)  # [N, K, Cin]
    acc = jnp.einsum(
        "nkc,kcd->nd", gathered, weight, preferred_element_type=feats.dtype
    )
    if bias is not None:
        acc = acc + bias
    return jnp.where(out_mask[:, None], acc, 0)


def build_kmap(block: SparseBlock, kernel_size: int) -> tuple[jax.Array, jax.Array]:
    """Kernel map of a same-coordinate conv on ``block`` — build once and pass
    to several ``sparse_conv`` calls over the same coordinate set (e.g. a
    feature conv and its occupancy head in the decoder) to skip repeated
    sorted searches (the kernel-map-reuse north star, BASELINE.json)."""
    offs = kernel_offsets(kernel_size)
    return build_kernel_map(block, block.coords, block.mask, offs, block.stride)


def sparse_conv(
    block: SparseBlock,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    out_coords: Optional[jax.Array] = None,
    out_mask: Optional[jax.Array] = None,
    kmap: Optional[tuple[jax.Array, jax.Array]] = None,
) -> SparseBlock:
    """Same-stride sparse convolution.

    ``weight``: ``[K, C_in, C_out]`` with ``K = kernel_size^3``; kernel size is
    inferred from K. If ``out_coords`` is given (already canonical), the conv
    is evaluated at those coordinates instead of the input's. ``kmap`` reuses
    a precomputed kernel map (see :func:`build_kmap`).
    """
    ksize = round(weight.shape[0] ** (1 / 3))
    assert ksize**3 == weight.shape[0], f"bad kernel taps {weight.shape[0]}"
    if out_coords is None:
        out_coords, out_mask = block.coords, block.mask
    if kmap is None:
        offs = kernel_offsets(ksize)
        kmap = build_kernel_map(block, out_coords, out_mask, offs, block.stride)
    idx, found = kmap
    feats = _gather_gemm(block.feats, idx, found, weight, bias, out_mask)
    return SparseBlock(coords=out_coords, feats=feats, mask=out_mask, stride=block.stride)


def downsample_coords(block: SparseBlock, factor: int = 2) -> tuple[jax.Array, jax.Array]:
    """Unique coordinates on the ``stride*factor`` grid (canonical order).

    ``floor(c / (stride*factor)) * (stride*factor)`` per axis (floor handles
    negative coordinates), deduplicated. Output capacity equals input capacity;
    the mask marks the unique rows.
    """
    step = jnp.int32(block.stride * factor)
    xyz = jnp.floor_divide(block.coords[:, 1:], step) * step
    coords = jnp.concatenate([block.coords[:, :1], xyz], axis=1)
    coords = jnp.where(block.mask[:, None], coords, jnp.array(PAD_COORD, jnp.int32)[None, :])
    perm = coords_lib.lex_argsort(coords, block.mask)
    coords, mask = coords[perm], block.mask[perm]
    mask = coords_lib.mark_first_occurrences(coords, mask)
    perm2 = coords_lib.lex_argsort(coords, mask)
    coords, mask = coords[perm2], mask[perm2]
    coords = jnp.where(mask[:, None], coords, jnp.array(PAD_COORD, jnp.int32)[None, :])
    return coords, mask


def sparse_conv_down(
    block: SparseBlock,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    factor: int = 2,
) -> SparseBlock:
    """Strided downsampling conv: tensor stride ``s -> s*factor``.

    Kernel size is inferred from the weight's tap count (typically
    ``factor^3`` corner-anchored taps, matching the reference model's stride-2
    down-convs, e.g. ``g_s.down_conv`` at reference ``codec_parallel.py:296-303``).
    """
    ksize = round(weight.shape[0] ** (1 / 3))
    assert ksize**3 == weight.shape[0]
    offs = kernel_offsets(ksize)
    out_coords, out_mask = downsample_coords(block, factor)
    idx, found = build_kernel_map(block, out_coords, out_mask, offs, block.stride)
    feats = _gather_gemm(block.feats, idx, found, weight, bias, out_mask)
    return SparseBlock(
        coords=out_coords, feats=feats, mask=out_mask, stride=block.stride * factor
    )


def generative_conv_up(
    block: SparseBlock,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    factor: int = 2,
) -> SparseBlock:
    """Generative transposed conv: stride ``s -> s/factor``, every voxel expands
    to its ``factor^3`` children.

    ``weight``: ``[factor^3, C_in, C_out]``. Children of distinct parents are
    distinct (kernel == stride), so this is one batched GEMM + reshape;
    output capacity is ``factor^3 * N``. Output is returned in canonical order.
    """
    assert block.stride % factor == 0, "stride not divisible by upsample factor"
    child_stride = block.stride // factor
    f3 = factor**3
    assert weight.shape[0] == f3
    offs = jnp.asarray(kernel_offsets(factor), jnp.int32) * jnp.int32(child_stride)  # [f3, 3]
    n = block.capacity
    child_xyz = block.coords[:, None, 1:] + offs[None, :, :]  # [N, f3, 3]
    child_b = jnp.broadcast_to(block.coords[:, None, :1], (n, f3, 1))
    child_coords = jnp.concatenate([child_b, child_xyz], axis=2).reshape(n * f3, 4)
    child_mask = jnp.broadcast_to(block.mask[:, None], (n, f3)).reshape(n * f3)
    # [N, Cin] x [f3, Cin, Cout] -> [N, f3, Cout]
    feats = jnp.einsum(
        "nc,kcd->nkd", block.feats, weight, preferred_element_type=block.feats.dtype
    )
    if bias is not None:
        feats = feats + bias
    feats = feats.reshape(n * f3, -1)
    child_coords = jnp.where(
        child_mask[:, None], child_coords, jnp.array(PAD_COORD, jnp.int32)[None, :]
    )
    feats = jnp.where(child_mask[:, None], feats, 0)
    perm = coords_lib.lex_argsort(child_coords, child_mask)
    return SparseBlock(
        coords=child_coords[perm],
        feats=feats[perm],
        mask=child_mask[perm],
        stride=child_stride,
    )


def prune_block(block: SparseBlock, keep: jax.Array) -> SparseBlock:
    """Restrict a block to ``keep`` rows and restore canonical (valid-first) form."""
    mask = block.mask & keep
    coords = jnp.where(mask[:, None], block.coords, jnp.array(PAD_COORD, jnp.int32)[None, :])
    feats = jnp.where(mask[:, None], block.feats, 0)
    perm = coords_lib.lex_argsort(coords, mask)
    return dataclasses.replace(
        block, coords=coords[perm], feats=feats[perm], mask=mask[perm]
    )
