"""GOP-union kernel maps must be bit-identical to the direct self maps.

``build_self_kernel_map_gop`` (pct/ops/kernel_maps.py) is a pure
sort-volume optimization — same ``(idx, found)`` as
``build_self_kernel_map`` for every input, union overflow included
(in-graph fallback). These tests pin that contract, which is what lets
encoder and decoder disagree on the ``gop_union_maps`` flag without
breaking stream parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pct.ops.kernel_maps import (
    build_self_kernel_map,
    build_self_kernel_map_gop,
    kernel_offsets,
)
from pct.sparse.block import bucket_size, canonicalize


def make_gop_block(rng, num_frames, per_frame, overlap, stride=1, extent=40):
    """Frames drawing ``overlap`` of their voxels from a shared base set."""
    base = rng.integers(0, extent, (per_frame * 3, 3)).astype(np.int32) * stride
    base = np.unique(base, axis=0)
    rows = []
    for b in range(num_frames):
        n_sh = int(per_frame * overlap)
        sel = rng.choice(base.shape[0], min(n_sh, base.shape[0]), replace=False)
        own = rng.integers(0, extent, (per_frame - len(sel), 3)).astype(np.int32) * stride
        pts = np.unique(np.concatenate([base[sel], own]), axis=0)
        rows.append(np.concatenate([np.full((len(pts), 1), b, np.int32), pts], axis=1))
    coords = np.concatenate(rows)
    n = coords.shape[0]
    block = canonicalize(
        jnp.asarray(coords), jnp.zeros((n, 1), jnp.float32), dedup=True
    ).pad_to(bucket_size(n, minimum=64))
    return block.with_stride(stride)


@pytest.mark.parametrize("overlap", [0.0, 0.5, 0.9])
@pytest.mark.parametrize("num_frames", [2, 5])
def test_union_map_matches_direct(overlap, num_frames):
    rng = np.random.default_rng(int(overlap * 10) + num_frames)
    block = make_gop_block(rng, num_frames, 300, overlap)
    offs = kernel_offsets(3)
    idx_d, fnd_d = jax.jit(lambda b: build_self_kernel_map(b, offs, 1))(block)
    # generous capacity: union always fits -> union branch taken
    idx_u, fnd_u = jax.jit(
        lambda b: build_self_kernel_map_gop(b, offs, 1, num_frames, block.capacity)
    )(block)
    np.testing.assert_array_equal(np.asarray(fnd_u), np.asarray(fnd_d))
    # idx only contracts where found (both are safe clamped gather indexes)
    f = np.asarray(fnd_d)
    np.testing.assert_array_equal(np.asarray(idx_u)[f], np.asarray(idx_d)[f])


def test_union_overflow_falls_back():
    rng = np.random.default_rng(7)
    block = make_gop_block(rng, 4, 200, 0.0)  # zero overlap: union == all rows
    offs = kernel_offsets(3)
    idx_d, fnd_d = build_self_kernel_map(block, offs, 1)
    # union_cap far below the (disjoint) union size -> in-graph fallback
    idx_u, fnd_u = build_self_kernel_map_gop(block, offs, 1, 4, 64)
    np.testing.assert_array_equal(np.asarray(fnd_u), np.asarray(fnd_d))
    f = np.asarray(fnd_d)
    np.testing.assert_array_equal(np.asarray(idx_u)[f], np.asarray(idx_d)[f])


def test_union_map_strided_grid():
    rng = np.random.default_rng(3)
    block = make_gop_block(rng, 3, 150, 0.7, stride=8)
    offs = kernel_offsets(3)
    idx_d, fnd_d = build_self_kernel_map(block, offs, 8)
    idx_u, fnd_u = build_self_kernel_map_gop(block, offs, 8, 3, block.capacity)
    np.testing.assert_array_equal(np.asarray(fnd_u), np.asarray(fnd_d))
    f = np.asarray(fnd_d)
    np.testing.assert_array_equal(np.asarray(idx_u)[f], np.asarray(idx_d)[f])


def test_union_map_empty_and_single_frame_rows():
    # frame 1 empty (all its rows masked away by construction: only frame 0
    # has rows), heavy padding
    coords = np.array([[0, 1, 1, 1], [0, 1, 1, 2], [0, 2, 1, 1]], np.int32)
    block = canonicalize(jnp.asarray(coords), jnp.zeros((3, 1), jnp.float32)).pad_to(64)
    offs = kernel_offsets(3)
    idx_d, fnd_d = build_self_kernel_map(block, offs, 1)
    idx_u, fnd_u = build_self_kernel_map_gop(block, offs, 1, 2, 64)
    np.testing.assert_array_equal(np.asarray(fnd_u), np.asarray(fnd_d))
    f = np.asarray(fnd_d)
    np.testing.assert_array_equal(np.asarray(idx_u)[f], np.asarray(idx_d)[f])


def test_model_decode_unchanged_by_union_flag():
    """End-to-end: g_s output is bit-identical with gop_union_maps on/off."""
    import dataclasses

    from pct.models import ColorModel, UnifiedConfig

    cfg = UnifiedConfig(channels=(8, 16, 16), latent_channels=16, hyper_channels=8)
    m0 = ColorModel(cfg)
    m1 = ColorModel(dataclasses.replace(cfg, gop_union_maps=True))
    params = m0.init_params(jax.random.key(0))

    rng = np.random.default_rng(11)
    block = make_gop_block(rng, 2, 120, 0.7, stride=8)
    y = block.with_feats(
        jnp.asarray(rng.standard_normal((block.capacity, cfg.latent_channels)), jnp.float32)
        * block.mask[:, None]
    )
    ks = jnp.asarray(
        [[60, 60], [200, 200], [500, 500]], jnp.int32
    )
    out0 = m0.g_s(params, y, ks)
    out1 = m1.g_s(params, y, ks)
    np.testing.assert_array_equal(np.asarray(out0.coords), np.asarray(out1.coords))
    np.testing.assert_array_equal(np.asarray(out0.feats), np.asarray(out1.feats))
    np.testing.assert_array_equal(np.asarray(out0.mask), np.asarray(out1.mask))
