"""Octree-derived kernel maps (pct.ops.kernel_maps.derive_child_self_kmap).

The decode-side synthesis levels derive each child grid's 27-tap self kernel
map from the parent grid's map (octree arithmetic + gathers) instead of a
merge-join sort. These tests pin BIT-equivalence against the searched build
(`build_self_kernel_map`) — the maps feed parity-critical coding logits in
the guided mode (reference occupancy contract:
/root/reference/receiver/decoder/codec_parallel.py:465-472).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pct.models.unified import ColorModel, expand_children
from pct.ops.kernel_maps import (
    build_self_kernel_map,
    derive_child_self_kmap,
    kernel_offsets,
)
from pct.sparse import coords as coords_lib
from pct.sparse.block import PAD_COORD, SparseBlock


def _parent_block(rng, npts, stride, nb, span=40):
    pts = []
    for b in range(nb):
        xyz = rng.integers(-span, span, (npts, 3)) * stride
        pts.append(
            np.concatenate([np.full((npts, 1), b), xyz], axis=1).astype(np.int32)
        )
    coords = np.unique(np.concatenate(pts), axis=0)
    n = coords.shape[0]
    cap = 1 << int(np.ceil(np.log2(n + 8)))
    perm = coords_lib.lex_argsort(jnp.asarray(coords), jnp.ones((n,), bool))
    coords = jnp.asarray(coords)[perm]
    padn = cap - n
    return SparseBlock(
        coords=jnp.concatenate(
            [coords, jnp.broadcast_to(jnp.array(PAD_COORD, jnp.int32)[None, :], (padn, 4))]
        ),
        feats=jnp.zeros((cap, 4), jnp.float32),
        mask=jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((padn,), bool)]),
        stride=stride,
    )


@pytest.mark.parametrize(
    "npts,stride,nb,keep_p,cap_frac",
    [
        (500, 2, 1, 0.45, 1.0),
        (800, 4, 3, 0.3, 0.9),  # batched + capacity slicing
        (200, 2, 2, 0.9, 1.0),  # dense survivors
        (64, 8, 1, 0.15, 0.8),  # sparse survivors, coarse stride
    ],
)
def test_derived_equals_searched(npts, stride, nb, keep_p, cap_frac):
    rng = np.random.default_rng(npts + stride + nb)
    block = _parent_block(rng, npts, stride, nb)
    offs = kernel_offsets(3)
    p_kmap = build_self_kernel_map(block, offs, block.stride)

    cand_coords, cand_mask = expand_children(block)
    keep = jnp.asarray(rng.random(cand_mask.shape[0]) < keep_p) & cand_mask
    kc = jnp.where(keep[:, None], cand_coords, jnp.array(PAD_COORD, jnp.int32)[None, :])
    perm = coords_lib.lex_argsort(kc, keep)
    capc = int(kc.shape[0] * cap_frac)
    kc, km, perm = kc[perm][:capc], keep[perm][:capc], perm[:capc]

    child_stride = stride // 2
    child = SparseBlock(
        coords=kc, feats=jnp.zeros((capc, 4), jnp.float32), mask=km, stride=child_stride
    )
    want_idx, want_found = build_self_kernel_map(child, offs, child_stride)
    got_idx, got_found = derive_child_self_kmap(
        p_kmap, perm // 8, perm % 8, kc, km, child_stride
    )
    assert jnp.array_equal(want_found, got_found)
    assert jnp.array_equal(
        jnp.where(want_found, want_idx, -1), jnp.where(got_found, got_idx, -1)
    )


def test_negative_coordinates_floor_semantics():
    """Odd/negative grid coordinates: slot bits and parent floor-division
    must agree with the searched map (two's-complement >> and & are floor)."""
    rng = np.random.default_rng(7)
    block = _parent_block(rng, 300, 2, 1, span=8)  # dense, many negatives
    offs = kernel_offsets(3)
    p_kmap = build_self_kernel_map(block, offs, block.stride)
    cand_coords, cand_mask = expand_children(block)
    keep = cand_mask  # all children
    kc = jnp.where(keep[:, None], cand_coords, jnp.array(PAD_COORD, jnp.int32)[None, :])
    perm = coords_lib.lex_argsort(kc, keep)
    kc, km, perm = kc[perm], keep[perm], perm
    child = SparseBlock(
        coords=kc, feats=jnp.zeros((kc.shape[0], 4), jnp.float32), mask=km, stride=1
    )
    want_idx, want_found = build_self_kernel_map(child, offs, 1)
    got_idx, got_found = derive_child_self_kmap(p_kmap, perm // 8, perm % 8, kc, km, 1)
    assert jnp.array_equal(want_found, got_found)
    assert jnp.array_equal(
        jnp.where(want_found, want_idx, -1), jnp.where(got_found, got_idx, -1)
    )


def test_dense_cloud_parity_on_off():
    """DENSE clouds: children of neighboring parents interleave in lex
    order, so candidate-index order is NOT sorted — the searched-map
    fallback must re-canonicalize before its merge join (regression: the
    one-sort select+compact silently fed unsorted rows to the binary
    search; sparse test data happened to stay sorted and missed it)."""
    from pct.models.unified import UnifiedConfig
    from pct.pipeline.serial import SerialDecoder, SerialEncoder

    rng = np.random.default_rng(9)
    pts = np.unique(rng.integers(-8, 9, (3000, 3)).astype(np.int32), axis=0)  # dense box
    frames = [{"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)}]
    cfg = UnifiedConfig(channels=(8, 16, 16), latent_channels=16, hyper_channels=8)
    model_on = ColorModel(dataclasses.replace(cfg, derived_maps=True))
    model_off = ColorModel(dataclasses.replace(cfg, derived_maps=False))
    params = model_on.init_params(jax.random.key(0))
    lv, _ = SerialEncoder(model_on, params).compress(frames, [[0.5, 0.5]])
    out_on, _ = SerialDecoder(model_on, params).decompress(lv[-1])
    out_off, _ = SerialDecoder(model_off, params).decompress(lv[-1])
    assert np.array_equal(out_on[0]["points"], out_off[0]["points"])
    assert np.array_equal(out_on[0]["colors"], out_off[0]["colors"])


@pytest.mark.parametrize("arch", ["v1", "v2"])
def test_decode_bit_parity_on_off(arch):
    """End-to-end: SerialEncoder/SerialDecoder outputs are bit-identical
    with derived_maps on and off — for BOTH arch variants (v2's derived
    branches are distinct: the g_a patchify-first plan chain and the g_s
    family-MLP kept-mask reconstruction)."""
    from pct.pipeline.serial import SerialDecoder, SerialEncoder

    rng = np.random.default_rng(3)
    frames = []
    for _ in range(2):
        pts = np.unique(rng.integers(-60, 60, (3000, 3)).astype(np.int32), axis=0)
        frames.append(
            {"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)}
        )
    from pct.models.unified import UnifiedConfig

    cfg = UnifiedConfig(
        channels=(8, 16, 16), latent_channels=16, hyper_channels=8, arch=arch
    )
    model_on = ColorModel(dataclasses.replace(cfg, derived_maps=True))
    model_off = ColorModel(dataclasses.replace(cfg, derived_maps=False))
    params = model_on.init_params(jax.random.key(0))

    # v2 has no lossless-geometry synthesis path (g_s_at is v1-only)
    modes = ("latent", "guided", "lossless") if arch == "v1" else ("latent",)
    for mode in modes:
        enc_on = SerialEncoder(model_on, params)
        enc_off = SerialEncoder(model_off, params)
        lv_on, _ = enc_on.compress(frames, [[0.5, 0.5]], geometry_mode=mode)
        lv_off, _ = enc_off.compress(frames, [[0.5, 0.5]], geometry_mode=mode)
        assert lv_on[-1].pack() == lv_off[-1].pack(), f"{mode} bytes differ"
        out_on, _ = SerialDecoder(model_on, params).decompress(lv_on[-1])
        out_off, _ = SerialDecoder(model_off, params).decompress(lv_off[-1])
        for a, b in zip(out_on, out_off):
            assert np.array_equal(a["points"], b["points"]), f"{mode} points differ"
            assert np.array_equal(a["colors"], b["colors"]), f"{mode} colors differ"
