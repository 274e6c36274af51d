"""Sparse conv engine tests vs dense numpy oracles (SURVEY.md §7 step 2)."""

import numpy as np
import jax.numpy as jnp

from pct.sparse import canonicalize
from pct.ops import (
    counts_per_batch,
    downsample_coords,
    generative_conv_up,
    kernel_offsets,
    prune_block,
    sparse_conv,
    sparse_conv_down,
    topk_per_batch_mask,
)


def make_block(rng, n=120, lo=0, hi=12, cin=5, batches=2, stride=1):
    c = np.zeros((n, 4), np.int32)
    c[:, 0] = rng.integers(0, batches, n)
    c[:, 1:] = rng.integers(lo, hi, (n, 3)) * stride
    f = rng.normal(size=(n, cin)).astype(np.float32)
    return canonicalize(jnp.asarray(c), jnp.asarray(f), stride=stride, dedup=True)


def block_dict(blk):
    m = np.asarray(blk.mask)
    return {
        tuple(r.tolist()): f
        for r, f in zip(np.asarray(blk.coords)[m], np.asarray(blk.feats)[m])
    }


def oracle_conv(in_dict, out_keys, weight, offsets, stride, bias=None):
    cout = weight.shape[2]
    out = {}
    for key in out_keys:
        b, x, y, z = key
        acc = np.zeros(cout, np.float32)
        for j, (dx, dy, dz) in enumerate(offsets):
            q = (b, x + dx * stride, y + dy * stride, z + dz * stride)
            if q in in_dict:
                acc += in_dict[q] @ weight[j]
        if bias is not None:
            acc += bias
        out[key] = acc
    return out


def test_sparse_conv_matches_dense_oracle(rng):
    blk = make_block(rng)
    w = rng.normal(size=(27, 5, 7)).astype(np.float32) * 0.2
    b = rng.normal(size=(7,)).astype(np.float32)
    out = sparse_conv(blk, jnp.asarray(w), jnp.asarray(b))
    got = block_dict(out)
    ref = oracle_conv(block_dict(blk), got.keys(), w, kernel_offsets(3), 1, b)
    assert set(got) == set(ref)
    for k in got:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-5)


def test_sparse_conv_stride2_grid(rng):
    # same conv on a stride-2 grid must use offsets scaled by the stride
    blk = make_block(rng, stride=2)
    w = rng.normal(size=(27, 5, 4)).astype(np.float32) * 0.2
    out = sparse_conv(blk, jnp.asarray(w))
    got = block_dict(out)
    ref = oracle_conv(block_dict(blk), got.keys(), w, kernel_offsets(3), 2)
    for k in got:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-5)


def test_downsample_coords_unique_floor(rng):
    blk = make_block(rng, lo=-7, hi=8)
    coords, mask = downsample_coords(blk, 2)
    m = np.asarray(mask)
    got = {tuple(r.tolist()) for r in np.asarray(coords)[m]}
    src = block_dict(blk).keys()
    expect = {(b, (x // 2) * 2, (y // 2) * 2, (z // 2) * 2) for b, x, y, z in src}
    assert got == expect


def test_sparse_conv_down_matches_oracle(rng):
    blk = make_block(rng, lo=-6, hi=6)
    w = rng.normal(size=(8, 5, 6)).astype(np.float32) * 0.3
    out = sparse_conv_down(blk, jnp.asarray(w))
    assert out.stride == 2
    got = block_dict(out)
    ref = oracle_conv(block_dict(blk), got.keys(), w, kernel_offsets(2), 1)
    assert set(got) == {
        (b, (x // 2) * 2, (y // 2) * 2, (z // 2) * 2) for b, x, y, z in block_dict(blk)
    }
    for k in got:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-5)


def test_generative_conv_up_expansion(rng):
    blk = make_block(rng, lo=0, hi=6, stride=2)
    w = rng.normal(size=(8, 5, 3)).astype(np.float32) * 0.3
    up = generative_conv_up(blk, jnp.asarray(w))
    assert up.stride == 1
    assert up.capacity == 8 * blk.capacity
    got = block_dict(up)
    src = block_dict(blk)
    offs = kernel_offsets(2)
    expect = {}
    for (b, x, y, z), f in src.items():
        for j, (dx, dy, dz) in enumerate(offs):
            expect[(b, x + dx, y + dy, z + dz)] = f @ w[j]
    assert set(got) == set(expect)
    for k in got:
        np.testing.assert_allclose(got[k], expect[k], rtol=1e-5, atol=1e-5)


def test_gen_up_then_down_roundtrip_coords(rng):
    # children of the upsample collapse back onto the parents
    blk = make_block(rng, lo=0, hi=6, stride=2)
    w = rng.normal(size=(8, 5, 3)).astype(np.float32)
    up = generative_conv_up(blk, jnp.asarray(w))
    coords, mask = downsample_coords(up, 2)
    got = {tuple(r.tolist()) for r in np.asarray(coords)[np.asarray(mask)]}
    assert got == set(block_dict(blk).keys())


def test_topk_per_batch(rng):
    n, B = 64, 3
    b = rng.integers(0, B, n).astype(np.int32)
    s = rng.normal(size=n).astype(np.float32)
    valid = rng.random(n) < 0.85
    k = np.array([5, 0, 17], np.int32)
    keep = np.asarray(
        topk_per_batch_mask(jnp.asarray(b), jnp.asarray(s), jnp.asarray(valid), jnp.asarray(k))
    )
    for bi in range(B):
        rows = np.where((b == bi) & valid)[0]
        want = set(rows[np.argsort(-s[rows], stable=True)][: k[bi]].tolist())
        got = set(np.where(keep & (b == bi))[0].tolist())
        assert got == want, (bi, got, want)
    assert not keep[~valid].any()


def test_counts_per_batch(rng):
    b = rng.integers(0, 4, 50).astype(np.int32)
    valid = rng.random(50) < 0.7
    got = np.asarray(counts_per_batch(jnp.asarray(b), jnp.asarray(valid), 4))
    expect = np.bincount(b[valid], minlength=4)
    np.testing.assert_array_equal(got, expect)


def test_prune_block(rng):
    blk = make_block(rng)
    scores = rng.normal(size=blk.capacity).astype(np.float32)
    k = np.array([10, 20], np.int32)
    keep = topk_per_batch_mask(
        blk.coords[:, 0], jnp.asarray(scores), blk.mask, jnp.asarray(k)
    )
    pruned = prune_block(blk, keep)
    m = np.asarray(pruned.mask)
    assert m.sum() == np.asarray(keep).sum()
    kcnt = np.asarray(counts_per_batch(pruned.coords[:, 0], pruned.mask, 2))
    assert (kcnt <= k).all()
    # canonical: valid-first and sorted
    assert m[: m.sum()].all() and not m[m.sum():].any()
