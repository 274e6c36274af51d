"""Unit tests for pct.sparse vs numpy oracles (SURVEY.md §7 step 1)."""

import numpy as np
import jax.numpy as jnp

from pct.sparse import (
    SparseBlock,
    canonicalize,
    features_at_coordinates,
    find_coords,
    lex_argsort,
    mark_first_occurrences,
    searchsorted_coords,
    voxelize_points,
)
from pct.sparse.block import merge_blocks


def random_coords(rng, n, lo=-300, hi=300, batches=3):
    c = np.zeros((n, 4), np.int32)
    c[:, 0] = rng.integers(0, batches, n)
    c[:, 1:] = rng.integers(lo, hi, (n, 3))
    return c


def np_lex_order(coords):
    # Numpy oracle: lexicographic (b, x, y, z) order.
    return np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))


def test_lex_argsort_matches_numpy(rng):
    c = random_coords(rng, 512)
    perm = np.asarray(lex_argsort(jnp.asarray(c)))
    ref = np_lex_order(c)
    # Orders may differ on duplicate rows; compare the sorted rows.
    np.testing.assert_array_equal(c[perm], c[ref])


def test_lex_argsort_masked_rows_go_last(rng):
    c = random_coords(rng, 256)
    mask = rng.random(256) < 0.7
    perm = np.asarray(lex_argsort(jnp.asarray(c), jnp.asarray(mask)))
    sorted_mask = mask[perm]
    k = sorted_mask.sum()
    assert sorted_mask[:k].all() and not sorted_mask[k:].any()
    valid_sorted = c[perm][:k]
    assert (np_lex_order(valid_sorted) == np.arange(k)).all()


def test_searchsorted_and_find(rng):
    c = random_coords(rng, 400)
    order = np_lex_order(c)
    table = c[order]
    queries = np.concatenate([table[rng.integers(0, 400, 128)], random_coords(rng, 128)])
    pos = np.asarray(searchsorted_coords(jnp.asarray(table), jnp.asarray(queries)))
    idx, found = find_coords(jnp.asarray(table), jnp.asarray(queries))
    idx, found = np.asarray(idx), np.asarray(found)

    table_view = {tuple(r) for r in table.tolist()}
    for q, p, i, f in zip(queries, pos, idx, found):
        expect_found = tuple(q.tolist()) in table_view
        assert f == expect_found, (q, f, expect_found)
        if f:
            np.testing.assert_array_equal(table[i], q)
        # lower-bound property
        if p > 0:
            assert tuple(table[p - 1].tolist()) < tuple(q.tolist())
        if p < len(table):
            assert tuple(table[p].tolist()) >= tuple(q.tolist())


def test_mark_first_occurrences(rng):
    base = random_coords(rng, 100, lo=0, hi=5, batches=2)  # many duplicates
    order = np_lex_order(base)
    s = base[order]
    first = np.asarray(mark_first_occurrences(jnp.asarray(s)))
    seen = set()
    for row, f in zip(s, first):
        t = tuple(row.tolist())
        assert f == (t not in seen)
        seen.add(t)


def test_canonicalize_dedup_and_padding(rng):
    c = random_coords(rng, 300, lo=0, hi=8)
    feats = rng.normal(size=(300, 5)).astype(np.float32)
    mask = rng.random(300) < 0.8
    blk = canonicalize(jnp.asarray(c), jnp.asarray(feats), jnp.asarray(mask), dedup=True)
    m = np.asarray(blk.mask)
    bc = np.asarray(blk.coords)
    n_unique = len({tuple(r) for r in c[mask].tolist()})
    assert m.sum() == n_unique
    # valid-first layout, sorted, padding rows zero-featured
    k = m.sum()
    assert m[:k].all() and not m[k:].any()
    assert (np_lex_order(bc[:k]) == np.arange(k)).all()
    assert (np.asarray(blk.feats)[~m] == 0).all()


def test_features_at_coordinates(rng):
    c = random_coords(rng, 200)
    feats = rng.normal(size=(200, 3)).astype(np.float32)
    blk = canonicalize(jnp.asarray(c), jnp.asarray(feats), dedup=True)
    # query: half hits (valid rows of the block), half misses
    bc, bm = np.asarray(blk.coords), np.asarray(blk.mask)
    hits = bc[bm][:50]
    misses = random_coords(rng, 50, lo=1000, hi=2000)
    q = np.concatenate([hits, misses])
    out = np.asarray(features_at_coordinates(blk, jnp.asarray(q)))
    bf = np.asarray(blk.feats)
    lut = {tuple(r.tolist()): f for r, f in zip(bc[bm], bf[bm])}
    for qi, oi in zip(q, out):
        expect = lut.get(tuple(qi.tolist()), np.zeros(3, np.float32))
        np.testing.assert_allclose(oi, expect)


def test_voxelize_dedup_cap(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    cols = rng.random((500, 3)).astype(np.float32)
    blk = voxelize_points(jnp.asarray(pts), jnp.asarray(cols), voxel_size=0.05, max_points=100)
    m = np.asarray(blk.mask)
    assert m.sum() <= 100
    vox = np.round(pts / 0.05).astype(np.int32)
    n_unique = len({tuple(r) for r in vox.tolist()})
    assert m.sum() == min(100, n_unique)
    # capped selection keeps the largest-z voxels
    kept_z = np.asarray(blk.coords)[m][:, 3]
    all_z = np.array(sorted({tuple(r) for r in vox.tolist()}, key=lambda t: -t[2]))[:, 2]
    assert sorted(kept_z.tolist(), reverse=True) == sorted(all_z[: m.sum()].tolist(), reverse=True)


def test_merge_blocks(rng):
    c1, c2 = random_coords(rng, 64, lo=0, hi=6), random_coords(rng, 64, lo=0, hi=6)
    f1 = rng.normal(size=(64, 2)).astype(np.float32)
    f2 = rng.normal(size=(64, 2)).astype(np.float32)
    a = canonicalize(jnp.asarray(c1), jnp.asarray(f1), dedup=True)
    b = canonicalize(jnp.asarray(c2), jnp.asarray(f2), dedup=True)
    m = merge_blocks(a, b)
    am, bm = np.asarray(a.mask), np.asarray(b.mask)
    expect = {tuple(r) for r in np.asarray(a.coords)[am].tolist()} | {
        tuple(r) for r in np.asarray(b.coords)[bm].tolist()
    }
    assert np.asarray(m.mask).sum() == len(expect)


def test_block_pad_to(rng):
    c = random_coords(rng, 32)
    f = rng.normal(size=(32, 2)).astype(np.float32)
    blk = canonicalize(jnp.asarray(c), jnp.asarray(f))
    big = blk.pad_to(128)
    assert big.capacity == 128
    assert int(big.count()) == int(blk.count())
