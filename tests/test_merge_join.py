"""Merge-rank join: oracle equivalence with the binary-search path.

The join (``merge_join_keys``) replaces per-query binary search for large
query sets — TPU row gathers serialize on the duplicate/clustered addresses
kernel-map queries produce, while one 3-operand ``lax.sort`` + scans runs at
HBM bandwidth (measured 157 ms -> 25 ms for a 98k-table / 2.65M-query conv
kernel map on v5e).
"""

import numpy as np
import jax.numpy as jnp

from pct.sparse.coords import (
    SENTINEL_HI,
    _masked_keys,
    _searchsorted_keys_xla,
    merge_join_keys,
    pack_keys,
)


def _sorted_table(rng, n, batches=3, extent=200):
    c = np.zeros((n, 4), np.int32)
    c[:, 0] = rng.integers(0, batches, n)
    c[:, 1:] = rng.integers(-extent, extent, (n, 3))
    c = np.unique(c, axis=0)
    return jnp.asarray(c)


def test_merge_join_matches_binary_search(rng):
    tbl = _sorted_table(rng, 4096)
    n = tbl.shape[0]
    q = np.concatenate(
        [
            np.asarray(tbl)[rng.integers(0, n, 3000)],  # guaranteed hits (with dups)
            rng.integers(-300, 300, (2000, 4)).astype(np.int32),
        ]
    )
    h_s, l_s = pack_keys(tbl)
    h_q, l_q = pack_keys(jnp.asarray(q))
    ref = np.asarray(_searchsorted_keys_xla(h_s, l_s, h_q, l_q))
    pos, found = merge_join_keys(h_s, l_s, h_q, l_q)
    np.testing.assert_array_equal(np.asarray(pos), ref)
    # found oracle: exact membership
    tbl_set = {tuple(r) for r in np.asarray(tbl)}
    want = np.array([tuple(r) in tbl_set for r in q])
    np.testing.assert_array_equal(np.asarray(found), want)


def test_merge_join_masked_rows(rng):
    tbl = _sorted_table(rng, 512)
    n = tbl.shape[0]
    mask_t = np.ones(n, bool)
    mask_t[-50:] = False  # padding tail
    q = np.asarray(tbl)[rng.integers(0, n, 400)]
    qmask = np.ones(400, bool)
    qmask[::7] = False
    h_s, l_s = _masked_keys(tbl, jnp.asarray(mask_t))
    h_q, l_q = _masked_keys(jnp.asarray(q), jnp.asarray(qmask))
    pos, found = merge_join_keys(h_s, l_s, h_q, l_q)
    found = np.asarray(found)
    # masked queries never match
    assert not found[~qmask].any()
    # valid queries that target masked table rows never match
    valid_keys = {tuple(r) for r, m in zip(np.asarray(tbl), mask_t) if m}
    for i in np.nonzero(qmask)[0]:
        assert found[i] == (tuple(q[i]) in valid_keys)


def test_merge_join_all_sentinel():
    h_s = jnp.full((16,), SENTINEL_HI)
    l_s = jnp.full((16,), SENTINEL_HI)
    h_q = jnp.full((64,), SENTINEL_HI)
    l_q = jnp.full((64,), SENTINEL_HI)
    _, found = merge_join_keys(h_s, l_s, h_q, l_q)
    assert not np.asarray(found).any()


def test_self_kernel_map_matches_general(rng):
    """build_self_kernel_map (13 queries + mirror scatter) must reproduce
    build_kernel_map (27 queries) exactly on deduped canonical blocks,
    including padding rows and boundary coordinates."""
    import jax.numpy as jnp

    from pct.ops.kernel_maps import (
        build_kernel_map,
        build_self_kernel_map,
        kernel_offsets,
    )
    from pct.sparse.block import canonicalize

    for stride, n, extent in [(1, 700, 24), (8, 300, 160), (1, 63, 6)]:
        pts = np.unique(
            rng.integers(-extent, extent, (n, 3)).astype(np.int32) * stride, axis=0
        )
        b = rng.integers(0, 2, (pts.shape[0], 1)).astype(np.int32)
        coords = np.concatenate([b, pts], axis=1)
        cap = pts.shape[0] + 37  # force padding rows
        coords = np.concatenate([coords, np.zeros((37, 4), np.int32)], axis=0)
        mask = np.concatenate([np.ones(pts.shape[0], bool), np.zeros(37, bool)])
        feats = np.zeros((cap, 2), np.float32)
        blk = canonicalize(
            jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(mask), dedup=True
        ).with_stride(stride)

        offs = kernel_offsets(3)
        idx_g, fnd_g = build_kernel_map(blk, blk.coords, blk.mask, offs, stride)
        idx_s, fnd_s = build_self_kernel_map(blk, offs, stride)
        np.testing.assert_array_equal(np.asarray(fnd_s), np.asarray(fnd_g))
        fg = np.asarray(fnd_g)
        np.testing.assert_array_equal(
            np.asarray(idx_s)[fg], np.asarray(idx_g)[fg]
        )
