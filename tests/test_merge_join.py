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
