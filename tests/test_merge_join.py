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


def test_find_keys_matches_isin_oracle(rng):
    """find_keys (key-level membership twin of find_coords) must match a
    NumPy isin oracle on packed uint64 keys, on BOTH dispatch paths
    (binary search for small problems, merge join for large), with
    sentinel-padded tables and sentinel queries never matching."""
    from pct.sparse.coords import find_keys

    for n_tab, n_q in ((500, 2000), (6000, 24000)):  # below / above the
        # (ns + nq) >= 8192 merge-join dispatch threshold
        tab = _sorted_table(rng, n_tab)
        t_hi, t_lo = pack_keys(tab)
        t64 = (np.asarray(t_hi).astype(np.uint64) << np.uint64(32)) | np.asarray(t_lo)
        order = np.argsort(t64)
        t64 = t64[order]
        # sentinel-pad the sorted table (the guided true-table contract)
        pad = 37
        hi_s = np.full(t64.size + pad, 0xFFFFFFFF, np.uint32)
        lo_s = np.full(t64.size + pad, 0xFFFFFFFF, np.uint32)
        hi_s[: t64.size] = (t64 >> np.uint64(32)).astype(np.uint32)
        lo_s[: t64.size] = (t64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)

        q = np.array(_sorted_table(rng, n_q))
        # make ~half the queries true members
        hit = rng.random(q.shape[0]) < 0.5
        tab_np = np.asarray(tab)
        q[hit] = tab_np[rng.integers(0, tab_np.shape[0], int(hit.sum()))]
        q_hi, q_lo = pack_keys(jnp.asarray(q))
        # mask a slice of queries to sentinels: must return False
        qm = rng.random(q.shape[0]) < 0.9
        q_hi = jnp.where(jnp.asarray(qm), q_hi, SENTINEL_HI)
        q_lo = jnp.where(jnp.asarray(qm), q_lo, jnp.uint32(0xFFFFFFFF))

        got = np.asarray(find_keys(jnp.asarray(hi_s), jnp.asarray(lo_s), q_hi, q_lo))
        q64 = (np.asarray(q_hi).astype(np.uint64) << np.uint64(32)) | np.asarray(q_lo)
        want = np.isin(q64, t64) & qm
        assert np.array_equal(got, want), (n_tab, n_q, int((got != want).sum()))
