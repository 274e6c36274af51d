"""Family-form conv (pct/ops/family.py) vs the classic gather-GEMM oracle.

The family conv computes the same tap sums in a different accumulation
order, so equality is allclose (f32), not bit-exact — the documented
tolerance class (family.py docstring)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pct.ops.conv import build_kmap, sparse_conv
from pct.ops.family import (
    family_block_weights,
    family_conv,
    family_keep_mask,
    gather_family,
    scatter_family,
)
from pct.sparse import coords as coords_lib
from pct.sparse.block import bucket_size, canonicalize


def _make_parent_child(rng, n_parent=400, n_frames=2, occupancy=0.45, extent=64):
    """Random parent grid (stride 2) + child grid (stride 1) as slot subsets."""
    pts = np.unique(
        rng.integers(0, extent // 2, (n_parent * 2, 3)).astype(np.int32) * 2, axis=0
    )
    b = rng.integers(0, n_frames, pts.shape[0]).astype(np.int32)
    pc = np.concatenate([b[:, None], pts], axis=1)
    pc = pc[np.lexsort((pc[:, 3], pc[:, 2], pc[:, 1], pc[:, 0]))]
    slots = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.int32)
    occ = rng.random((pc.shape[0], 8)) < occupancy
    rows, prows, slot_ids = [], [], []
    for p in range(pc.shape[0]):
        for s in range(8):
            if occ[p, s]:
                rows.append(np.concatenate([pc[p, :1], pc[p, 1:] + slots[s]]))
                prows.append(p)
                slot_ids.append(s)
    cc = np.asarray(rows, np.int32)
    return pc, cc, np.asarray(prows, np.int32), np.asarray(slot_ids, np.int32)


@pytest.mark.parametrize("cin,cout", [(8, 8), (4, 12)])
def test_family_conv_matches_sparse_conv(rng, cin, cout):
    pc, cc, prow, slot = _make_parent_child(rng)
    ncap = bucket_size(cc.shape[0])
    pcap = bucket_size(pc.shape[0])
    pad_p = pcap - pc.shape[0]
    pcoords = jnp.asarray(np.concatenate([pc, np.zeros((pad_p, 4), np.int32)]))
    pmask = jnp.asarray(np.arange(pcap) < pc.shape[0])
    parent = canonicalize(pcoords, jnp.zeros((pcap, 1), jnp.float32), pmask).with_stride(2)
    pkmap = build_kmap(parent, 3)

    feats = rng.standard_normal((cc.shape[0], cin)).astype(np.float32)
    child = canonicalize(
        jnp.asarray(np.concatenate([cc, np.zeros((ncap - cc.shape[0], 4), np.int32)])),
        jnp.asarray(np.concatenate([feats, np.zeros((ncap - cc.shape[0], cin), np.float32)])),
        jnp.asarray(np.arange(ncap) < cc.shape[0]),
    ).with_stride(1)

    w27 = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
    ref = jax.jit(lambda b: sparse_conv(b, w27, bias).feats)(child)

    # family path: child rows in CANONICAL order -> candidate indexes via the
    # canonical sort of (prow * 8 + slot) ordering used above
    perm_rows = np.full((ncap,), pcap * 8, np.int64)
    # map canonical child rows back to (prow, slot)
    order = np.lexsort((cc[:, 3], cc[:, 2], cc[:, 1], cc[:, 0]))
    perm_rows[: cc.shape[0]] = (prow * 8 + slot)[order]
    keep = jnp.asarray(np.arange(ncap) < cc.shape[0])
    perm = jnp.asarray(perm_rows.astype(np.int32))

    F = scatter_family(child.feats, keep, perm, pcap)
    assert F.shape == (pcap, 8, cin)
    out_fam = jax.jit(
        lambda F: family_conv(F, pkmap, w27, bias, parent.mask)
    )(F)
    got = gather_family(out_fam, perm, keep)

    m = np.asarray(child.mask)
    np.testing.assert_allclose(
        np.asarray(got)[m], np.asarray(ref)[m], rtol=2e-5, atol=2e-5
    )

    # keep-mask round trip
    km = family_keep_mask(perm, keep, pcap)
    assert int(km.sum()) == cc.shape[0]
    back = gather_family(F, perm, keep)
    np.testing.assert_array_equal(np.asarray(back)[m], feats[order])


def test_block_weights_density():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((27, 3, 5)), jnp.float32)
    W = family_block_weights(w)
    assert W.shape == (27, 24, 40)
    # exactly 216 nonzero (s', s) blocks over all taps: each of 8 output
    # slots connects to 27 child offsets, each landing in one (tap, s') pair
    nz = 0
    Wn = np.asarray(W).reshape(27, 8, 3, 8, 5)
    for t in range(27):
        for sp in range(8):
            for s in range(8):
                if np.any(Wn[t, sp, :, s, :]):
                    nz += 1
    assert nz == 216
