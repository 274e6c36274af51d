"""topk_compact / down_plan / generative_conv_up(return_rows) invariants.

These back the one-sort select+compact and derived-kernel-map rework: the
compact variant must select exactly the rows the mask variant selects (the
reference's per-frame top-k contract, codec_parallel.py:465-472), and the
structure helpers must be bit-equivalent to the ops they were factored from.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pct.ops.conv import down_plan, generative_conv_up, sparse_conv_down
from pct.ops.topk import topk_compact, topk_per_batch_mask
from pct.sparse import coords as coords_lib
from pct.sparse.block import PAD_COORD, SparseBlock


def _rand_block(rng, n, nb, stride=2, channels=3):
    pts = []
    for b in range(nb):
        xyz = rng.integers(-30, 30, (n, 3)) * stride
        pts.append(np.concatenate([np.full((n, 1), b), xyz], axis=1).astype(np.int32))
    coords = np.unique(np.concatenate(pts), axis=0)
    m = coords.shape[0]
    cap = 1 << int(np.ceil(np.log2(m + 8)))
    perm = coords_lib.lex_argsort(jnp.asarray(coords), jnp.ones((m,), bool))
    feats = jnp.asarray(rng.standard_normal((m, channels)), jnp.float32)
    return SparseBlock(
        coords=jnp.concatenate(
            [jnp.asarray(coords)[perm],
             jnp.broadcast_to(jnp.array(PAD_COORD, jnp.int32)[None, :], (cap - m, 4))]
        ),
        feats=jnp.concatenate([feats[perm], jnp.zeros((cap - m, channels), jnp.float32)]),
        mask=jnp.concatenate([jnp.ones((m,), bool), jnp.zeros((cap - m,), bool)]),
        stride=stride,
    )


def test_topk_compact_matches_mask_variant():
    rng = np.random.default_rng(0)
    n, nb = 4096, 3
    batch = jnp.asarray(rng.integers(0, nb, n).astype(np.int32))
    scores = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    # force score ties to exercise the stable (by index) tie-break
    scores = jnp.round(scores * 4) / 4
    valid = jnp.asarray(rng.random(n) < 0.8)
    k = jnp.asarray([100, 0, 57], jnp.int32)

    keep_mask = valid & topk_per_batch_mask(batch, scores, valid, k)
    sel, keep = topk_compact(batch, scores, valid, k, cap=512)

    want_rows = np.flatnonzero(np.asarray(keep_mask))
    got_rows = np.asarray(sel)[np.asarray(keep)]
    assert np.array_equal(got_rows, want_rows), "same rows, candidate-index order"
    assert int(keep.sum()) == int(keep_mask.sum())
    # valid entries occupy a prefix
    karr = np.asarray(keep)
    assert not karr[int(karr.sum()):].any()


def test_topk_compact_cap_drop():
    """Survivors beyond cap are dropped (the capacity-overflow contract),
    keeping the first-by-index ones."""
    n = 64
    batch = jnp.zeros((n,), jnp.int32)
    scores = jnp.ones((n,), jnp.float32)  # all tied -> index order
    valid = jnp.ones((n,), bool)
    sel, keep = topk_compact(batch, scores, valid, jnp.asarray([50], jnp.int32), cap=32)
    assert int(keep.sum()) == 32
    assert np.array_equal(np.asarray(sel), np.arange(32))


def test_down_plan_matches_inline_down_conv():
    rng = np.random.default_rng(1)
    block = _rand_block(rng, 700, 2, stride=2, channels=4)
    w = jnp.asarray(rng.standard_normal((8, 4, 5)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(5) * 0.1, jnp.float32)
    out_inline = sparse_conv_down(block, w, b)
    out_planned = sparse_conv_down(block, w, b, plan=down_plan(block))
    assert jnp.array_equal(out_inline.coords, out_planned.coords)
    assert jnp.array_equal(out_inline.mask, out_planned.mask)
    assert jnp.array_equal(out_inline.feats, out_planned.feats)


def test_down_plan_prow_tap_roundtrip():
    """(prow, tap) must reconstruct each input row's coordinate from its
    parent's — the contract derive_child_self_kmap consumes."""
    rng = np.random.default_rng(2)
    block = _rand_block(rng, 500, 2, stride=2)
    plan = down_plan(block)
    prow, tap = np.asarray(plan.prow), np.asarray(plan.tap)
    pc = np.asarray(plan.out_coords)
    c = np.asarray(block.coords)
    m = np.asarray(block.mask)
    s = block.stride
    tap_xyz = np.stack([tap // 4, (tap // 2) % 2, tap % 2], axis=1) * s
    rec = pc[prow].copy()
    rec[:, 1:] += tap_xyz
    assert np.array_equal(rec[m], c[m])


def test_build_kmap_unsorted_matches_sorted():
    """build_kmap_unsorted on a shuffled block must give the same neighbor
    relation as build_kmap on the canonical block, with indices remapped to
    the shuffled row order."""
    from pct.ops.conv import build_kmap, build_kmap_unsorted

    rng = np.random.default_rng(5)
    block = _rand_block(rng, 400, 2, stride=2, channels=2)
    idx_s, found_s = build_kmap(block, 3)

    shuf = rng.permutation(block.capacity)
    shuffled = SparseBlock(
        coords=block.coords[shuf], feats=block.feats[shuf],
        mask=block.mask[shuf], stride=block.stride,
    )
    idx_u, found_u = build_kmap_unsorted(shuffled, 3)

    # map every (row, tap) hit back to coordinates and compare as sets
    def hits(coords, idx, found):
        out = set()
        c = np.asarray(coords)
        I, F = np.asarray(idx), np.asarray(found)
        for r in range(c.shape[0]):
            for t in range(27):
                if F[r, t]:
                    out.add((tuple(c[r]), t, tuple(c[I[r, t]])))
        return out

    assert hits(block.coords, idx_s, found_s) == hits(shuffled.coords, idx_u, found_u)


def test_generative_up_return_rows():
    rng = np.random.default_rng(3)
    block = _rand_block(rng, 300, 1, stride=4, channels=3)
    w = jnp.asarray(rng.standard_normal((8, 3, 6)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
    out_plain = generative_conv_up(block, w, b)
    out, prow, slot = generative_conv_up(block, w, b, return_rows=True)
    assert jnp.array_equal(out_plain.coords, out.coords)
    assert jnp.array_equal(out_plain.feats, out.feats)
    assert jnp.array_equal(out_plain.mask, out.mask)
    # (prow, slot) reconstructs every valid output coordinate
    prow, slot = np.asarray(prow), np.asarray(slot)
    pc = np.asarray(block.coords)
    oc = np.asarray(out.coords)
    om = np.asarray(out.mask)
    s = out.stride
    slot_xyz = np.stack([slot // 4, (slot // 2) % 2, slot % 2], axis=1) * s
    rec = pc[prow].copy()
    rec[:, 1:] += slot_xyz
    assert np.array_equal(rec[om], oc[om])


def test_topk_packed_key_matches_oracle_and_fallback():
    """The packed single-key sort path (B <= 255) must select exactly the
    same rows as a NumPy per-batch top-k oracle with index tie-break, for
    every batch-field width the packing can produce — and the B > 255
    two-key fallback must agree with the oracle too."""
    rng = np.random.default_rng(7)
    n = 4096
    # distinct integer-valued scores: differences live in high mantissa
    # bits, so the packed key's low-bit truncation can never reorder them
    base_scores = rng.permutation(n).astype(np.float32)

    def oracle(batch, scores, valid, k):
        keep = np.zeros(n, bool)
        for b in range(k.shape[0]):
            rows = np.flatnonzero((batch == b) & valid)
            order = rows[np.lexsort((rows, -scores[rows]))][: k[b]]
            keep[order] = True
        return keep

    for nb in (1, 2, 3, 4, 15, 16, 255, 300):
        batch = rng.integers(0, nb, n).astype(np.int32)
        valid = rng.random(n) < 0.85
        k = rng.integers(0, max(2, n // nb), nb).astype(np.int32)
        got = np.asarray(
            valid
            & topk_per_batch_mask(
                jnp.asarray(batch),
                jnp.asarray(base_scores),
                jnp.asarray(valid),
                jnp.asarray(k),
            )
        )
        assert np.array_equal(got, oracle(batch, base_scores, valid, k)), nb


def test_topk_packed_key_tie_break_is_stable():
    """Scores that collide after low-bit truncation must break ties by
    input position — the same contract exact ties have always had."""
    n, nb = 64, 3
    batch = jnp.asarray(np.arange(n, dtype=np.int32) % nb)
    scores = jnp.ones((n,), jnp.float32)  # all tied
    valid = jnp.ones((n,), bool)
    k = jnp.asarray([5, 5, 5], jnp.int32)
    keep = np.asarray(topk_per_batch_mask(batch, scores, valid, k))
    for b in range(nb):
        rows = np.flatnonzero(np.asarray(batch) == b)
        assert np.array_equal(np.flatnonzero(keep[rows]), np.arange(5)), b
