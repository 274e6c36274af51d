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
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pct.sparse import coords as coords_lib
from pct.sparse.block import PAD_COORD, SparseBlock
from pct.ops.kernel_maps import build_kernel_map, build_self_kernel_map, kernel_offsets


K_CHUNK = 9  # taps materialized per gather (27 = 3 chunks); bounds the
# [N*K_CHUNK, C_in] gather intermediate that HBM has to hold per conv

# Gather/GEMM compute dtype for the feature path. bfloat16 halves the bytes
# of the tap gathers (the dominant conv cost after kernel-map search) and
# doubles MXU rate; accumulation stays float32. Set via set_compute_dtype()
# — the parity-critical hyperprior path enforces float32 by calling
# set_compute_dtype(float32) at ColorModel.h_s entry (trace time), so the
# (scale, mean) -> index derivation never runs in bf16 even when the
# checkpoint's feature path is bfloat16. THREAD-LOCAL: the pipelined codecs
# trace device-stage (config dtype) and host-stage (pinned float32) graphs
# on different threads concurrently; a process-global would let one thread's
# entry-set leak into another thread's mid-trace conv calls and flip the
# parity-critical path to bf16 (ADVICE r3, medium).
_DTYPE_TLS = threading.local()


def set_compute_dtype(dtype) -> None:
    _DTYPE_TLS.value = jnp.dtype(dtype)


def get_compute_dtype():
    return getattr(_DTYPE_TLS, "value", jnp.float32)


# ---------------------------------------------------------------------------
# Banded gather (TPU): kernel-map tap gathers as windowed one-hot MXU dots.
#
# Round-4 on-chip measurement: XLA row gathers on TPU cost a CONSTANT ~40 ns
# per row regardless of row width (64 B rows move at 1.7 GB/s; 576 B rows at
# 13 GB/s — both ~25-60x below HBM bandwidth), so a 27-tap conv at 1M rows
# spends ~400 ms just fetching taps. But kernel-map tap indexes are
# NEAR-MONOTONIC in the query row (both coordinate sets are canonically
# sorted; a fixed spatial offset shifts the source row by the local voxel
# density), so within a block of B consecutive queries each tap's indexes
# span only ~B-ish rows. The banded path exploits this: per (tap, block) it
# slices a [2W, C] window of the source table and gathers by a one-hot
# [B, 2W] @ [2W, C] matmul — the MXU moves the data instead of the scalar
# gather unit. Bit-wise this reproduces the gather (1.0 * x with f32/bf16x3
# accumulation of one nonzero term is exact); only the K-tap ACCUMULATION
# order differs from the chunked-GEMM path (same tolerance class as
# cross-backend XLA codegen differences, which the codec's integerized
# index derivation already absorbs). A runtime lax.cond falls back to the
# classic path whenever any block's in-window spread exceeds 2W.
# ---------------------------------------------------------------------------

BANDED_BLOCK = 512  # queries per banded block
# Source-window rows per (tap, block): measured in-window spreads on real
# surface maps are <=1050 at 150k-400k rows (p99.9 ~550); the runtime
# fallback covers anything wider.
BANDED_WINDOW = 1024
BANDED_MIN_ROWS = 65536  # below this, plain gathers are cheap enough

def use_banded_gather() -> bool:
    """Default OFF on every backend (PCT_BANDED_GATHER=1 re-enables for
    A/B). The tap-gather microbench promised a win (row gathers are
    descriptor-bound at ~40 ns/row on TPU), but end-to-end the banded path
    LOSES at every measured operating point on the v5e rig — 76k x 5:
    6.75 vs 7.19 e2e fps; 400k: 2.17 vs 2.02 s decode; 800k: 5.49 vs
    4.94 s decode — the [B, 2W] one-hot construction + window loads cost
    more than the gathers they replace (PERF.md round 4)."""
    import os

    env = os.environ.get("PCT_BANDED_GATHER")
    if env is not None:
        return env not in ("0", "false", "")
    return False


def _gather_gemm_banded(
    table: jax.Array,  # [n+1, cin] (zero row appended), compute dtype
    safe_idx: jax.Array,  # [N, K], missing -> n (zero row)
    weight: jax.Array,  # [K, cin, cout], compute dtype
    n_rows: int,
) -> jax.Array:
    """sum_k table[safe_idx[:, k]] @ weight[k] via per-(tap, block) windowed
    one-hot dots. Caller guarantees every in-window spread < 2W (checked by
    the lax.cond dispatch in :func:`_gather_gemm`)."""
    N, K = safe_idx.shape
    cin, cout = weight.shape[1], weight.shape[2]
    B, W2 = BANDED_BLOCK, 2 * BANDED_WINDOW
    nb = N // B
    cdt = table.dtype
    idx_b = safe_idx.reshape(nb, B, K)
    missing = idx_b >= n_rows
    masked = jnp.where(missing, jnp.int32(2**30), idx_b)
    bases = jnp.min(masked, axis=1)  # [nb, K]
    bases = jnp.clip(bases, 0, max(n_rows + 1 - W2, 0))
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, W2), 1)
    wmats = [weight[k].astype(cdt) for k in range(K)]

    def step(carry, inp):
        idxk, basek = inp  # [B, K], [K]
        acc = jnp.zeros((B, cout), jnp.float32)
        for k in range(K):
            win = jax.lax.dynamic_slice(table, (basek[k], 0), (W2, cin))
            oh = (idxk[:, k, None] - basek[k] == iota).astype(cdt)
            g = jnp.dot(oh, win, preferred_element_type=cdt)
            acc = acc + jnp.dot(g, wmats[k], preferred_element_type=jnp.float32)
        return carry, acc

    _, out = jax.lax.scan(step, None, (idx_b, bases))
    return out.reshape(N, cout)


def _gather_gemm(
    feats: jax.Array,
    idx: jax.Array,
    found: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array],
    out_mask: jax.Array,
) -> jax.Array:
    """sum_k feats[idx[:, k]] @ weight[k] with missing taps zeroed.

    Gathers K_CHUNK taps at a time and contracts each chunk as one
    [N, K_CHUNK*C_in] @ [K_CHUNK*C_in, C_out] MXU matmul. Missing taps gather
    an appended all-zero row instead of a mask broadcast (a [N, K, C]
    mask-multiply materializes the full tap tensor — at 1M rows that was an
    OOM on 16 GB HBM). Chunking keeps both the peak intermediate and the
    traced graph size bounded."""
    k, cin, cout = weight.shape
    n = idx.shape[0]
    cdt = get_compute_dtype()
    table = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    table = table.astype(cdt)  # cast once; the 27x tap gather reads half the bytes
    safe_idx = jnp.where(found, idx, feats.shape[0])  # missing -> zero row

    def classic(_):
        acc = jnp.zeros((n, cout), jnp.float32)
        for k0 in range(0, k, K_CHUNK):
            kc = min(K_CHUNK, k - k0)
            g = table[safe_idx[:, k0 : k0 + kc].reshape(-1)]  # [N*kc, Cin]
            g = g.reshape(n, kc * cin)
            w = weight[k0 : k0 + kc].reshape(kc * cin, cout).astype(cdt)
            acc = acc + jnp.dot(g, w, preferred_element_type=jnp.float32)
        return acc

    if use_banded_gather() and n >= BANDED_MIN_ROWS and n % BANDED_BLOCK == 0:
        W2 = 2 * BANDED_WINDOW
        idx_b = safe_idx.reshape(n // BANDED_BLOCK, BANDED_BLOCK, k)
        missing = idx_b >= feats.shape[0]
        masked = jnp.where(missing, jnp.int32(2**30), idx_b)
        bases = jnp.clip(
            jnp.min(masked, axis=1), 0, max(feats.shape[0] + 1 - W2, 0)
        )
        rel = jnp.where(missing, 0, idx_b - bases[:, None, :])
        in_band = jnp.max(rel) < W2

        def banded(_):
            return _gather_gemm_banded(table, safe_idx, weight.astype(cdt), feats.shape[0])

        acc = jax.lax.cond(in_band, banded, classic, operand=None)
    else:
        acc = classic(None)
    if bias is not None:
        acc = acc + bias
    acc = acc.astype(feats.dtype)
    return jnp.where(out_mask[:, None], acc, 0)


def build_kmap(
    block: SparseBlock,
    kernel_size: int,
    num_frames: int = 0,
    union_frac: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Kernel map of a same-coordinate conv on ``block`` — build once and pass
    to several ``sparse_conv`` calls over the same coordinate set (e.g. a
    feature conv and its occupancy head in the decoder) to skip repeated
    sorted searches (the kernel-map-reuse north star, BASELINE.json).

    With ``num_frames >= 2`` and ``union_frac > 0``, odd kernels build the
    map through the GOP-union coordinate set
    (:func:`pct.ops.kernel_maps.build_self_kernel_map_gop`): the merge-rank
    join runs once on the deduplicated xyz union (capacity
    ``union_frac * capacity``) instead of per frame — bit-identical output,
    with an in-graph fallback to the direct join when the union overflows."""
    offs = kernel_offsets(kernel_size)
    if kernel_size % 2 == 1:
        if num_frames >= 2 and union_frac > 0.0:
            from pct.ops.kernel_maps import build_self_kernel_map_gop

            cap_u = max(256, int(block.capacity * union_frac))
            return build_self_kernel_map_gop(
                block, offs, block.stride, num_frames, cap_u
            )
        # same-grid odd kernels take the symmetric fast path: query only the
        # negative offset half and scatter the mirror hits (half the sort
        # volume of the general map build)
        return build_self_kernel_map(block, offs, block.stride)
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
        if kmap is None:
            kmap = build_kmap(block, ksize)
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


@dataclasses.dataclass(frozen=True)
class DownPlan:
    """Structure of one stride-``factor`` downsampling step, computed from
    coordinates alone (:func:`down_plan`): reusable by ``sparse_conv_down``
    (skips its internal sort) and by the octree-derived kernel-map chain
    (``prow``/``tap`` are exactly the ``parent_row``/``slot`` inputs of
    :func:`pct.ops.kernel_maps.derive_child_self_kmap`)."""

    perm: jax.Array  # [n] cell-sorted position -> canonical input row
    seg: jax.Array  # [n] output row per sorted position (masked -> n-1)
    stap: jax.Array  # [n] kernel tap per sorted position
    sm: jax.Array  # [n] input mask in sorted order
    first: jax.Array  # [n] first-occurrence flags (sorted order)
    tap: jax.Array  # [n] kernel tap / child slot per canonical input row
    prow: jax.Array  # [n] parent (output) row per canonical input row
    out_coords: jax.Array  # [n, 4] canonical parent coordinates
    out_mask: jax.Array  # [n]


def down_plan(block: SparseBlock, factor: int = 2) -> DownPlan:
    """Compute the sort/segment structure of ``sparse_conv_down`` from the
    block's coordinates (features unused)."""
    n = block.capacity
    step = jnp.int32(block.stride * factor)
    cxyz = jnp.floor_divide(block.coords[:, 1:], step) * step
    cell_coords = jnp.concatenate([block.coords[:, :1], cxyz], axis=1)
    cell_coords = jnp.where(
        block.mask[:, None], cell_coords, jnp.array(PAD_COORD, jnp.int32)[None, :]
    )
    tap_xyz = jnp.floor_divide(block.coords[:, 1:] - cxyz, jnp.int32(block.stride))
    tap = (tap_xyz[:, 0] * factor + tap_xyz[:, 1]) * factor + tap_xyz[:, 2]
    tap = jnp.clip(tap, 0, factor**3 - 1)

    perm = coords_lib.lex_argsort(cell_coords, block.mask)
    sc = cell_coords[perm]
    sm = block.mask[perm]
    stap = tap[perm]
    first = coords_lib.mark_first_occurrences(sc, sm)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(sm, seg, n - 1)

    out_c = jnp.full((n, 4), jnp.array(PAD_COORD, jnp.int32)[None, :])
    out_c = out_c.at[jnp.where(first, seg, n - 1)].set(
        jnp.where(first[:, None], sc, out_c[0])
    )
    out_mask = jnp.zeros((n,), bool).at[jnp.where(first, seg, n - 1)].set(first)
    prow = jnp.zeros((n,), jnp.int32).at[perm].set(seg)
    return DownPlan(
        perm=perm, seg=seg, stap=stap, sm=sm, first=first, tap=tap, prow=prow,
        out_coords=out_c, out_mask=out_mask,
    )


def sparse_conv_down(
    block: SparseBlock,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    factor: int = 2,
    plan: Optional[DownPlan] = None,
) -> SparseBlock:
    """Strided downsampling conv: tensor stride ``s -> s*factor``.

    With kernel == stride (``factor^3`` corner-anchored taps, the reference
    model's stride-2 down-convs), every input voxel contributes to exactly
    one output cell, so no kernel-map search is needed: sort inputs by their
    downsampled cell (one lex sort), derive segment ids from
    first-occurrence cumsums, premultiply each row by its in-cell tap weight,
    and segment-sum. General kernel sizes fall back to the searched path.
    """
    ksize = round(weight.shape[0] ** (1 / 3))
    assert ksize**3 == weight.shape[0]
    if ksize != factor:
        offs = kernel_offsets(ksize)
        out_coords, out_mask = downsample_coords(block, factor)
        idx, found = build_kernel_map(block, out_coords, out_mask, offs, block.stride)
        feats = _gather_gemm(block.feats, idx, found, weight, bias, out_mask)
        return SparseBlock(
            coords=out_coords, feats=feats, mask=out_mask, stride=block.stride * factor
        )

    n = block.capacity
    if plan is None:
        plan = down_plan(block, factor)
    sf = block.feats[plan.perm]
    sm, stap, seg = plan.sm, plan.stap, plan.seg

    # per-row contribution: feats row x its tap's weight — as f^3 masked
    # matmuls (a per-row weight gather would materialize [N, Cin, Cout])
    contrib = jnp.zeros((n, weight.shape[2]), sf.dtype)
    for t in range(weight.shape[0]):
        sel = (stap == t).astype(sf.dtype)[:, None]
        contrib = contrib + jnp.dot(
            sf * sel, weight[t], preferred_element_type=sf.dtype
        )
    feats_out = jax.ops.segment_sum(
        jnp.where(sm[:, None], contrib, 0), seg, num_segments=n
    )

    out_c, out_mask = plan.out_coords, plan.out_mask
    if bias is not None:
        feats_out = feats_out + bias
    feats_out = jnp.where(out_mask[:, None], feats_out, 0)
    return SparseBlock(
        coords=out_c, feats=feats_out, mask=out_mask, stride=block.stride * factor
    )


def generative_conv_up(
    block: SparseBlock,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    factor: int = 2,
    return_rows: bool = False,
):
    """Generative transposed conv: stride ``s -> s/factor``, every voxel expands
    to its ``factor^3`` children.

    ``weight``: ``[factor^3, C_in, C_out]``. Children of distinct parents are
    distinct (kernel == stride), so this is one batched GEMM + reshape;
    output capacity is ``factor^3 * N``. Output is returned in canonical order.
    With ``return_rows`` also returns each output row's ``(parent row, slot)``
    — the inputs of :func:`pct.ops.kernel_maps.derive_child_self_kmap`, so a
    following same-grid conv can derive its kernel map from the parent
    grid's instead of merge-join searching the ``factor^3``-times-larger
    child grid.
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
    out = SparseBlock(
        coords=child_coords[perm],
        feats=feats[perm],
        mask=child_mask[perm],
        stride=child_stride,
    )
    if return_rows:
        return out, perm // f3, perm % f3
    return out


def up_features_at(
    block: SparseBlock,
    up_weight: jax.Array,
    up_bias: Optional[jax.Array],
    out_coords: jax.Array,
    out_mask: jax.Array,
    factor: int = 2,
    return_rows: bool = False,
):
    """Generative up-conv features evaluated at given child coordinates.

    Each child has exactly one parent: premultiply the parent feature table
    by all ``factor^3`` tap weights, then fetch (parent, tap) rows with one
    gather. Children whose parent is absent (or masked rows) get zeros.
    Returns ``[N_out, C_out]``; with ``return_rows`` also each child's
    ``(parent row, found, tap)`` — the inputs of
    :func:`pct.ops.kernel_maps.derive_child_self_kmap`, so callers with
    known coordinate pyramids (the lossless-geometry path) can derive the
    child's self kernel map instead of merge-join searching it.
    """
    child_stride = block.stride // factor
    step = jnp.int32(block.stride)
    pxyz = jnp.floor_divide(out_coords[:, 1:], step) * step
    parents = jnp.concatenate([out_coords[:, :1], pxyz], axis=1)
    cell = jnp.floor_divide(out_coords[:, 1:] - pxyz, jnp.int32(child_stride))
    tap = (cell[:, 0] * factor + cell[:, 1]) * factor + cell[:, 2]

    idx, found = coords_lib.find_coords(block.coords, parents, block.mask, out_mask)
    f3 = up_weight.shape[0]
    premul = jnp.einsum(
        "nc,tcd->ntd", block.feats, up_weight, preferred_element_type=block.feats.dtype
    )
    if up_bias is not None:
        premul = premul + up_bias
    c_out = premul.shape[-1]
    premul = premul.reshape(block.capacity * f3, c_out)
    premul = jnp.concatenate([premul, jnp.zeros((1, c_out), premul.dtype)], axis=0)
    flat = jnp.where(found & out_mask, idx * f3 + tap, block.capacity * f3)
    out = premul[flat]
    if return_rows:
        return out, idx, found, tap
    return out


def build_kmap_unsorted(
    block: SparseBlock,
    kernel_size: int,
) -> tuple[jax.Array, jax.Array]:
    """Self kernel map of a block whose rows are NOT canonically sorted
    (e.g. the survivor grids of the one-sort select+compact, which stay in
    candidate-index order): sort a coordinate view internally, run the
    sorted-search build, and remap both the row axis and the index values
    back through the permutation. Output rows/indices refer to the block's
    OWN order, exactly as :func:`build_kmap` on a sorted block would."""
    order = coords_lib.lex_argsort(block.coords, block.mask)
    sorted_block = SparseBlock(
        coords=block.coords[order],
        feats=block.feats[:, :1][order],
        mask=block.mask[order],
        stride=block.stride,
    )
    idx_s, found_s = build_kmap(sorted_block, kernel_size)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype)
    )
    return order[idx_s][inv], found_s[inv]


def up_features_compact(
    parent_feats: jax.Array,
    up_weight: jax.Array,
    up_bias: Optional[jax.Array],
    perm: jax.Array,
    keep: jax.Array,
) -> jax.Array:
    """Generative up-conv features for survivor rows selected OUT OF a
    parent expansion: premultiply every parent row by all ``f^3`` tap
    weights and gather each survivor's pre-sort flat candidate index
    ``perm`` (``parent_row * f^3 + slot``); rows with ``keep`` false are
    zeroed. Bit-identical to :func:`up_features_at` evaluated at the same
    rows (every candidate's parent is its own expansion source), minus its
    parent-find join. This is the ONE definition of the parity-critical
    survivor-feature gather — the decoder g_s, the guided pyramid, and the
    geometry model all call it (the guided logits feed entropy coding, so
    the paths must stay bit-identical to each other forever).
    """
    premul = jnp.einsum(
        "nc,tcd->ntd", parent_feats, up_weight,
        preferred_element_type=parent_feats.dtype,
    )
    if up_bias is not None:
        premul = premul + up_bias
    out = premul.reshape(parent_feats.shape[0] * up_weight.shape[0], -1)[perm]
    return jnp.where(keep[:, None], out, 0)


def generative_up_conv_at(
    block: SparseBlock,
    up_weight: jax.Array,
    up_bias: Optional[jax.Array],
    conv_weight: jax.Array,
    conv_bias: Optional[jax.Array],
    out_coords: jax.Array,
    out_mask: jax.Array,
    factor: int = 2,
) -> jax.Array:
    """Fused [generative up-conv -> same-grid conv] evaluated ONLY at
    ``out_coords`` (half the stride of ``block``).

    Every candidate child of a generative up has exactly one parent, so the
    up value at any coordinate q is a single parent gather + the tap weight
    selected by q's position within the parent cell. The following conv at
    ``out_coords`` then needs up values only at its K taps — ``K * N_out``
    rows total, independent of how many candidates a materialized upsample
    would create. This is how hyper-synthesis avoids building the full
    stride-8 candidate set it would immediately discard (the reference
    instead materializes it and joins with ``features_at_coordinates``,
    ``codec_parallel.py:387``).

    Returns features ``[N_out, C_out]``.
    """
    child_stride = block.stride // factor
    ksize = round(conv_weight.shape[0] ** (1 / 3))
    offs = kernel_offsets(ksize)  # conv taps, in child-stride units
    koff = jnp.asarray(offs, jnp.int32) * jnp.int32(child_stride)
    koff4 = jnp.concatenate([jnp.zeros((koff.shape[0], 1), jnp.int32), koff], axis=1)
    n_out, k = out_coords.shape[0], koff.shape[0]

    # queries q = out + tap offset (positions where the conv samples up values)
    q = (out_coords[:, None, :] + koff4[None, :, :]).reshape(n_out * k, 4)
    qmask = jnp.broadcast_to(out_mask[:, None], (n_out, k)).reshape(-1)

    # each q's unique parent on the block's grid + its tap inside the cell
    step = jnp.int32(block.stride)
    pxyz = jnp.floor_divide(q[:, 1:], step) * step
    parents = jnp.concatenate([q[:, :1], pxyz], axis=1)
    cell = jnp.floor_divide(q[:, 1:] - pxyz, jnp.int32(child_stride))  # 0/1 per axis
    tap = (cell[:, 0] * factor + cell[:, 1]) * factor + cell[:, 2]  # matches kernel_offsets(2)

    idx, found = coords_lib.find_coords(block.coords, parents, block.mask, qmask)
    # Premultiply the (small) parent table by all f^3 tap weights, then fetch
    # (parent, tap) pairs with a single gather — avoids a [N*K, Cin, C_mid]
    # per-row weight materialization.
    f3 = up_weight.shape[0]
    premul = jnp.einsum(
        "nc,tcd->ntd", block.feats, up_weight, preferred_element_type=block.feats.dtype
    )
    if up_bias is not None:
        premul = premul + up_bias
    c_mid_ = premul.shape[-1]
    premul = premul.reshape(block.capacity * f3, c_mid_)
    premul = jnp.concatenate([premul, jnp.zeros((1, c_mid_), premul.dtype)], axis=0)
    flat = jnp.where(found, idx * f3 + tap, block.capacity * f3)
    up_vals = premul[flat]  # [N*K, C_mid]; absent candidate == zero row

    c_mid = up_vals.shape[1]
    g = up_vals.reshape(n_out, k * c_mid)
    out = jnp.dot(
        g, conv_weight.reshape(k * c_mid, -1), preferred_element_type=up_vals.dtype
    )
    if conv_bias is not None:
        out = out + conv_bias
    return jnp.where(out_mask[:, None], out, 0)


def prune_block(block: SparseBlock, keep: jax.Array) -> SparseBlock:
    """Restrict a block to ``keep`` rows and restore canonical (valid-first) form."""
    mask = block.mask & keep
    coords = jnp.where(mask[:, None], block.coords, jnp.array(PAD_COORD, jnp.int32)[None, :])
    feats = jnp.where(mask[:, None], block.feats, 0)
    perm = coords_lib.lex_argsort(coords, mask)
    return dataclasses.replace(
        block, coords=coords[perm], feats=feats[perm], mask=mask[perm]
    )
