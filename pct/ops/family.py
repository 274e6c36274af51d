"""Family-form sparse convolution: 27-tap convs on octree CHILD grids
computed as wide gathers over the PARENT grid.

Why. TPU row gathers are descriptor-bound: ~40 ns per gathered row
regardless of row width (PERF.md round-4 measurements; 64 B and 576 B rows
both land 25-60x below HBM bandwidth). A classic gather-GEMM 27-tap conv at
child-grid capacity N therefore costs ~27*N*40 ns in gathers alone — at the
vox10 scale (N ~ 1M) that is ~1.1 s **per conv**, and the round-4 decode
wall (5.37 s device synthesis at 800k points, evaluation/r4/scale.csv) is
almost entirely this term summed over the synthesis pyramid's convs.

Every grid the synthesis transform convolves is the child grid of the level
above it (each row is child slot ``s`` of a parent cell ``p`` — the
(parent row, slot) pair IS the top-k survivor's pre-sort candidate index,
``pct/models/unified.py g_s``). The family form keeps features in
``[n_parent, 8, C]`` blocks and evaluates the child-grid conv with the
PARENT grid's own 27-tap kernel map:

    child (p, s) at offset d has its neighbor in parent p + dp at slot s',
    where per axis  dp = floor((s + d) / 2),  s' = (s + d) mod 2.

So for parent tap ``t`` (one of the 27 parent offsets) the contribution of
neighbor families to all 8 output slots is one dense GEMM with the block
weight

    W[t][(s', c), (s, o)] = w27[2*dp_t + s' - s][c, o]   (zero if the
    offset leaves the 3x3x3 child kernel)

and the whole conv is ``sum_t F[pkmap[t]] @ W[t]`` — 27 gathers of
``8*C``-wide parent rows: **8x fewer gather descriptors** at unchanged
per-row cost, with the moved bytes identical. The FLOPs grow (W is 12.5%
block-dense) but MXU FLOPs are ~100x cheaper than gather descriptors at
these shapes.

Numerics: bit-wise this is the same sum over the same terms in a different
accumulation order — the tolerance class of cross-backend XLA codegen
differences, which the codec's integerized index/logit derivations already
absorb (pct/pipeline/serial.py module docstring). Within one build both
codec sides use the same path, so decode-matched simulations stay exact.

Reference behavior matched: the synthesis conv stack of ``g_s``
(reference ``receiver/decoder/codec_parallel.py:465-472`` runs these convs
through MinkowskiEngine CUDA kernels).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _family_tap_table() -> np.ndarray:
    """didx[t, s', s] = flat 3x3x3 kernel-offset index of the child-kernel
    tap that connects output slot ``s`` of the center parent to input slot
    ``s'`` of parent tap ``t``; 27 (= one past the kernel) if unconnected.

    Kernel-offset enumeration matches ``pct.ops.kernel_maps.kernel_offsets``
    (x-major over (-1, 0, 1)); slot enumeration matches ``expand_children``
    / ``kernel_offsets(2)`` (x-major over (0, 1))."""
    dps = np.array(
        [[x, y, z] for x in (-1, 0, 1) for y in (-1, 0, 1) for z in (-1, 0, 1)],
        np.int32,
    )
    slots = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.int32)
    didx = np.full((27, 8, 8), 27, np.int32)
    for t, dp in enumerate(dps):
        for spi, sp in enumerate(slots):
            for si, s in enumerate(slots):
                d = 2 * dp + sp - s
                if np.all(np.abs(d) <= 1):
                    didx[t, spi, si] = (d[0] + 1) * 9 + (d[1] + 1) * 3 + (d[2] + 1)
    return didx


def family_block_weights(w27: jax.Array) -> jax.Array:
    """``[27, Cin, Cout]`` child-kernel weights -> ``[27, 8*Cin, 8*Cout]``
    parent-tap block weights (differentiable: a pure gather of ``w27``)."""
    k, cin, cout = w27.shape
    assert k == 27, f"family conv needs a 3x3x3 kernel, got {k} taps"
    wpad = jnp.concatenate([w27, jnp.zeros((1, cin, cout), w27.dtype)], axis=0)
    didx = jnp.asarray(_family_tap_table())  # [27, 8, 8]
    W = wpad[didx]  # [27, 8(s'), 8(s), cin, cout]
    W = W.transpose(0, 1, 3, 2, 4)  # [27, s', cin, s, cout]
    return W.reshape(27, 8 * cin, 8 * cout)


def family_conv(
    fam_feats: jax.Array,  # [P, 8, Cin] family blocks (zeros at empty slots)
    pkmap: tuple[jax.Array, jax.Array],  # parent grid's 27-tap kernel map
    w27: jax.Array,  # [27, Cin, Cout]
    bias: Optional[jax.Array] = None,
    pmask: Optional[jax.Array] = None,
) -> jax.Array:
    """Child-grid 3x3x3 conv in family layout -> ``[P, 8, Cout]``.

    Output slot values are the exact conv sums for OCCUPIED child slots;
    empty slots compute finite garbage (neighbor sums) — callers mask by
    their slot-keep mask wherever consumed, exactly as classic
    ``sparse_conv`` masks by ``out_mask``."""
    from pct.ops.conv import _gather_gemm

    p, f3, cin = fam_feats.shape
    assert f3 == 8
    W = family_block_weights(w27)
    idx, found = pkmap
    if pmask is None:
        pmask = jnp.ones((p,), bool)
    out = _gather_gemm(fam_feats.reshape(p, 8 * cin), idx, found, W, None, pmask)
    out = out.reshape(p, 8, -1)
    if bias is not None:
        out = out + bias
    return jnp.where(pmask[:, None, None], out, 0)


def scatter_family(
    child_feats: jax.Array,  # [N, C] compact child rows
    keep: jax.Array,  # [N] valid child rows
    perm: jax.Array,  # [N] pre-sort candidate index (parent_row * 8 + slot)
    n_parent: int,
) -> jax.Array:
    """Compact child rows -> ``[n_parent, 8, C]`` family blocks (zeros at
    empty slots). ``perm`` entries are unique among valid rows (the top-k
    survivor contract), so the scatter is collision-free."""
    c = child_feats.shape[1]
    flat = jnp.where(keep, perm, n_parent * 8)
    return (
        jnp.zeros((n_parent * 8 + 1, c), child_feats.dtype)
        .at[flat]
        .set(jnp.where(keep[:, None], child_feats, 0), mode="drop")[: n_parent * 8]
        .reshape(n_parent, 8, c)
    )


def gather_family(fam_feats: jax.Array, perm: jax.Array, keep: jax.Array) -> jax.Array:
    """Family blocks -> compact child rows at candidate indexes ``perm``."""
    p, f3, c = fam_feats.shape
    out = fam_feats.reshape(p * f3, c)[jnp.where(keep, perm, 0)]
    return jnp.where(keep[:, None], out, 0)


def family_keep_mask(perm: jax.Array, keep: jax.Array, n_parent: int) -> jax.Array:
    """[n_parent, 8] slot-occupancy mask of the survivors (collision-free)."""
    flat = jnp.where(keep, perm, n_parent * 8)
    return (
        jnp.zeros((n_parent * 8 + 1,), bool)
        .at[flat]
        .set(keep, mode="drop")[: n_parent * 8]
        .reshape(n_parent, 8)
    )
