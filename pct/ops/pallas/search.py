"""Pallas TPU kernel: vectorized lower-bound binary search over dual-uint32 keys.

The sorted-search join (kernel maps, ``features_at_coordinates``) is the main
non-GEMM op of the sparse engine. The XLA formulation in
:mod:`pct.sparse.coords` runs ~log2(N) *separate* dependent gather kernels —
each with fixed launch/latency overhead, which dominates at ~10 ms x 18 steps
per kernel map. This kernel keeps the sorted ``[N, 2]`` key table resident in
VMEM (up to ~1M rows) and runs the whole search loop on-chip while query
tiles stream through.

Falls back transparently to the XLA path when the table exceeds the VMEM
budget; CPU tests run in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 2048  # queries per grid step
VMEM_TABLE_ROWS = 1 << 19  # keep tables up to 512k rows (4 MB) in VMEM


def _search_kernel(keys_ref, q_ref, out_ref):
    n = keys_ref.shape[0]
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    hi_q = q_ref[:, 0]
    lo_q = q_ref[:, 1]
    shape = hi_q.shape
    lo_b = jnp.zeros(shape, jnp.int32)
    hi_b = jnp.full(shape, n, jnp.int32)

    def body(_, carry):
        lo_b, hi_b = carry
        active = lo_b < hi_b
        mid = (lo_b + hi_b) >> 1
        mid_c = jnp.clip(mid, 0, n - 1)
        k = jnp.take(keys_ref[:], mid_c, axis=0)  # [T, 2] row gather from VMEM
        less = (k[:, 0] < hi_q) | ((k[:, 0] == hi_q) & (k[:, 1] < lo_q))
        lo_b = jnp.where(active & less, mid + 1, lo_b)
        hi_b = jnp.where(active & ~less, mid, hi_b)
        return lo_b, hi_b

    lo_b, _ = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    out_ref[:] = lo_b


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_searchsorted_keys(
    hi_sorted: jax.Array,
    lo_sorted: jax.Array,
    hi_q: jax.Array,
    lo_q: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Lower-bound insertion indices (same contract as
    ``pct.sparse.coords.searchsorted_keys``) via the VMEM-resident kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    keys = jnp.stack([hi_sorted, lo_sorted], axis=1)  # [N, 2]
    m = hi_q.shape[0]
    m_pad = max(TILE, ((m + TILE - 1) // TILE) * TILE)
    q = jnp.stack([hi_q, lo_q], axis=1)
    q = jnp.pad(q, ((0, m_pad - m), (0, 0)))
    rows = m_pad // TILE

    out = pl.pallas_call(
        _search_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad,), jnp.int32),
        grid=(rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full table resident
            pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(keys, q)
    return out[:m]
