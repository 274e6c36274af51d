"""Pallas kernel tests (interpret mode on CPU; lowered on real TPU)."""

import numpy as np
import jax.numpy as jnp

from pct.sparse.coords import pack_keys, searchsorted_keys
from pct.ops.pallas.search import pallas_searchsorted_keys


def test_pallas_search_matches_xla(rng):
    c = np.zeros((4096, 4), np.int32)
    c[:, 0] = rng.integers(0, 3, 4096)
    c[:, 1:] = rng.integers(-200, 200, (4096, 3))
    order = np.lexsort((c[:, 3], c[:, 2], c[:, 1], c[:, 0]))
    tbl = jnp.asarray(c[order])
    q = np.concatenate(
        [c[rng.integers(0, 4096, 2000)], rng.integers(-300, 300, (1000, 4)).astype(np.int32)]
    )
    h_s, l_s = pack_keys(tbl)
    h_q, l_q = pack_keys(jnp.asarray(q))
    ref = searchsorted_keys(h_s, l_s, h_q, l_q)
    got = pallas_searchsorted_keys(h_s, l_s, h_q, l_q, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pallas_search_tiny_table(rng):
    tbl = jnp.asarray(np.array([[0, 0, 0, 0], [0, 0, 0, 5]], np.int32))
    q = jnp.asarray(np.array([[0, 0, 0, -1], [0, 0, 0, 0], [0, 0, 0, 3], [0, 0, 0, 9]], np.int32))
    h_s, l_s = pack_keys(tbl)
    h_q, l_q = pack_keys(q)
    got = np.asarray(pallas_searchsorted_keys(h_s, l_s, h_q, l_q, interpret=True))
    np.testing.assert_array_equal(got, [0, 0, 1, 2])
