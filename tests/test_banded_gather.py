"""Banded gather-GEMM (pct.ops.conv._gather_gemm_banded): the TPU tap-fetch
path that replaces descriptor-bound row gathers with windowed one-hot MXU
dots. Equivalence vs the chunked-GEMM path (sum-order tolerance) and the
runtime out-of-band fallback."""

import os

import numpy as np
import pytest


@pytest.fixture()
def conv_mod():
    import pct.ops.conv as conv

    old = os.environ.get("PCT_BANDED_GATHER")
    yield conv
    if old is None:
        os.environ.pop("PCT_BANDED_GATHER", None)
    else:
        os.environ["PCT_BANDED_GATHER"] = old


def _run(conv, banded: bool, idx, found, feats, w, b, mask):
    import jax.numpy as jnp

    os.environ["PCT_BANDED_GATHER"] = "1" if banded else "0"
    return np.asarray(
        conv._gather_gemm(
            jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(found),
            jnp.asarray(w), jnp.asarray(b), jnp.asarray(mask),
        )
    )


def test_banded_matches_classic(conv_mod, rng):
    conv = conv_mod
    n, K, cin, cout = conv.BANDED_MIN_ROWS, 27, 16, 24
    feats = rng.standard_normal((n, cin)).astype(np.float32)
    base = np.arange(n)
    idx = np.clip(base[:, None] + rng.integers(-300, 300, (n, K)), 0, n - 1).astype(np.int32)
    found = rng.random((n, K)) < 0.5
    w = (rng.standard_normal((K, cin, cout)) * 0.1).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    mask = rng.random(n) < 0.9
    got = _run(conv, True, idx, found, feats, w, b, mask)
    want = _run(conv, False, idx, found, feats, w, b, mask)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_banded_out_of_band_falls_back_exactly(conv_mod, rng):
    """A single tap index outside any window must flip the whole call to the
    classic path (bit-identical output, not a silently-wrong zero)."""
    conv = conv_mod
    n, K, cin, cout = conv.BANDED_MIN_ROWS, 8, 8, 8
    feats = rng.standard_normal((n, cin)).astype(np.float32)
    base = np.arange(n)
    idx = np.clip(base[:, None] + rng.integers(-50, 50, (n, K)), 0, n - 1).astype(np.int32)
    idx[n // 2, 3] = 0  # a far jump: spread >> 2 * BANDED_WINDOW
    idx[n // 2 + 1, 3] = n - 1
    found = np.ones((n, K), bool)
    w = (rng.standard_normal((K, cin, cout)) * 0.1).astype(np.float32)
    b = np.zeros(cout, np.float32)
    mask = np.ones(n, bool)
    got = _run(conv, True, idx, found, feats, w, b, mask)
    want = _run(conv, False, idx, found, feats, w, b, mask)
    np.testing.assert_array_equal(got, want)


def test_banded_missing_taps_are_zero(conv_mod, rng):
    """Missing taps contribute exactly zero on the banded path, including
    blocks where every tap is missing."""
    conv = conv_mod
    n, K, cin, cout = conv.BANDED_MIN_ROWS, 4, 8, 8
    feats = rng.standard_normal((n, cin)).astype(np.float32)
    idx = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, K))
    found = np.zeros((n, K), bool)
    found[: n // 2, 0] = True  # second half: all-missing blocks
    w = (rng.standard_normal((K, cin, cout)) * 0.1).astype(np.float32)
    b = np.zeros(cout, np.float32)
    mask = np.ones(n, bool)
    got = _run(conv, True, idx, found, feats, w, b, mask)
    want = _run(conv, False, idx, found, feats, w, b, mask)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    assert np.all(got[n // 2 :] == 0)
