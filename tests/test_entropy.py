"""Entropy coding tests: rANS round-trips, factorized bottleneck, Gaussian
conditional, bitstream container (SURVEY.md §7 step 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pct.entropy import (
    CdfTables,
    EntropyBottleneck,
    GaussianConditional,
    SegmentBitstream,
    pack_segment,
    unpack_segment,
    pmf_to_quantized_cdf,
)
from pct.entropy import rans


def make_tables(rng, rows=4, supports=(8, 12, 30, 3)):
    max_len = max(supports) + 2
    cdfs = np.zeros((rows, max_len), np.int32)
    lengths = np.zeros(rows, np.int32)
    offsets = rng.integers(-10, 10, rows).astype(np.int32)
    for r, L in enumerate(supports):
        pmf = rng.random(L) + 0.01
        cdf = pmf_to_quantized_cdf(np.append(pmf / pmf.sum() * 0.995, 0.005))
        cdfs[r, : cdf.size] = cdf
        lengths[r] = cdf.size
    return CdfTables(cdfs, lengths, offsets)


def test_rans_roundtrip_and_fallback_parity(rng):
    t = make_tables(rng)
    n = 4000
    indexes = rng.integers(0, 4, n).astype(np.int32)
    symbols = np.empty(n, np.int32)
    for i, idx in enumerate(indexes):
        symbols[i] = rng.integers(t.offsets[idx], t.offsets[idx] + t.lengths[idx] - 2)
    esc = rng.random(n) < 0.05
    symbols[esc] = rng.integers(-5000, 5000, esc.sum())

    stream = rans.encode_with_indexes(symbols, indexes, *t.astuple())
    out = rans.decode_with_indexes(stream, indexes, *t.astuple())
    np.testing.assert_array_equal(out, symbols)
    # C++ and pure-Python implementations produce identical bits
    assert rans._py_encode(symbols, indexes, t.cdfs, t.lengths, t.offsets) == stream
    np.testing.assert_array_equal(
        rans._py_decode(stream, indexes, t.cdfs, t.lengths, t.offsets), symbols
    )


def test_rans_rate_close_to_entropy(rng):
    # one skewed 2-symbol cdf: H ≈ 0.469 bits/sym at p=0.1
    pmf = np.array([0.9, 0.1])
    cdf = pmf_to_quantized_cdf(np.append(pmf * 0.999, 0.001))
    t = CdfTables(cdf[None, :], np.array([cdf.size], np.int32), np.array([0], np.int32))
    n = 20000
    symbols = (rng.random(n) < 0.1).astype(np.int32)
    stream = rans.encode_with_indexes(symbols, np.zeros(n, np.int32), *t.astuple())
    bits_per_sym = len(stream) * 8 / n
    assert bits_per_sym < 0.55, bits_per_sym  # entropy 0.469 + overhead


def test_pmf_to_quantized_cdf_properties(rng):
    for _ in range(20):
        pmf = rng.random(rng.integers(2, 50))
        cdf = pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert (np.diff(cdf) >= 1).all()


def test_entropy_bottleneck_roundtrip():
    eb = EntropyBottleneck(channels=8)
    params = eb.init_params(jax.random.key(0))
    tables = eb.update(params)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 2.0, (8, 500)).astype(np.float32)
    stream = eb.compress(params, tables, x)
    x_hat = eb.decompress(params, tables, stream, 500)
    med = np.asarray(eb.medians(params))
    expect = np.round(x - med[:, None]) + med[:, None]
    np.testing.assert_allclose(x_hat, expect, atol=1e-5)
    # rate sanity: near-gaussian data through a fresh prior still < 16 bits/sym
    assert len(stream) * 8 / x.size < 16


def test_entropy_bottleneck_likelihood_valid():
    eb = EntropyBottleneck(channels=4)
    params = eb.init_params(jax.random.key(0))
    x = jnp.linspace(-20, 20, 200)[None, :].repeat(4, 0)
    lik = eb.likelihood(params, x)
    assert float(lik.min()) >= 0 and float(lik.max()) <= 1
    # integrates to ~1 over integers
    s = jnp.sum(eb.likelihood(params, jnp.arange(-300, 300)[None, :].astype(jnp.float32).repeat(4, 0)), axis=1)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-2)


def test_gaussian_conditional_roundtrip(rng):
    gc = GaussianConditional()
    tables = gc.update()
    n = 3000
    scales = np.exp(rng.uniform(np.log(0.05), np.log(30), n)).astype(np.float32)
    means = rng.normal(0, 5, n).astype(np.float32)
    x = rng.normal(means, np.maximum(scales, 0.11)).astype(np.float32)
    indexes = np.asarray(gc.build_indexes(jnp.asarray(scales)))
    stream = gc.compress(tables, x, indexes, means)
    q = gc.decompress(tables, stream, indexes)
    np.testing.assert_array_equal(q, np.round(x - means))
    # rate sanity: should be within ~15% of the Gaussian entropy estimate
    lik = np.asarray(gc.likelihood(jnp.asarray(x), jnp.asarray(scales), jnp.asarray(means)))
    h = -np.log2(np.maximum(lik, 1e-9)).sum() / n
    bits = len(stream) * 8 / n
    assert bits < max(1.2 * h, h + 0.2), (bits, h)


def test_gaussian_build_indexes_bounds():
    gc = GaussianConditional()
    idx = np.asarray(gc.build_indexes(jnp.asarray([1e-6, 0.11, 0.2, 100.0, 1e6])))
    assert idx[0] == 0 and idx[1] == 0
    assert idx[-1] == gc.scale_table.size - 1
    # monotone
    assert (np.diff(idx) >= 0).all()


def test_bitstream_container_roundtrip(rng):
    lv = SegmentBitstream(
        q_g=1.0,
        q_a=0.25,
        y_shape=1234,
        z_shape=77,
        y_string=rng.bytes(501),
        z_string=rng.bytes(33),
        gpcc_strings=[rng.bytes(100), rng.bytes(7), b""],
        ks=[(10, 20, 30), (1, 2, 3), (0, 0, 0)],
    )
    lv2 = SegmentBitstream.unpack(lv.pack())
    assert lv2.__dict__ == lv.__dict__
    seg = pack_segment([lv, lv2])
    back = unpack_segment(seg)
    assert len(back) == 2 and back[0].__dict__ == lv.__dict__


def test_rans_empty_and_single_symbol(rng):
    t = make_tables(rng)
    for symbols, indexes in [
        (np.zeros(0, np.int32), np.zeros(0, np.int32)),
        (np.array([t.offsets[0]], np.int32), np.zeros(1, np.int32)),
    ]:
        stream = rans.encode_with_indexes(symbols, indexes, *t.astuple())
        out = rans.decode_with_indexes(stream, indexes, *t.astuple())
        np.testing.assert_array_equal(out, symbols)


def test_integer_index_path_matches_float_path(rng):
    """build_indexes_from_codes reproduces the float path everywhere except
    within one fixed-point grid step of a table boundary (where the
    deterministic integer rule takes over)."""
    gc = GaussianConditional()
    n = 5000
    scales = np.exp(rng.uniform(np.log(0.05), np.log(200), n)).astype(np.float32)
    gain = np.exp(rng.uniform(np.log(0.1), np.log(60), 8)).astype(np.float32)
    s_codes = np.asarray(gc.quantize_scales(jnp.asarray(scales[:, None])))
    g_codes = np.asarray(gc.quantize_gain(jnp.asarray(gain)))
    got = np.asarray(gc.build_indexes_from_codes(jnp.asarray(s_codes), jnp.asarray(g_codes[None, :])))
    want = np.asarray(gc.build_indexes(jnp.asarray(np.clip(scales[:, None], gc.scale_bound, gc.scale_table[-1]) * gain[None, :])))
    # the two rules agree except near boundaries; quantify the tolerance
    diff = np.abs(got - want)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.05, (diff != 0).mean()


def test_integer_index_path_is_ulp_robust(rng):
    """The structural guarantee: perturbing scales/gains by a few float ulps
    NEVER flips an index unless the exact value sits within that ulp of a
    fixed-point grid boundary — and for values ON the grid (what h_s
    emits after rounding in float) no perturbation below half a grid step
    can flip anything."""
    gc = GaussianConditional()
    n = 4000
    # values exactly on the scale grid (post-PARAM_GRID h_s outputs)
    s = (rng.integers(28, 65536, n).astype(np.float32)) / gc.SCALE_FP
    g = (rng.integers(1, 2**15 - 1, 16).astype(np.float32)) / gc.GAIN_FP
    for eps_scale in (-1, 1):
        s_pert = np.nextafter(s, np.float32(eps_scale * np.inf)).astype(np.float32)
        g_pert = np.nextafter(g, np.float32(eps_scale * np.inf)).astype(np.float32)
        a = np.asarray(gc.build_indexes_from_codes(
            gc.quantize_scales(jnp.asarray(s[:, None])), gc.quantize_gain(jnp.asarray(g))[None, :]))
        b = np.asarray(gc.build_indexes_from_codes(
            gc.quantize_scales(jnp.asarray(s_pert[:, None])), gc.quantize_gain(jnp.asarray(g_pert))[None, :]))
        np.testing.assert_array_equal(a, b)
