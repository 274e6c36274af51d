"""rANS coder bindings: C++ fast path (ctypes) with a pure-Python fallback.

API mirrors the entropy-coder surface the reference model uses via CompressAI
(``encode_with_indexes`` / ``decode_with_indexes``, reference
``codec_pipeline.py:425-430`` / ``codec_parallel.py:398-403``): quantized
16-bit CDF tables per index row, escape symbol + bypass raw bits for
out-of-range values. The C++ library is built on first use with g++ and
cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CPP = os.path.join(_HERE, "cpp", "rans.cpp")
_SO = os.path.join(_HERE, "cpp", "librans.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False

PRECISION = 16
BYPASS_PRECISION = 4
_RANS_L = 1 << 31
_MAX_BYPASS = (1 << BYPASS_PRECISION) - 1


def _load_lib():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_CPP):
                # pid-unique tmp: encoder/decoder services starting together on
                # a fresh host must not interleave writes to one tmp file
                tmp = f"{_SO}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _CPP],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
            lib.pct_rans_encode.restype = ctypes.c_int
            lib.pct_rans_decode.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def encode_with_indexes(
    symbols: np.ndarray,
    indexes: np.ndarray,
    cdfs: np.ndarray,
    cdf_lengths: np.ndarray,
    offsets: np.ndarray,
) -> bytes:
    """Entropy-encode ``symbols[i]`` with CDF row ``indexes[i]`` -> stream bytes."""
    symbols, indexes = _as_i32(symbols).ravel(), _as_i32(indexes).ravel()
    cdfs = _as_i32(cdfs)
    cdf_lengths, offsets = _as_i32(cdf_lengths).ravel(), _as_i32(offsets).ravel()
    assert symbols.shape == indexes.shape
    lib = _load_lib()
    if lib is None:
        return _py_encode(symbols, indexes, cdfs, cdf_lengths, offsets)
    capacity = 16 * symbols.size + 1024
    out = np.empty(capacity, np.uint8)
    n = lib.pct_rans_encode(
        symbols.ctypes.data_as(ctypes.c_void_p),
        indexes.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(symbols.size),
        cdfs.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(cdfs.shape[0]),
        ctypes.c_int(cdfs.shape[1]),
        cdf_lengths.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(capacity),
    )
    if n < 0:
        raise ValueError(f"rANS encode failed (code {n})")
    return out[:n].tobytes()


def decode_with_indexes(
    stream: bytes,
    indexes: np.ndarray,
    cdfs: np.ndarray,
    cdf_lengths: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    """Inverse of :func:`encode_with_indexes`; returns int32 symbols."""
    indexes = _as_i32(indexes).ravel()
    cdfs = _as_i32(cdfs)
    cdf_lengths, offsets = _as_i32(cdf_lengths).ravel(), _as_i32(offsets).ravel()
    lib = _load_lib()
    if lib is None:
        return _py_decode(stream, indexes, cdfs, cdf_lengths, offsets)
    buf = np.frombuffer(stream, np.uint8)
    out = np.empty(indexes.size, np.int32)
    rc = lib.pct_rans_decode(
        buf.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(buf.size),
        indexes.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(indexes.size),
        cdfs.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(cdfs.shape[0]),
        ctypes.c_int(cdfs.shape[1]),
        cdf_lengths.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError(f"rANS decode failed (code {rc})")
    return out


# ----------------------------------------------------------------------------
# Pure-Python fallback (bit-exact with the C++ path; used when no compiler).
# ----------------------------------------------------------------------------


class _PyEnc:
    def __init__(self):
        self.x = _RANS_L
        self.words = []

    def put(self, start, freq):
        x_max = ((_RANS_L >> PRECISION) << 32) * freq
        while self.x >= x_max:
            self.words.append(self.x & 0xFFFFFFFF)
            self.x >>= 32
        self.x = ((self.x // freq) << PRECISION) + (self.x % freq) + start

    def put_bits(self, val, nbits):
        x_max = (_RANS_L >> nbits) << 32
        while self.x >= x_max:
            self.words.append(self.x & 0xFFFFFFFF)
            self.x >>= 32
        self.x = (self.x << nbits) | val

    def flush(self):
        self.words.append(self.x & 0xFFFFFFFF)
        self.words.append((self.x >> 32) & 0xFFFFFFFF)
        return np.array(self.words[::-1], dtype="<u4").tobytes()


class _PyDec:
    def __init__(self, stream):
        self.words = np.frombuffer(
            stream + b"\x00" * ((-len(stream)) % 4), dtype="<u4"
        ).tolist()
        self.pos = 2
        self.x = (self.words[0] << 32) | self.words[1] if len(self.words) >= 2 else 0

    def _next(self):
        if self.pos < len(self.words):
            w = self.words[self.pos]
            self.pos += 1
            return w
        return 0

    def get_cf(self):
        return self.x & ((1 << PRECISION) - 1)

    def advance(self, start, freq):
        self.x = freq * (self.x >> PRECISION) + self.get_cf() - start
        while self.x < _RANS_L:
            self.x = (self.x << 32) | self._next()

    def get_bits(self, nbits):
        val = self.x & ((1 << nbits) - 1)
        self.x >>= nbits
        while self.x < _RANS_L:
            self.x = (self.x << 32) | self._next()
        return val


def _py_encode(symbols, indexes, cdfs, lengths, offsets):
    enc = _PyEnc()
    for i in range(symbols.size - 1, -1, -1):
        idx = int(indexes[i])
        cdf = cdfs[idx]
        max_value = int(lengths[idx]) - 2
        value = int(symbols[i]) - int(offsets[idx])
        raw_val, escaped = 0, False
        if value < 0:
            raw_val, value, escaped = -2 * value - 1, max_value, True
        elif value >= max_value:
            raw_val, value, escaped = 2 * (value - max_value), max_value, True
        if escaped:
            n_bypass = 0
            while (raw_val >> (n_bypass * BYPASS_PRECISION)) != 0:
                n_bypass += 1
            for j in range(n_bypass - 1, -1, -1):
                enc.put_bits((raw_val >> (j * BYPASS_PRECISION)) & _MAX_BYPASS, BYPASS_PRECISION)
            pieces, val = [], n_bypass
            while val >= _MAX_BYPASS:
                pieces.append(_MAX_BYPASS)
                val -= _MAX_BYPASS
            pieces.append(val)
            for p in reversed(pieces):
                enc.put_bits(p, BYPASS_PRECISION)
        start, freq = int(cdf[value]), int(cdf[value + 1]) - int(cdf[value])
        enc.put(start, freq)
    return enc.flush()


def _py_decode(stream, indexes, cdfs, lengths, offsets):
    dec = _PyDec(stream)
    out = np.empty(indexes.size, np.int32)
    for i in range(indexes.size):
        idx = int(indexes[i])
        cdf = cdfs[idx]
        length = int(lengths[idx])
        max_value = length - 2
        cf = dec.get_cf()
        value = int(np.searchsorted(cdf[:length], cf, side="right")) - 1
        start, freq = int(cdf[value]), int(cdf[value + 1]) - int(cdf[value])
        dec.advance(start, freq)
        if value == max_value:
            piece = dec.get_bits(BYPASS_PRECISION)
            n_bypass = piece
            while piece == _MAX_BYPASS:
                piece = dec.get_bits(BYPASS_PRECISION)
                n_bypass += piece
            raw_val = 0
            for j in range(n_bypass):
                raw_val |= dec.get_bits(BYPASS_PRECISION) << (j * BYPASS_PRECISION)
            if raw_val & 1:
                v = -((raw_val + 1) >> 1)
            else:
                v = (raw_val >> 1) + max_value
            out[i] = v + int(offsets[idx])
        else:
            out[i] = value + int(offsets[idx])
    return out


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = PRECISION) -> np.ndarray:
    """Quantize a pmf (incl. trailing tail-mass bucket) to an integer CDF.

    Every bucket gets frequency >= 1 (mass stolen from the largest bucket),
    and the total is exactly ``2^precision``. Deterministic float64 path so
    encoder and decoder tables always agree.
    """
    pmf = np.asarray(pmf, np.float64).clip(min=0)
    total = pmf.sum()
    if not np.isfinite(total) or total <= 0:
        pmf = np.ones_like(pmf)
        total = pmf.sum()
    freqs = np.round(pmf / total * (1 << precision)).astype(np.int64)
    freqs = np.maximum(freqs, 1)
    diff = (1 << precision) - freqs.sum()
    while diff != 0:
        if diff > 0:
            freqs[np.argmax(freqs)] += diff
            diff = 0
        else:
            # remove from the largest bucket without zeroing any bucket
            i = int(np.argmax(freqs))
            take = min(-diff, freqs[i] - 1)
            freqs[i] -= take
            diff += take
            if take == 0:  # pathological: all buckets at 1
                raise ValueError("cannot normalize pmf to requested precision")
    cdf = np.zeros(pmf.size + 1, np.int32)
    cdf[1:] = np.cumsum(freqs)
    return cdf
