"""Logit-binned binary entropy coder for occupancy bits.

The guided-occupancy geometry mode entropy-codes every candidate child's
true occupancy bit under the synthesis occupancy head's predicted
probability (the role an arithmetic occupancy coder plays in octree/learned
geometry codecs; the reference instead transmits per-frame k counts and
prunes by top-k — ``receiver/decoder/codec_parallel.py:465-472`` — which is
lossy in *which* voxels survive). Coding a bit under a calibrated
``sigmoid(logit)`` costs its cross entropy, so the stream rate equals the
head's BCE — the quantity training already minimizes.

Cross-backend parity follows the codec's two-mechanism scheme
(``pct/entropy/gaussian.py``): logits round once onto a 1/256 grid, and the
grid code maps to one of 64 probability bins by pure int32 arithmetic —
encoder and decoder can only disagree if the *pre-rounding* float logits
straddle a grid boundary (and same-backend they run the identical jitted
graph, so they cannot disagree at all).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pct.entropy import rans
from pct.entropy.tables import CdfTables

LOGIT_GRID = 256  # logits round to this grid before binning (parity grid)
LOGIT_CLAMP = 8.0  # +-8 logits == p in [3.4e-4, 1 - 3.4e-4]
NUM_BINS = 64
_GRID_MAX = int(LOGIT_CLAMP * LOGIT_GRID)  # 2048
_BIN_SHIFT = 6  # (2 * _GRID_MAX) / NUM_BINS == 64 == 1 << 6


def logit_bins(logits: jnp.ndarray) -> jnp.ndarray:
    """Device path: float logits -> uint8 CDF-row indexes (one rounding,
    then int32 arithmetic — bit-exact on any backend after the grid)."""
    g = jnp.clip(
        jnp.round(logits * LOGIT_GRID).astype(jnp.int32), -_GRID_MAX, _GRID_MAX
    )
    return jnp.minimum((g + _GRID_MAX) >> _BIN_SHIFT, NUM_BINS - 1).astype(jnp.uint8)


def bin_probabilities() -> np.ndarray:
    """P(occupied) at each bin's center logit (float64, host)."""
    centers = ((np.arange(NUM_BINS) << _BIN_SHIFT) + (1 << (_BIN_SHIFT - 1)) - _GRID_MAX) / LOGIT_GRID
    return 1.0 / (1.0 + np.exp(-centers))


class BinaryConditional:
    """Binary symbols coded with per-symbol probability-bin indexes, on the
    same rANS machinery as the Gaussian conditional (symbols {0, 1}, 64 CDF
    rows, zero offsets — the escape path is unreachable)."""

    def update(self) -> CdfTables:
        probs = bin_probabilities()
        cdfs = np.zeros((NUM_BINS, 4), np.int32)
        lengths = np.full(NUM_BINS, 4, np.int32)
        offsets = np.zeros(NUM_BINS, np.int32)
        for r, p in enumerate(probs):
            # [P(0), P(1)] + vanishing tail bucket (escape never taken)
            cdf = rans.pmf_to_quantized_cdf(np.array([1.0 - p, p, 1e-9]))
            cdfs[r, : cdf.size] = cdf
        return CdfTables(cdfs=cdfs, lengths=lengths, offsets=offsets)

    def compress(self, tables: CdfTables, bits: np.ndarray, bins: np.ndarray) -> bytes:
        return rans.encode_with_indexes(
            np.asarray(bits, np.int32), np.asarray(bins, np.int32), *tables.astuple()
        )

    def decompress(self, tables: CdfTables, stream: bytes, bins: np.ndarray) -> np.ndarray:
        return rans.decode_with_indexes(
            stream, np.asarray(bins, np.int32), *tables.astuple()
        )

    # ------------------------------------------------------------------
    # per-segment empirical calibration (guided "OC2" streams)
    # ------------------------------------------------------------------
    #
    # The static tables charge each bit the cross entropy of the bin-center
    # sigmoid — on held-out data the occupancy head is miscalibrated, so the
    # stream pays CE(empirical || predicted) above the empirical entropy.
    # Calibration: the encoder counts each bin's ACTUAL P(occupied) in this
    # stream, quantizes it to a uint16 grid, ships the 64-entry table
    # (PROB_HEADER_BYTES) ahead of the rANS payload, and both sides build
    # identical CDFs from the quantized codes. Per-bin code length drops to
    # n_b * H(p_hat_b) (+128 B header) <= the static rate whenever the head
    # is miscalibrated — the largest measured source of the guided rungs'
    # 4.7-6.2 bpp geometry cost (VERDICT r3 item 9).

    PROB_GRID = 65536
    PROB_HEADER_BYTES = NUM_BINS * 2

    def calibrate(self, bits: np.ndarray, bins: np.ndarray) -> np.ndarray:
        """Per-bin empirical P(1) of ``bits`` as uint16 grid codes
        (Laplace-smoothed; empty bins fall back to the static bin center)."""
        bits = np.asarray(bits, np.int64)
        bins = np.asarray(bins, np.int64)
        n = np.bincount(bins, minlength=NUM_BINS).astype(np.float64)
        n1 = np.bincount(bins, weights=bits.astype(np.float64), minlength=NUM_BINS)
        p = (n1 + 0.5) / (n + 1.0)
        p = np.where(n > 0, p, bin_probabilities())
        codes = np.clip(np.round(p * self.PROB_GRID), 1, self.PROB_GRID - 1)
        return codes.astype(np.uint16)

    def tables_from_codes(self, codes: np.ndarray) -> CdfTables:
        """CDF tables from transmitted uint16 probability codes — pure
        integer-grid input, so encoder and decoder build identical tables."""
        codes = np.asarray(codes, np.uint16)
        assert codes.shape == (NUM_BINS,), codes.shape
        cdfs = np.zeros((NUM_BINS, 4), np.int32)
        lengths = np.full(NUM_BINS, 4, np.int32)
        offsets = np.zeros(NUM_BINS, np.int32)
        for r, c in enumerate(codes):
            p = float(c) / self.PROB_GRID
            cdf = rans.pmf_to_quantized_cdf(np.array([1.0 - p, p, 1e-9]))
            cdfs[r, : cdf.size] = cdf
        return CdfTables(cdfs=cdfs, lengths=lengths, offsets=offsets)

    def compress_calibrated(self, bits: np.ndarray, bins: np.ndarray) -> bytes:
        """[64 x uint16 LE prob codes ⧺ rANS payload] — self-describing."""
        codes = self.calibrate(bits, bins)
        tables = self.tables_from_codes(codes)
        payload = self.compress(tables, bits, bins)
        return codes.astype("<u2").tobytes() + payload

    def decompress_calibrated(self, stream: bytes, bins: np.ndarray) -> np.ndarray:
        codes = np.frombuffer(stream[: self.PROB_HEADER_BYTES], dtype="<u2")
        tables = self.tables_from_codes(codes)
        return self.decompress(tables, stream[self.PROB_HEADER_BYTES :], bins)
