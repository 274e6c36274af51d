"""Scale-indexed Gaussian conditional entropy model.

The hyperprior predicts per-latent (mean, scale); coding quantizes the scale
onto a log-spaced table and uses one quantized-Gaussian CDF row per table
entry — the role CompressAI's ``GaussianConditional`` plays for the
reference's latents y (``build_indexes``/``compress``/``decompress`` at
reference ``codec_pipeline.py:425-430``, ``codec_parallel.py:398-403``).

Also provides the *variable-rate dequantization offset* used by the unified
model's decoder (``entropy_model.get_offsets`` — reference
``codec_parallel.py:405-409``): the conditional expectation correction
``E[|y| - |q|]`` for a Gaussian quantized in gain units.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import ndtri  # inverse standard normal CDF (host only)

from pct.entropy import rans
from pct.entropy.tables import CdfTables


def default_scale_table(min_scale: float = 0.11, max_scale: float = 256.0, levels: int = 64):
    return np.exp(np.linspace(np.log(min_scale), np.log(max_scale), levels))


def _std_cdf(x):
    return 0.5 * (1.0 + jax.scipy.special.erf(x / np.sqrt(2.0)))


class GaussianConditional:
    # Fixed-point grids for the integerized coding-index path (see
    # ``build_indexes_from_codes``): scales on a 1/256 grid (the codec's
    # PARAM_GRID), gains on a 1/64 grid. The products stay below 2^31 under
    # the clamps in ``quantize_scales``/``quantize_gain``, so the whole
    # index derivation after the two grid roundings is int32 arithmetic —
    # bit-exact on every backend by construction.
    SCALE_FP = 256
    GAIN_FP = 64

    def __init__(self, scale_table: np.ndarray | None = None, tail_mass: float = 1e-9):
        self.scale_table = np.asarray(
            scale_table if scale_table is not None else default_scale_table(), np.float64
        )
        assert np.all(np.diff(self.scale_table) > 0), "scale table must be increasing"
        self.tail_mass = tail_mass
        self.scale_bound = float(self.scale_table[0])
        # int32 decision boundaries in (scale * gain) fixed-point units
        self._bound_codes = np.floor(
            self.scale_table[:-1] * self.SCALE_FP * self.GAIN_FP
        ).astype(np.int32)

    # ------------------------------------------------------------------
    # JAX (training / on-device) path
    # ------------------------------------------------------------------

    def lower_bound_scale(self, scales: jax.Array) -> jax.Array:
        """Clamp scales below the smallest table entry (reference uses the
        model's ``lower_bound_scale`` before offset computation)."""
        return jnp.maximum(scales, self.scale_bound)

    def likelihood(self, x: jax.Array, scales: jax.Array, means: jax.Array) -> jax.Array:
        """P(round(x)=x̃ | N(mean, scale²)) with the scale lower bound."""
        s = self.lower_bound_scale(scales)
        v = x - means
        upper = _std_cdf((v + 0.5) / s)
        lower = _std_cdf((v - 0.5) / s)
        return jnp.abs(upper - lower)

    def build_indexes(self, scales: jax.Array) -> jax.Array:
        """Smallest table index whose scale >= the (clamped) input scale."""
        s = self.lower_bound_scale(scales)
        table = jnp.asarray(self.scale_table[:-1], s.dtype)
        return jnp.sum(s[..., None] > table, axis=-1).astype(jnp.int32)

    # ------------------------------------------------------------------
    # Integerized index derivation (cross-backend structural parity)
    # ------------------------------------------------------------------
    #
    # The rANS stream desynchronizes if encoder and decoder derive even one
    # different coding index. The float path (``build_indexes(scales*gain)``)
    # has TWO ulp-sensitive stages: the float product and the float table
    # compare. The integer path reduces the parity surface to exactly the
    # two documented grid roundings (scale -> 1/256, gain -> 1/64): after
    # them everything is int32 arithmetic, identical on any backend.

    def quantize_scales(self, scales: jax.Array) -> jax.Array:
        """Scales -> int32 fixed-point codes on the 1/SCALE_FP grid, clamped
        to [scale_bound, scale_table[-1]] so products fit int32."""
        lo = int(round(self.scale_bound * self.SCALE_FP))
        hi = int(round(float(self.scale_table[-1]) * self.SCALE_FP))
        c = jnp.round(scales * self.SCALE_FP).astype(jnp.int32)
        return jnp.clip(c, lo, hi)

    def quantize_gain(self, gain: jax.Array) -> jax.Array:
        """Gain -> int32 fixed-point codes on the 1/GAIN_FP grid. The clamp
        at 2^15-1 (gain 512) keeps scale*gain products below 2^31; a gain
        that large saturates every index to the table top anyway."""
        c = jnp.round(gain * self.GAIN_FP).astype(jnp.int32)
        return jnp.clip(c, 1, 2**15 - 1)

    def build_indexes_from_codes(self, s_codes: jax.Array, g_codes: jax.Array) -> jax.Array:
        """Index derivation in pure int32: ``sum(s*g > bounds)`` with the
        precomputed fixed-point boundary codes. ``s_codes`` broadcasts
        against ``g_codes`` (e.g. [N, C] scales x [C] per-channel gains)."""
        c = s_codes * g_codes  # int32, < 2^31 by the quantizer clamps
        bounds = jnp.asarray(self._bound_codes, jnp.int32)
        return jnp.sum(c[..., None] > bounds, axis=-1).astype(jnp.int32)

    # The dequantization offset (reference ``entropy_model.get_offsets``)
    # lives on the model: ``ColorModel.get_offsets`` (pct/models/unified.py)
    # — the closed-form conditional-mean correction needs only the effective
    # stdev, which the model computes in gain units.

    # ------------------------------------------------------------------
    # Coding path (host)
    # ------------------------------------------------------------------

    def update(self) -> CdfTables:
        multiplier = float(-ndtri(self.tail_mass / 2))
        centers = np.ceil(self.scale_table * multiplier).astype(np.int64)
        max_c = int(centers.max())
        max_len = 2 * max_c + 1
        rows = self.scale_table.size
        cdfs = np.zeros((rows, max_len + 2), np.int32)
        lengths = np.zeros(rows, np.int32)
        offsets = (-centers).astype(np.int32)

        def phi(x):
            from scipy.special import ndtr

            return ndtr(x)

        for r in range(rows):
            c, s = int(centers[r]), float(self.scale_table[r])
            v = np.arange(-c, c + 1, dtype=np.float64)
            pmf = phi((v + 0.5) / s) - phi((v - 0.5) / s)
            tail = 2.0 * phi(-(c + 0.5) / s)
            cdf = rans.pmf_to_quantized_cdf(np.append(pmf, max(tail, 0)))
            cdfs[r, : cdf.size] = cdf
            lengths[r] = cdf.size
        return CdfTables(cdfs=cdfs, lengths=lengths, offsets=offsets)

    def compress_symbols(self, tables: CdfTables, symbols: np.ndarray, indexes: np.ndarray) -> bytes:
        """Entropy-encode already-quantized residual symbols (device-computed)."""
        return rans.encode_with_indexes(
            np.asarray(symbols, np.int32), indexes, *tables.astuple()
        )

    def compress(
        self, tables: CdfTables, x: np.ndarray, indexes: np.ndarray, means: np.ndarray
    ) -> bytes:
        symbols = np.round(np.asarray(x, np.float64) - np.asarray(means, np.float64)).astype(
            np.int32
        )
        return rans.encode_with_indexes(symbols, indexes, *tables.astuple())

    def decompress(
        self, tables: CdfTables, stream: bytes, indexes: np.ndarray
    ) -> np.ndarray:
        """Returns the quantized residuals q = round(x - means) as float32
        (caller adds means / applies dequant offsets)."""
        symbols = rans.decode_with_indexes(stream, indexes, *tables.astuple())
        return symbols.reshape(np.asarray(indexes).shape).astype(np.float32)
