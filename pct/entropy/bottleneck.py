"""Factorized-prior entropy bottleneck (learned univariate densities).

TPU-native reimplementation of the fully-factorized entropy model of Ballé et
al. 2018 ("Variational image compression with a scale hyperprior", appendix
6.1) — the role CompressAI's ``EntropyBottleneck`` plays for the reference's
hyper-latents z (reference ``codec_pipeline.py:294-317``,
``codec_parallel.py:307``): each channel learns a monotone CDF as a small
chain of constrained affine+nonlinearity layers; ``update()`` quantizes the
per-channel pmf into integer CDF tables for the rANS coder.

Training-path math runs in JAX (noise-quantization likelihoods, aux tail
loss); table building runs on host in float64 for determinism.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from pct.entropy import rans
from pct.entropy.tables import CdfTables

Params = Dict[str, Any]


class EntropyBottleneck:
    """Per-channel learned factorized prior.

    Channel layout: features are coded as ``[C, N]`` (channel-major), matching
    the reference's transpose of sparse features before entropy coding.
    """

    def __init__(
        self,
        channels: int,
        filters: tuple[int, ...] = (3, 3, 3, 3),
        init_scale: float = 10.0,
        tail_mass: float = 1e-9,
    ):
        self.channels = channels
        self.filters = tuple(filters)
        self.init_scale = init_scale
        self.tail_mass = tail_mass
        self._dims = (1, *self.filters, 1)

    def init_params(self, key: jax.Array) -> Params:
        params: Params = {}
        scale = self.init_scale ** (1 / (len(self._dims) - 1))
        for k in range(len(self._dims) - 1):
            d_in, d_out = self._dims[k], self._dims[k + 1]
            init = np.log(np.expm1(1 / scale / d_out))
            params[f"matrix_{k}"] = jnp.full((self.channels, d_out, d_in), init, jnp.float32)
            key, sub = jax.random.split(key)
            params[f"bias_{k}"] = jax.random.uniform(
                sub, (self.channels, d_out, 1), jnp.float32, -0.5, 0.5
            )
            if k < len(self._dims) - 2:
                params[f"factor_{k}"] = jnp.zeros((self.channels, d_out, 1), jnp.float32)
        params["quantiles"] = jnp.tile(
            jnp.array([[[-self.init_scale, 0.0, self.init_scale]]], jnp.float32),
            (self.channels, 1, 1),
        )
        return params

    def _logits_cumulative(self, params: Params, x: jax.Array) -> jax.Array:
        """x: [C, 1, N] -> logits of the cumulative density, same shape."""
        v = x
        n_layers = len(self._dims) - 1
        for k in range(n_layers):
            m = jax.nn.softplus(params[f"matrix_{k}"])
            v = jnp.einsum("coi,cin->con", m, v) + params[f"bias_{k}"]
            if k < n_layers - 1:
                v = v + jnp.tanh(params[f"factor_{k}"]) * jnp.tanh(v)
        return v

    def likelihood(self, params: Params, x: jax.Array) -> jax.Array:
        """P(round(x) = x̃) under the learned density. x: [C, N] -> [C, N]."""
        v = x[:, None, :]
        upper = self._logits_cumulative(params, v + 0.5)
        lower = self._logits_cumulative(params, v - 0.5)
        # sign trick for numerical stability of sigmoid differences
        sign = -jnp.sign(upper + lower)
        sign = jax.lax.stop_gradient(sign)
        lik = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return lik[:, 0, :]

    def medians(self, params: Params) -> jax.Array:
        return params["quantiles"][:, 0, 1]

    def quantize_noise(self, key: jax.Array, x: jax.Array) -> jax.Array:
        """Training-time additive-uniform-noise quantization surrogate."""
        return x + jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)

    def quantize_ste(self, params: Params, x: jax.Array) -> jax.Array:
        """Straight-through rounding around the learned medians."""
        med = self.medians(params)[:, None]
        return x + jax.lax.stop_gradient(jnp.round(x - med) + med - x)

    def aux_loss(self, params: Params) -> jax.Array:
        """Drives the quantile parameters to the tail-mass quantiles."""
        logits = self._logits_cumulative(params, params["quantiles"])
        # target logits: [log(t/(1-t)), 0, -log(t/(1-t))] with t = tail/2
        tm = self.tail_mass / 2
        target = jnp.array(
            [np.log(tm / (1 - tm)), 0.0, -np.log(tm / (1 - tm))], jnp.float32
        )
        return jnp.sum(jnp.abs(logits - target[None, None, :]))

    # ------------------------------------------------------------------
    # Coding path (host)
    # ------------------------------------------------------------------

    def update(self, params: Params) -> CdfTables:
        """Build quantized CDF tables — the analog of CompressAI ``update()``
        invoked by the reference at model load (``codec_pipeline.py:70``)."""
        q = np.asarray(params["quantiles"], np.float64)[:, 0, :]  # [C, 3]
        med = q[:, 1]
        minima = np.maximum(np.ceil(med - q[:, 0]).astype(np.int64), 0)
        maxima = np.maximum(np.ceil(q[:, 2] - med).astype(np.int64), 0)
        pmf_lengths = (minima + maxima + 1).astype(np.int64)
        max_len = int(pmf_lengths.max())

        # samples[c, l] = l - minima[c] + median[c]
        samples = np.arange(max_len)[None, :] - minima[:, None] + med[:, None]
        lik = np.asarray(
            self.likelihood(params, jnp.asarray(samples, jnp.float32)), np.float64
        )
        # per-channel tail mass (everything outside the table range)
        low_logit = np.asarray(
            self._logits_cumulative(
                params, jnp.asarray((-minima - 0.5 + med)[:, None, None], jnp.float32)
            ),
            np.float64,
        )[:, 0, 0]
        high_logit = np.asarray(
            self._logits_cumulative(
                params, jnp.asarray((maxima + 0.5 + med)[:, None, None], jnp.float32)
            ),
            np.float64,
        )[:, 0, 0]
        tail = 1.0 / (1.0 + np.exp(-low_logit)) + 1.0 / (1.0 + np.exp(high_logit))

        cdfs = np.zeros((self.channels, max_len + 2), np.int32)
        lengths = np.zeros(self.channels, np.int32)
        offsets = (-minima).astype(np.int32)
        for c in range(self.channels):
            L = int(pmf_lengths[c])
            pmf = np.append(lik[c, :L], max(tail[c], 0))
            cdf = rans.pmf_to_quantized_cdf(pmf)
            cdfs[c, : cdf.size] = cdf
            lengths[c] = cdf.size
        return CdfTables(cdfs=cdfs, lengths=lengths, offsets=offsets)

    def compress_symbols(self, tables: CdfTables, symbols: np.ndarray) -> bytes:
        """Entropy-encode already-quantized symbols ``[C, N]``
        (``round(x - median)``, typically computed on-device)."""
        c, n = symbols.shape
        indexes = np.repeat(np.arange(c, dtype=np.int32)[:, None], n, axis=1)
        return rans.encode_with_indexes(symbols.astype(np.int32), indexes, *tables.astuple())

    def decompress_symbols(self, tables: CdfTables, stream: bytes, n: int) -> np.ndarray:
        """Inverse of :meth:`compress_symbols`; returns int32 ``[C, n]``."""
        c = tables.cdfs.shape[0]
        indexes = np.repeat(np.arange(c, dtype=np.int32)[:, None], n, axis=1)
        return rans.decode_with_indexes(stream, indexes, *tables.astuple()).reshape(c, n)

    def compress(self, params: Params, tables: CdfTables, x: np.ndarray) -> bytes:
        """x: [C, N] float features -> rANS stream (symbols = round(x - median))."""
        med = np.asarray(self.medians(params), np.float64)
        symbols = np.round(np.asarray(x, np.float64) - med[:, None]).astype(np.int32)
        c, n = symbols.shape
        indexes = np.repeat(np.arange(c, dtype=np.int32)[:, None], n, axis=1)
        return rans.encode_with_indexes(symbols, indexes, *tables.astuple())

    def decompress(
        self, params: Params, tables: CdfTables, stream: bytes, n: int
    ) -> np.ndarray:
        """Inverse of compress; returns [C, n] float32 dequantized values."""
        c = self.channels
        indexes = np.repeat(np.arange(c, dtype=np.int32)[:, None], n, axis=1)
        symbols = rans.decode_with_indexes(stream, indexes, *tables.astuple())
        med = np.asarray(self.medians(params), np.float64)
        return (symbols.reshape(c, n).astype(np.float64) + med[:, None]).astype(np.float32)
