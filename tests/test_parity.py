"""Encoder/decoder coding-index parity — the contract that keeps the
sequential rANS stream in sync (pct/pipeline/serial.py determinism note).

The decoder re-derives the per-latent Gaussian coding indexes from the
transmitted z symbols through hyper-synthesis; these must equal the
encoder's bit-for-bit or the stream desynchronizes from the first flipped
index onward. Since round 2 the decoder reconstructs the encoder's static
shapes from the bitstream (``SerialDecoder.encoder_caps``), making
same-backend parity structural — this test guards that property, including
across the overflow-fallback boundary. The cross-*backend* variant (TPU
encode -> CPU decode) runs in ``scripts/cross_backend_check.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pct.models import ColorModel, UnifiedConfig
from pct.pipeline import SerialDecoder, SerialEncoder

CFG = UnifiedConfig(channels=(8, 12, 16), latent_channels=16, hyper_channels=8, scale_nn_hidden=8)
SETTINGS = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]


@pytest.fixture(scope="module")
def codec():
    model = ColorModel(CFG)
    params = model.init_params(jax.random.key(2))
    return SerialEncoder(model, params), SerialDecoder(model, params)


def _decoder_indexes(dec, lv):
    from pct.gpcc import decode_points

    coords = []
    for b, g in enumerate(lv.gpcc_strings):
        pts = decode_points(g) * 8
        coords.append(np.concatenate([np.full((pts.shape[0], 1), b, np.int32), pts], 1))
    coords = np.concatenate(coords, 0)
    ny = lv.y_shape
    ny_cap, nz_cap = dec.encoder_caps(lv)
    mask = np.zeros(ny_cap, bool)
    mask[:ny] = True
    coords = np.concatenate([coords, np.zeros((ny_cap - ny, 4), np.int32)], 0)
    nz = lv.z_shape
    z_syms = dec.model.entropy_bottleneck.decompress_symbols(
        dec.eb_tables, lv.z_string, nz
    ).T.astype(np.int16)
    z_syms = np.concatenate([z_syms, np.zeros((nz_cap - nz, z_syms.shape[1]), np.int16)], 0)
    q = jnp.asarray([lv.q_g, lv.q_a], jnp.float32)
    _, _, _, idx = dec._phase1(
        dec.params, jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(z_syms), q, cap_z=nz_cap
    )
    return np.asarray(idx)[:ny]


def _check(enc, dec, frames):
    dev = enc.device_encode(frames, SETTINGS)
    levels, _ = enc.host_encode(dev, SETTINGS)
    for qi, lv in enumerate(levels):
        idx = _decoder_indexes(dec, lv)
        np.testing.assert_array_equal(
            idx.astype(np.int32), dev["y_idxs"][qi].astype(np.int32),
            err_msg=f"quality {qi}: decoder-derived indexes differ",
        )


def test_decoder_rederives_encoder_indexes(codec, rng):
    enc, dec = codec
    frames = []
    for _ in range(3):
        pts = np.unique(rng.integers(-120, 120, (3000, 3)).astype(np.int32), axis=0)
        frames.append({"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)})
    _check(enc, dec, frames)


def test_index_parity_across_overflow_fallback(codec, rng):
    """Scattered points force the encoder's full-capacity fallback; the
    decoder must mirror the same capacity decision from the bitstream."""
    enc, dec = codec
    pts = np.unique(rng.integers(0, 500, (6000, 3)).astype(np.int32) * 4, axis=0)
    frames = [{"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)}]
    _check(enc, dec, frames)
