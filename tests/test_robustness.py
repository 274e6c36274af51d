"""Adversarial-input robustness: corrupt or truncated streams must fail with
clean exceptions (never hangs, never silent garbage with wrong structure)."""

import numpy as np
import jax
import pytest

from pct.entropy import SegmentBitstream, unpack_segment
from pct.gpcc import decode_points
from pct.models import ColorModel, UnifiedConfig
from pct.pipeline import SerialDecoder, SerialEncoder

TINY = UnifiedConfig(channels=(4, 4, 8), latent_channels=8, hyper_channels=4, scale_nn_hidden=4)


@pytest.fixture(scope="module")
def codec(rng=np.random.default_rng(0)):
    model = ColorModel(TINY)
    params = model.init_params(jax.random.key(0))
    enc, dec = SerialEncoder(model, params), SerialDecoder(model, params)
    pts = np.unique(rng.integers(0, 32, (300, 3)).astype(np.int32), axis=0)
    frames = [{"points": pts, "colors": rng.random((len(pts), 3)).astype(np.float32)}]
    levels, _ = enc.compress(frames, [[1.0, 1.0]])
    return dec, levels[0]


def test_truncated_container(codec):
    dec, lv = codec
    data = lv.pack()
    with pytest.raises((ValueError, AssertionError, Exception)):
        dec.decompress(data[: len(data) // 3])


def test_corrupt_gpcc_stream(codec):
    dec, lv = codec
    bad = SegmentBitstream(
        lv.q_g, lv.q_a, lv.y_shape, lv.z_shape, lv.y_string, lv.z_string,
        [b"\xff" * 8], lv.ks,
    )
    with pytest.raises((ValueError, AssertionError)):
        dec.decompress(bad.pack())


def test_gpcc_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        decode_points(b"\x00")
    # header claiming 1M points with no body -> clean failure
    import struct

    fake = struct.pack("<i", 10**6) + b"\x00" * 13
    with pytest.raises(ValueError):
        decode_points(fake)


def test_mismatched_k_counts_no_crash(codec):
    """k larger than the candidate set must degrade (fewer points), not crash."""
    dec, lv = codec
    bloated = SegmentBitstream(
        lv.q_g, lv.q_a, lv.y_shape, lv.z_shape, lv.y_string, lv.z_string,
        lv.gpcc_strings, [(k1, k2, k3 * 4) for (k1, k2, k3) in lv.ks],
    )
    frames, _ = dec.decompress(bloated.pack())
    assert frames[0]["points"].shape[0] <= lv.ks[0][2] * 4


def test_unpack_segment_garbage():
    with pytest.raises(Exception):
        unpack_segment(b"\x02\x00\x00\x00garbage")
