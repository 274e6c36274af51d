"""Golden-file stability: the wire format and the full encode path must stay
byte-identical across refactors (encoder regression) and decodable forever
(decoder compatibility). Regenerate the fixture ONLY on deliberate format
changes (see tests/golden/)."""

import os

import numpy as np
import jax
import pytest

from pct.models import ColorModel, UnifiedConfig
from pct.pipeline import SerialDecoder, SerialEncoder

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
TINY = UnifiedConfig(channels=(4, 4, 8), latent_channels=8, hyper_channels=4, scale_nn_hidden=4)


@pytest.fixture(scope="module")
def golden():
    data = open(os.path.join(GOLDEN_DIR, "segment_tiny.bin"), "rb").read()
    inp = np.load(os.path.join(GOLDEN_DIR, "segment_tiny_input.npz"))
    return data, inp


def test_encoder_bytes_stable(golden):
    data, inp = golden
    model = ColorModel(TINY)
    params = model.init_params(jax.random.key(0))
    enc = SerialEncoder(model, params)
    levels, _ = enc.compress(
        [{"points": inp["points"], "colors": inp["colors"]}], [[1.0, 1.0]]
    )
    assert levels[0].pack() == data


def test_decoder_reads_golden(golden):
    data, inp = golden
    model = ColorModel(TINY)
    params = model.init_params(jax.random.key(0))
    dec = SerialDecoder(model, params)
    out, _ = dec.decompress(data)
    assert out[0]["points"].shape[0] == inp["points"].shape[0]


def test_decoder_reads_legacy_v2_streams():
    """Deliberate format change, round 5: the octree coder gained
    prior-initialized contexts (header flag 0x40, priors_v3.h) for small
    streams (-18% latent-skeleton bytes on held-out frames). Streams coded
    before the change carry no flag and MUST decode forever — these
    fixtures are the last v2-era goldens, frozen."""
    inp = np.load(os.path.join(GOLDEN_DIR, "segment_tiny_input.npz"))
    data = open(os.path.join(GOLDEN_DIR, "segment_tiny_v2.bin"), "rb").read()
    model = ColorModel(TINY)
    params = model.init_params(jax.random.key(0))
    out, _ = SerialDecoder(model, params).decompress(data)
    assert out[0]["points"].shape[0] == inp["points"].shape[0]

    from pct.models.geometry import GeometryCodec, GeometryConfig, GeometryModel

    pts = np.load(os.path.join(GOLDEN_DIR, "geometry_tiny_points.npy"))
    gdata = open(os.path.join(GOLDEN_DIR, "geometry_tiny_v2.bin"), "rb").read()
    gm = GeometryModel(GeometryConfig(channels=(4, 4, 8), latent_channels=8))
    gc = GeometryCodec(gm, gm.init_params(jax.random.key(0)))
    assert gc.decode(gdata)[0].shape == pts.shape


def test_geometry_codec_golden():
    from pct.models.geometry import GeometryCodec, GeometryConfig, GeometryModel

    pts = np.load(os.path.join(GOLDEN_DIR, "geometry_tiny_points.npy"))
    data = open(os.path.join(GOLDEN_DIR, "geometry_tiny.bin"), "rb").read()
    model = GeometryModel(GeometryConfig(channels=(4, 4, 8), latent_channels=8))
    codec = GeometryCodec(model, model.init_params(jax.random.key(0)))
    streams = codec.encode([{"points": pts}])
    assert streams[2] == data  # encoder byte stability
    out = codec.decode(data)  # decoder compatibility
    assert out[0].shape == pts.shape
