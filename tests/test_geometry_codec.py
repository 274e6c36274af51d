"""Geometry-only factorized codec (model family 2) round-trip tests."""

import numpy as np
import jax
import pytest

from pct.models.geometry import GeometryCodec, GeometryConfig, GeometryModel, RATE_POINTS

TINY = GeometryConfig(channels=(4, 4, 8), latent_channels=8)


@pytest.fixture(scope="module")
def codec():
    model = GeometryModel(TINY)
    params = model.init_params(jax.random.key(0))
    return GeometryCodec(model, params)


def make_frames(rng, num_frames=2, n=300, extent=32):
    out = []
    for _ in range(num_frames):
        pts = np.unique(rng.integers(0, extent, (n, 3)).astype(np.int32), axis=0)
        out.append({"points": pts})
    return out


def test_geometry_roundtrip_counts(codec, rng):
    frames = make_frames(rng)
    streams = codec.encode(frames)
    assert len(streams) == len(RATE_POINTS)
    for s in streams:
        out = codec.decode(s)
        assert len(out) == len(frames)
        for pts, fr in zip(out, frames):
            # k contract: decoded counts match the originals exactly
            assert pts.shape == fr["points"].shape


def test_geometry_rate_points_encoded(codec, rng):
    # with untrained weights the latents can quantize identically at every
    # gain, so assert the rate-point headers rather than size monotonicity
    import struct

    frames = make_frames(rng, num_frames=1)
    streams = codec.encode(frames)
    gains = [struct.unpack_from("<ifi", s, 0)[1] for s in streams]
    assert gains == pytest.approx(list(RATE_POINTS))
    assert all(len(s) > 16 for s in streams)


def test_geometry_single_frame_single_point_safety(codec):
    frames = [{"points": np.array([[4, 4, 4], [11, 9, 2]], np.int32)}]
    out = codec.decode(codec.encode(frames)[0])
    assert out[0].shape[0] == 2
