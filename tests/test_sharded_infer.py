"""dp-sharded GOP encode (pct.parallel.infer) on the virtual 8-CPU mesh:
single-device parity and end-to-end decodability through the standard
decoder (VERDICT round-1 item 5)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    from pct.models import ColorModel, UnifiedConfig
    from pct.parallel import ShardedFrameEncoder, make_mesh

    cfg = UnifiedConfig(channels=(8, 16, 16), latent_channels=16, hyper_channels=8)
    model = ColorModel(cfg)
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(3)
    frames = []
    for _ in range(4):
        pts = np.unique(rng.integers(-80, 80, (2500, 3)).astype(np.int32), axis=0)
        frames.append(
            {"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)}
        )
    mesh = make_mesh(jax.devices()[:4], dp=4, tp=1)
    single = make_mesh(jax.devices()[:1], dp=1, tp=1)
    return model, params, frames, mesh, single


def test_sharded_encode_matches_single_device(setup):
    model, params, frames, mesh, single = setup
    from pct.parallel import ShardedFrameEncoder

    sharded = ShardedFrameEncoder(model, params, mesh).encode(frames, [[1.0, 1.0]])
    alone = ShardedFrameEncoder(model, params, single).encode(frames, [[1.0, 1.0]])
    assert sharded["ny"] == alone["ny"] and sharded["nz"] == alone["nz"]
    np.testing.assert_array_equal(sharded["ks"], alone["ks"])
    np.testing.assert_array_equal(sharded["y_coords"], alone["y_coords"])
    np.testing.assert_array_equal(sharded["y_syms"], alone["y_syms"])
    np.testing.assert_array_equal(sharded["y_idxs"], alone["y_idxs"])
    np.testing.assert_array_equal(sharded["z_syms"], alone["z_syms"])


def test_sharded_encode_decodes_roundtrip(setup):
    """Sharded device-encode -> standard host entropy coding -> standard
    single-chip decoder reproduces every frame's point count exactly."""
    model, params, frames, mesh, _ = setup
    from pct.parallel import ShardedFrameEncoder
    from pct.pipeline import SerialDecoder, SerialEncoder

    settings = [[1.0, 1.0]]
    enc = SerialEncoder(model, params)
    dev = ShardedFrameEncoder(model, params, mesh).encode(frames, settings)
    levels, _ = enc.host_encode(dev, settings)
    out, _ = SerialDecoder(model, params).decompress(levels[0])
    assert len(out) == len(frames)
    for o, f in zip(out, frames):
        assert o["points"].shape[0] == f["points"].shape[0]
        got = {tuple(r) for r in o["points"]}
        want = {tuple(r) for r in f["points"]}
        # top-k occupancy with ground-truth k reproduces the exact voxel set
        # only with trained weights; random weights must still hit >some overlap
        assert len(got & want) > 0
