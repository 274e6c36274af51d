"""Pipelined codec correctness: byte parity with the serial codec and
concurrent-segment behavior."""

import numpy as np
import jax
import pytest

from pct.models import ColorModel, UnifiedConfig
from pct.pipeline import (
    CompressionPipeline,
    DecompressionPipeline,
    SerialDecoder,
    SerialEncoder,
)

TINY = UnifiedConfig(channels=(4, 4, 8), latent_channels=8, hyper_channels=4, scale_nn_hidden=4)


def make_frames(rng, num_frames=2, n=300, extent=32):
    frames = []
    for _ in range(num_frames):
        pts = np.unique(rng.integers(0, extent, (n, 3)).astype(np.int32), axis=0)
        frames.append(
            {"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)}
        )
    return frames


@pytest.fixture(scope="module")
def setup():
    model = ColorModel(TINY)
    params = model.init_params(jax.random.key(0))
    return model, params


def test_pipelined_matches_serial_bytes(setup, rng):
    model, params = setup
    frames = make_frames(rng)
    settings = [[1.0, 0.0], [1.0, 1.0]]
    s_levels, _ = SerialEncoder(model, params).compress(frames, settings)
    p_levels, p_info = CompressionPipeline(model, params).compress(frames, settings)
    assert len(s_levels) == len(p_levels)
    for a, b in zip(s_levels, p_levels):
        assert a.pack() == b.pack()
    assert set(p_info["time_measurements"]) >= {
        "analysis",
        "hyper_analysis",
        "factorized_model",
        "hyper_synthesis",
        "gaussian_model",
        "geometry_compression",
        "bitstream_writing",
    }


def test_pipelined_decode_matches_serial(setup, rng):
    model, params = setup
    frames = make_frames(rng, num_frames=1)
    levels, _ = SerialEncoder(model, params).compress(frames, [[0.5, 0.5]])
    s_out, _ = SerialDecoder(model, params).decompress(levels[0])
    p_out, _ = DecompressionPipeline(model, params).decompress(levels[0].pack())
    assert len(s_out) == len(p_out)
    for a, b in zip(s_out, p_out):
        np.testing.assert_array_equal(a["points"], b["points"])
        np.testing.assert_allclose(a["colors"], b["colors"], atol=1e-6)


def test_pipelined_overlapping_segments(setup, rng):
    """Concurrent compress calls from multiple threads all complete and each
    returns its own segment (FIFO-safety of the stage queues)."""
    from concurrent.futures import ThreadPoolExecutor

    model, params = setup
    pipe = CompressionPipeline(model, params)
    batches = [make_frames(rng, num_frames=1) for _ in range(4)]
    with ThreadPoolExecutor(max_workers=3) as ex:
        futs = [ex.submit(pipe.compress, b, [[1.0, 1.0]]) for b in batches]
        results = [f.result(timeout=300) for f in futs]
    for (levels, info), frames in zip(results, batches):
        assert levels[0].ks[0][2] == frames[0]["points"].shape[0]


def test_pipelined_decode_stage_overlap(setup, rng):
    """The decode pipeline must actually overlap: segment n+1's host-entropy
    head stage runs WHILE segment n's synthesis stage runs (the reference's
    4-thread decoder overlap, codec_parallel.py:28-43 — round 3 ran all
    decode work in one stage)."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    model, params = setup
    pipe = DecompressionPipeline(model, params)
    enc = SerialEncoder(model, params)
    blobs = []
    for _ in range(3):
        frames = make_frames(rng, num_frames=1)
        levels, _ = enc.compress(frames, [[0.5, 0.5]])
        blobs.append(levels[0].pack())
    pipe.decompress(blobs[0])  # warm the jit caches so stage times are real

    spans = {"head": [], "neural": []}
    ser = pipe._serial
    orig1, orig2 = ser._latent_phase1_host, ser._latent_phase2_host

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            spans[name].append((t0, time.time()))
            return out

        return wrap

    ser._latent_phase1_host = timed("head", orig1)
    ser._latent_phase2_host = timed("neural", orig2)
    try:
        with ThreadPoolExecutor(max_workers=3) as ex:
            futs = [ex.submit(pipe.decompress, b) for b in blobs]
            outs = [f.result(timeout=300) for f in futs]
    finally:
        ser._latent_phase1_host, ser._latent_phase2_host = orig1, orig2
    assert len(outs) == 3 and all(o[0] for o in outs)
    assert len(spans["head"]) == 3 and len(spans["neural"]) == 3
    # some head interval overlaps some neural interval of an EARLIER segment
    overlap = any(
        h0 < n1 and n0 < h1
        for i, (h0, h1) in enumerate(spans["head"])
        for j, (n0, n1) in enumerate(spans["neural"])
        if j < i
    )
    assert overlap, (spans, "decode stages never overlapped across segments")


def test_pipelined_decode_guided_and_lossless(setup, rng):
    """Non-latent rungs route whole through the neural stage and still decode
    the exact voxel set through the pipeline."""
    model, params = setup
    frames = make_frames(rng, num_frames=1)
    enc = SerialEncoder(model, params)
    pipe = DecompressionPipeline(model, params)
    for mode in ("guided", "lossless"):
        levels, _ = enc.compress(frames, [[1.0, 0.0]], geometry_mode=mode)
        out, _ = pipe.decompress(levels[0].pack())
        got = {tuple(r) for r in out[0]["points"]}
        want = {tuple(r) for r in frames[0]["points"]}
        assert got == want, mode


def test_pipelined_error_propagates(setup):
    model, params = setup
    pipe = DecompressionPipeline(model, params)
    with pytest.raises(RuntimeError, match="stage failed"):
        pipe.decompress(b"\x07garbage-bytes")

def test_pipelined_lossless_extra_rep(rng):
    """lossless_extra appends a shared-latents lossless-geometry rung; it
    decodes to the exact voxel set through the standard decoder."""
    import jax

    from pct.models import ColorModel, UnifiedConfig
    from pct.pipeline import CompressionPipeline, DecompressionPipeline

    model = ColorModel(
        UnifiedConfig(channels=(8, 12, 16), latent_channels=16, hyper_channels=8, scale_nn_hidden=8)
    )
    params = model.init_params(jax.random.key(0))
    enc = CompressionPipeline(model, params)
    dec = DecompressionPipeline(model, params)
    frames = []
    for _ in range(2):
        pts = np.unique(rng.integers(0, 40, (400, 3)).astype(np.int32), axis=0)
        frames.append({"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)})
    levels, _ = enc.compress(frames, [[1.0, 1.0]], lossless_extra=True)
    assert len(levels) == 2 and levels[-1].geometry_mode == "lossless"
    assert levels[-1].y_string == levels[0].y_string  # shared latents
    out, _ = dec.decompress(levels[-1].pack())
    for fr, orig in zip(out, frames):
        assert {tuple(r) for r in fr["points"]} == {tuple(r) for r in orig["points"]}
