"""Guided-occupancy geometry mode: every candidate child's true occupancy
bit is entropy-coded under the synthesis heads' predicted probability
(``pct/entropy/binary.py`` + ``SerialEncoder._attach_guided``), so decoded
geometry is the EXACT input voxel set at every level — replacing the
reference's lossy top-k pruning (``receiver/decoder/codec_parallel.py:
465-472``) with an explicit occupancy code at the model-priced rate."""

import numpy as np
import jax
import pytest

from pct.entropy.binary import (
    NUM_BINS,
    BinaryConditional,
    bin_probabilities,
    logit_bins,
)
from pct.entropy.bitstream import SegmentBitstream
from pct.models import ColorModel, UnifiedConfig
from pct.pipeline import SerialDecoder, SerialEncoder

SMALL = UnifiedConfig(
    channels=(8, 12, 16), latent_channels=16, hyper_channels=8, scale_nn_hidden=8,
    occ_layers=2, occ_hidden=8,
)


def make_frames(rng, num_frames=2, n=700, extent=64):
    frames = []
    for _ in range(num_frames):
        pts = np.unique(rng.integers(0, extent, (n, 3)).astype(np.int32), axis=0)
        cols = rng.random((pts.shape[0], 3)).astype(np.float32)
        frames.append({"points": pts, "colors": cols})
    return frames


@pytest.fixture(scope="module")
def codec():
    model = ColorModel(SMALL)
    params = model.init_params(jax.random.key(0))
    return SerialEncoder(model, params), SerialDecoder(model, params)


# ---------------------------------------------------------------------------
# binary coder
# ---------------------------------------------------------------------------


def test_binary_coder_roundtrip(rng):
    bc = BinaryConditional()
    tables = bc.update()
    bits = (rng.random(5000) < 0.3).astype(np.int32)
    bins = rng.integers(0, NUM_BINS, 5000).astype(np.int32)
    stream = bc.compress(tables, bits, bins)
    out = bc.decompress(tables, stream, bins)
    np.testing.assert_array_equal(np.asarray(out, np.int32), bits)


def test_binary_coder_rate_tracks_probability():
    """Coding all-ones under a high-probability bin must be much cheaper
    than under a low-probability bin (the rate IS the cross entropy)."""
    bc = BinaryConditional()
    tables = bc.update()
    bits = np.ones(4000, np.int32)
    cheap = bc.compress(tables, bits, np.full(4000, NUM_BINS - 1, np.int32))
    dear = bc.compress(tables, bits, np.zeros(4000, np.int32))
    assert len(cheap) * 8 < 4000 * 0.05  # ~0.0005 bits/symbol at p≈1
    assert len(dear) > len(cheap) * 50


def test_logit_bins_match_probabilities():
    """Device binning and host bin centers agree: the bin of logit L has a
    center probability within half a bin width of sigmoid(L)."""
    logits = jax.numpy.asarray(np.linspace(-7.9, 7.9, 201, dtype=np.float32))
    bins = np.asarray(logit_bins(logits))
    probs = bin_probabilities()
    sig = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64)))
    # monotone, in-range, and centers track the true probabilities
    assert (np.diff(bins) >= 0).all()
    assert bins.min() >= 0 and bins.max() < NUM_BINS
    assert np.abs(probs[bins] - sig).max() < 0.04


def test_calibrated_coder_roundtrip_and_rate(rng):
    """OC2 calibration: round-trips exactly, and when the bin-center
    probabilities are badly wrong the calibrated stream is much smaller
    (rate = per-bin empirical entropy instead of cross entropy)."""
    bc = BinaryConditional()
    # bits drawn at p=0.9 but labeled with LOW-probability bins (severe
    # head miscalibration)
    bits = (rng.random(20000) < 0.9).astype(np.int32)
    bins = rng.integers(0, 8, 20000).astype(np.int32)  # centers near p~0.001
    stream_cal = bc.compress_calibrated(bits, bins)
    out = bc.decompress_calibrated(stream_cal, bins)
    np.testing.assert_array_equal(np.asarray(out, np.int32), bits)
    stream_static = bc.compress(bc.update(), bits, bins)
    assert len(stream_cal) < len(stream_static) / 5, (
        len(stream_cal),
        len(stream_static),
    )


def test_calibrated_coder_empty_and_skewed_bins(rng):
    """Bins that never occur, all-zeros and all-ones bins must all survive
    the uint16 quantization round-trip."""
    bc = BinaryConditional()
    bits = np.concatenate([np.zeros(500, np.int32), np.ones(500, np.int32)])
    bins = np.concatenate([np.full(500, 3, np.int32), np.full(500, 60, np.int32)])
    stream = bc.compress_calibrated(bits, bins)
    np.testing.assert_array_equal(
        np.asarray(bc.decompress_calibrated(stream, bins), np.int32), bits
    )


# ---------------------------------------------------------------------------
# wire format
# ---------------------------------------------------------------------------


def test_bitstream_oc1_backward_compat():
    """Pre-round-4 guided blobs (OC1 tag, negative num_frames) still unpack
    as guided with occ_calibrated=False."""
    lv = SegmentBitstream(
        q_g=1.0, q_a=0.5, y_shape=4, z_shape=2,
        y_string=b"yy", z_string=b"zz",
        gpcc_strings=[b"g0"], ks=[(4, 3, 2)],
        geometry_mode="guided", occ_strings=[b"a", b"bb", b"ccc"],
        occ_calibrated=False,
    )
    blob = bytearray(lv.pack())
    assert b"OC1" in blob and b"OC2" not in blob
    # simulate the old writer's negative num_frames for guided
    import struct

    struct.pack_into("<i", blob, 0, -1)
    out = SegmentBitstream.unpack(bytes(blob))
    assert out.geometry_mode == "guided" and not out.occ_calibrated
    assert out.num_frames == 1 and out.occ_strings == [b"a", b"bb", b"ccc"]


def test_bitstream_truncated_guided_degrades_to_latent():
    """A guided blob whose OC1/OC2 tail is lost parses as a VALID latent
    blob (positive num_frames), not as lossless (ADVICE r3)."""
    lv = SegmentBitstream(
        q_g=1.0, q_a=0.5, y_shape=4, z_shape=2,
        y_string=b"yy", z_string=b"zz",
        gpcc_strings=[b"g0"], ks=[(4, 3, 2)],
        geometry_mode="guided", occ_strings=[b"a", b"bb", b"ccc"],
    )
    blob = lv.pack()
    trunc = SegmentBitstream.unpack(blob[: blob.index(b"OC2")])
    assert trunc.geometry_mode == "latent"
    assert trunc.num_frames == 1 and trunc.y_string == b"yy"


def test_bitstream_occ_tail_roundtrip():
    lv = SegmentBitstream(
        q_g=1.0, q_a=0.5, y_shape=4, z_shape=2,
        y_string=b"yy", z_string=b"zz",
        gpcc_strings=[b"g0", b"g1"], ks=[(4, 3, 2), (4, 3, 2)],
        geometry_mode="guided", occ_strings=[b"a", b"bb", b"ccc"],
        color_step=12, color_scale_idx=(1, 2, 3), color_string=b"rrr",
    )
    out = SegmentBitstream.unpack(lv.pack())
    assert out.geometry_mode == "guided"
    assert out.occ_strings == [b"a", b"bb", b"ccc"]
    assert out.color_step == 12 and out.color_string == b"rrr"
    assert out.ks == lv.ks and out.y_string == b"yy"


def test_bitstream_guided_requires_streams():
    lv = SegmentBitstream(
        q_g=1.0, q_a=0.5, y_shape=4, z_shape=2,
        y_string=b"y", z_string=b"z", gpcc_strings=[b"g"], ks=[(1, 1, 1)],
        geometry_mode="guided",
    )
    with pytest.raises(AssertionError):
        lv.pack()


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------


def test_guided_roundtrip_exact_geometry(codec, rng):
    """The defining contract: decoded voxel sets are bit-exact vs the
    (deduped) input at an UNTRAINED model — exactness must hold for any
    head, not just a calibrated one."""
    enc, dec = codec
    frames = make_frames(rng)
    levels, _ = enc.compress(frames, [[1.0, 0.0]], geometry_mode="guided")
    assert levels[0].geometry_mode == "guided"
    assert len(levels[0].occ_strings) == enc.model.config.num_levels
    out, _ = dec.decompress(levels[0].pack())
    for fr, of in zip(frames, out):
        want = np.unique(np.asarray(fr["points"], np.int32), axis=0)
        np.testing.assert_array_equal(of["points"], want)


def test_guided_color_residuals(codec, rng):
    """Guided + color residual stream reconstructs colors to the quantizer
    bound on the exact voxel set."""
    enc, dec = codec
    frames = make_frames(rng, num_frames=1)
    step = 8
    levels, _ = enc.compress(
        frames, [[1.0, 0.0]], geometry_mode="guided", lossless_color_step=step
    )
    assert levels[0].color_step == step
    out, _ = dec.decompress(levels[0].pack())
    fr, of = frames[0], out[0]
    pts = np.asarray(fr["points"], np.int32)
    uniq, first = np.unique(pts, axis=0, return_index=True)
    np.testing.assert_array_equal(of["points"], uniq)
    err = np.abs(fr["colors"][first] - of["colors"]) * 255.0
    # CR2 quantizes in the orthonormal opponent basis: per-RGB-channel
    # worst case is (step/2) x the rotation's max column L1 (1.694), +1 for
    # uint8 rounding; RGB MSE is unchanged (rotation preserves L2)
    assert err.max() <= step / 2 * 1.694 + 1.0
    assert err.mean() <= step / 2


def test_guided_multirate_and_batched_routing(codec, rng):
    """decompress_levels must route guided rungs through the dedicated
    decode (they share ks/y_shape with latent siblings, so the shared-
    geometry assert cannot catch them — ADVICE round-2 class of bug)."""
    enc, dec = codec
    frames = make_frames(rng)
    latent_levels, _ = enc.compress(frames, [[1.0, 0.0], [0.5, 0.5]])
    guided_levels, _ = enc.compress(frames, [[1.0, 0.0]], geometry_mode="guided")
    mixed = [latent_levels[0], guided_levels[0], latent_levels[1]]
    outs, _ = dec.decompress_levels(mixed)
    # guided rung decodes the exact set; latent rungs keep the k contract
    for fr, of in zip(frames, outs[1]):
        want = np.unique(np.asarray(fr["points"], np.int32), axis=0)
        np.testing.assert_array_equal(of["points"], want)
    for qi in (0, 2):
        for fr, of in zip(frames, outs[qi]):
            assert of["points"].shape[0] == np.unique(fr["points"], axis=0).shape[0]


def test_mixed_ladder_per_rung_modes(codec, rng):
    """The demo ladder shape: per-rung geometry modes + per-rung color
    steps in ONE compress call — [latent, guided, guided] with residuals on
    the top rung only (configs/sender.yaml)."""
    enc, dec = codec
    frames = make_frames(rng, num_frames=2)
    levels, _ = enc.compress(
        frames,
        [[0.25, 0.25], [0.0, 1.0], [0.0, 1.0]],
        geometry_mode=["latent", "guided", "guided"],
        lossless_color_step=[0, 0, 8],
    )
    assert [lv.geometry_mode for lv in levels] == ["latent", "guided", "guided"]
    assert [lv.color_step for lv in levels] == [0, 0, 8]
    outs, _ = dec.decompress_levels([lv.pack() for lv in levels])
    for qi in (1, 2):  # guided rungs decode the exact set
        for fr, of in zip(frames, outs[qi]):
            want = np.unique(np.asarray(fr["points"], np.int32), axis=0)
            np.testing.assert_array_equal(of["points"], want)
    # top rung reconstructs colors to the quantizer bound
    for fr, of in zip(frames, outs[2]):
        pts = np.asarray(fr["points"], np.int32)
        _, first = np.unique(pts, axis=0, return_index=True)
        err = np.abs(fr["colors"][first] - of["colors"]) * 255.0
        assert err.max() <= 8 / 2 * 1.694 + 1.0  # CR2 opponent-basis bound
    # latent rung keeps the k contract
    for fr, of in zip(frames, outs[0]):
        assert of["points"].shape[0] == np.unique(fr["points"], axis=0).shape[0]


def test_mixed_ladder_with_lossless_rung(codec, rng):
    """Per-rung 'lossless' coexists with latent/guided in one ladder.
    lossless_extra appends the octree rung only when the ladder's top rung
    isn't already lossless (a duplicate would carry identical geometry AND
    identical latents — pure bandwidth waste)."""
    enc, dec = codec
    frames = make_frames(rng, num_frames=1)
    want = np.unique(np.asarray(frames[0]["points"], np.int32), axis=0)

    # top rung already lossless: lossless_extra is a no-op
    levels, _ = enc.compress(
        frames,
        [[1.0, 0.0], [0.5, 0.5]],
        geometry_mode=["latent", "lossless"],
        lossless_extra=True,
        lossless_color_step=[0, 6],
    )
    assert [lv.geometry_mode for lv in levels] == ["latent", "lossless"]
    assert levels[1].color_step == 6
    out, _ = dec.decompress(levels[1].pack())
    np.testing.assert_array_equal(out[0]["points"], want)

    # lossless mid-ladder, latent on top: the extra octree rung IS appended
    # and inherits the top rung's color step
    levels, _ = enc.compress(
        frames,
        [[1.0, 0.0], [0.5, 0.5]],
        geometry_mode=["lossless", "latent"],
        lossless_extra=True,
        lossless_color_step=[6, 0],
    )
    assert [lv.geometry_mode for lv in levels] == ["lossless", "latent", "lossless"]
    assert levels[0].color_step == 6 and levels[2].color_step == 0
    for lv in (levels[0], levels[2]):
        out, _ = dec.decompress(lv.pack())
        np.testing.assert_array_equal(out[0]["points"], want)


def test_guided_every_quality_decodes_exact(codec, rng):
    """Occupancy streams are coded under each rung's own y-hat-conditioned
    logits; every rung must still decode the exact set (the streams are
    rung-specific, so a cross-rung mixup would corrupt geometry)."""
    enc, dec = codec
    frames = make_frames(rng, num_frames=1)
    levels, _ = enc.compress(
        frames, [[1.0, 0.0], [0.25, 0.75]], geometry_mode="guided"
    )
    for lv in levels:
        out, _ = dec.decompress(lv.pack())
        want = np.unique(np.asarray(frames[0]["points"], np.int32), axis=0)
        np.testing.assert_array_equal(out[0]["points"], want)


def test_membership_graph_stable_across_true_set_sizes(codec, rng):
    """The guided-encode membership graph must key on the (prewarmed)
    candidate capacity alone: segments in the same bucket tier with
    different per-level true-set sizes must NOT trigger new compiles (a
    cold membership compile costs 20-50 s on the live hot path — the
    round-5 r5m campaign regression)."""
    from pct.pipeline import serial as S

    enc, _ = codec

    def seg(n, seed):
        r = np.random.default_rng(seed)
        pts = np.unique(r.integers(0, 64, (n, 3)).astype(np.int32), axis=0)
        return [{"points": pts, "colors": r.random((pts.shape[0], 3)).astype(np.float32)}]

    enc.compress(seg(700, 1), [[1.0, 0.0]], geometry_mode="guided")
    before = S._guided_membership._cache_size()
    enc.compress(seg(640, 2), [[1.0, 0.0]], geometry_mode="guided")
    enc.compress(seg(520, 3), [[1.0, 0.0]], geometry_mode="guided")
    assert S._guided_membership._cache_size() == before
