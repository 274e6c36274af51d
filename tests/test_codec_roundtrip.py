"""End-to-end codec round-trip — the TPU analog of the reference's
``tests/test_pipeline.py`` (encode with the serial encoder, decode with the
serial decoder), with actual asserts instead of eyeballing: lossless entropy
round-trip of the latents, exact latent geometry, frame structure, and
occupancy-count contract."""

import numpy as np
import jax
import pytest

from pct.models import ColorModel, UnifiedConfig, checkpoint
from pct.pipeline import SerialDecoder, SerialEncoder, frames_to_block


SMALL = UnifiedConfig(channels=(8, 12, 16), latent_channels=16, hyper_channels=8, scale_nn_hidden=8)
SMALL_V2 = UnifiedConfig(
    channels=(8, 12, 16),
    latent_channels=16,
    hyper_channels=8,
    scale_nn_hidden=8,
    arch="v2",
    family_channels=8,
)


def make_frames(rng, num_frames=2, n=300, extent=32):
    frames = []
    for _ in range(num_frames):
        pts = np.unique(rng.integers(0, extent, (n, 3)).astype(np.int32), axis=0)
        cols = rng.random((pts.shape[0], 3)).astype(np.float32)
        frames.append({"points": pts, "colors": cols})
    return frames


@pytest.fixture(scope="module", params=["v1", "v2"])
def codec(request):
    model = ColorModel(SMALL if request.param == "v1" else SMALL_V2)
    params = model.init_params(jax.random.key(0))
    return SerialEncoder(model, params), SerialDecoder(model, params)


def test_roundtrip_structure(codec, rng):
    enc, dec = codec
    frames = make_frames(rng)
    settings = [[1.0, 0.0], [1.0, 1.0]]
    levels, sideinfo = enc.compress(frames, settings)
    assert len(levels) == 2
    assert sideinfo["gop_info"]["num_frames"] == 2
    assert all(v >= 0 for v in sideinfo["time_measurements"].values())

    out_frames, dec_info = dec.decompress(levels[1])
    assert len(out_frames) == 2
    for fr, orig in zip(out_frames, frames):
        # top-k contract: decoded point count == original voxel count exactly
        assert fr["points"].shape[0] == orig["points"].shape[0]
        assert fr["colors"].shape == (orig["points"].shape[0], 3)
        assert fr["colors"].min() >= 0 and fr["colors"].max() <= 1
    assert all(v >= 0 for v in dec_info["time_measurements"].values())


def test_latent_geometry_exact(codec, rng):
    """The decoded y/z coordinate sets must match the encoder's exactly."""
    enc, dec = codec
    frames = make_frames(rng, num_frames=1, n=300)
    levels, _ = enc.compress(frames, [[0.5, 0.5]])
    lv = levels[0]

    dev = enc.device_encode(frames, [[0.5, 0.5]])
    assert lv.y_shape == dev["ny"] and lv.z_shape == dev["nz"]

    from pct.gpcc import decode_points

    got = {tuple(r) for r in (decode_points(lv.gpcc_strings[0]) * 8).tolist()}
    want = {tuple(r.tolist()) for r in dev["y_coords"][:, 1:]}
    assert got == want


def test_k_contract(codec, rng):
    """Transmitted k values are the per-frame occupancy counts at strides 4,2,1."""
    enc, _ = codec
    frames = make_frames(rng, num_frames=3, n=300)
    levels, _ = enc.compress(frames, [[1.0, 1.0]])
    ks = np.asarray(levels[0].ks)  # [B, 3]
    for b, fr in enumerate(frames):
        pts = fr["points"]
        for l, stride in enumerate([4, 2, 1]):
            expect = len({tuple((p // stride).tolist()) for p in pts})
            assert ks[b, l] == expect, (b, l)


def test_decode_count_parity_across_rates(codec, rng):
    enc, dec = codec
    frames = make_frames(rng, num_frames=2, n=300)
    settings = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    levels, _ = enc.compress(frames, settings)
    sizes = []
    for lv in levels:
        out, _ = dec.decompress(lv)
        for fr, orig in zip(out, frames):
            assert fr["points"].shape[0] == orig["points"].shape[0]
        sizes.append(lv.num_bytes())
    assert len(set(sizes)) >= 2  # different q -> different rate


def test_bitstream_bytes_roundtrip(codec, rng):
    from pct.entropy import unpack_segment

    enc, dec = codec
    frames = make_frames(rng, num_frames=1, n=300)
    data, _ = enc.compress_bytes(frames, [[1.0, 1.0]])
    assert isinstance(data, bytes)
    # the multi-level segment container round-trips; each level blob is what
    # the media server stores and the decoder consumes directly
    lv = unpack_segment(data)[0]
    out, _ = dec.decompress(lv.pack())
    assert out[0]["points"].shape[0] == frames[0]["points"].shape[0]


def test_checkpoint_roundtrip(tmp_path, codec, rng):
    enc, _ = codec
    path = str(tmp_path / "model.msgpack")
    checkpoint.save(path, enc.model, enc.params)
    model2, params2 = checkpoint.load(path)
    assert model2.config == enc.model.config
    chex = __import__("chex")
    chex.assert_trees_all_equal(params2, jax.tree.map(lambda x: x, enc.params))

    # a decoder built from the loaded checkpoint decodes the encoder's stream
    frames = make_frames(rng, num_frames=1, n=300)
    levels, _ = enc.compress(frames, [[1.0, 1.0]])
    dec2 = SerialDecoder(model2, params2)
    out, _ = dec2.decompress(levels[0])
    assert out[0]["points"].shape[0] == frames[0]["points"].shape[0]


def test_instances_share_jit_traces(codec, rng):
    """Codec objects hash by model config, so a second instance must not
    retrace (regression: pipelined wrappers recompiled the whole codec)."""
    enc, dec = codec
    frames = make_frames(rng, num_frames=1, n=300)
    enc.compress(frames, [[1.0, 1.0]])
    before = SerialEncoder._stage1._cache_size()
    enc2 = SerialEncoder(enc.model, enc.params)
    enc2.compress(frames, [[1.0, 1.0]])
    assert SerialEncoder._stage1._cache_size() == before


def test_overflow_fallback_matches_uncapped(codec, rng):
    """A dense (non-surface) cloud violates the fractional level-capacity
    assumption; the encoder must detect the overflow, re-run at full
    capacity, and produce a bitstream identical to an uncapped encode
    (serial.py overflow path) — the silent-fallback perf cliff must at least
    be *correct*."""
    from pct.pipeline import serial as serial_mod

    enc, dec = codec
    # widely-scattered points: no stride-2 cell merging, so every level's
    # occupancy stays ~= n — far above the fractional caps
    pts = np.unique(rng.integers(0, 600, (6000, 3)).astype(np.int32) * 4, axis=0)
    frames = [{"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)}]
    settings = [[1.0, 1.0]]

    dev = enc.device_encode(frames, settings)

    # the fractional caps must have been insufficient (the fallback fired)
    cap = serial_mod.bucket_size(pts.shape[0])
    level_caps, _ = serial_mod._caps_for(cap)
    if cap > serial_mod.SMALL_INPUT:
        assert int(dev["ks"][1].sum()) >= level_caps[0], "test cloud not dense enough"

    # parity with an explicitly uncapped encode: identical counts + planes
    import jax.numpy as jnp

    from pct.pipeline.serial import _frames_to_arrays

    coords, feats, mask = _frames_to_arrays(frames)
    out_full = enc._stage1(
        enc.params,
        jnp.asarray(coords),
        jnp.asarray(feats),
        jnp.asarray(mask),
        jnp.asarray(np.asarray(settings, np.float32)),
        1,
        (cap,) * len(level_caps),
        cap,
    )
    meta = np.asarray(out_full[0])
    ny = int(meta[-3])
    np.testing.assert_array_equal(dev["ks"], meta[:-3].reshape(3, 1))
    assert dev["ny"] == ny and dev["nz"] == int(meta[-2])
    np.testing.assert_array_equal(dev["y_coords"], np.asarray(out_full[1])[:ny])
    np.testing.assert_array_equal(dev["y_syms"], np.asarray(out_full[2])[:, :ny])
    np.testing.assert_array_equal(dev["z_syms"], np.asarray(out_full[4])[: dev["nz"]])

    # decoded frame keeps exact point-count parity through the k contract
    levels, _ = enc.compress(frames, settings)
    out, _ = dec.decompress(levels[0])
    assert out[0]["points"].shape[0] == pts.shape[0]


def test_multirate_batched_decode_matches_serial(codec, rng):
    """decompress_levels (one batched device pass over all quality
    representations) reproduces per-level decompress exactly."""
    enc, dec = codec
    frames = make_frames(rng, num_frames=2, n=400)
    settings = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    levels, _ = enc.compress(frames, settings)
    batched, _ = dec.decompress_levels(levels)
    assert len(batched) == len(levels)
    for lv, out_q in zip(levels, batched):
        serial_out, _ = dec.decompress(lv)
        assert len(serial_out) == len(out_q)
        for a, b in zip(serial_out, out_q):
            np.testing.assert_array_equal(a["points"], b["points"])
            np.testing.assert_array_equal(a["colors"], b["colors"])


def test_multirate_batched_decode_routes_lossless_rung(codec, rng):
    """A lossless-geometry rung inside a decompress_levels batch (exactly
    what compress(..., lossless_extra=True) produces) must decode the FULL
    voxel set, not lv0's stride-8 latent skeleton (ADVICE round-2 medium:
    it shares ks/y_shape with its latent siblings, so the shared-geometry
    assert cannot catch the mix)."""
    enc, dec = codec
    if enc.model.config.arch != "v1":
        pytest.skip("lossless-geometry synthesis is v1-only")
    frames = make_frames(rng, num_frames=2, n=400)
    settings = [[1.0, 0.0], [1.0, 1.0]]
    levels, _ = enc.compress(frames, settings, lossless_extra=True)
    assert levels[-1].geometry_mode == "lossless"
    batched, _ = dec.decompress_levels(levels)
    assert len(batched) == len(levels)
    # the lossless rung reproduces the exact input voxel set
    for fr, orig in zip(batched[-1], frames):
        got = {tuple(r) for r in fr["points"]}
        want = {tuple(r) for r in orig["points"]}
        assert got == want, "lossless rung decoded against the wrong geometry"
    # and every rung still matches its per-level decode exactly
    for lv, out_q in zip(levels, batched):
        serial_out, _ = dec.decompress(lv)
        for a, b in zip(serial_out, out_q):
            np.testing.assert_array_equal(a["points"], b["points"])
            np.testing.assert_array_equal(a["colors"], b["colors"])


def test_duplicate_points_bucket_parity(codec, rng):
    """Frames with duplicate input points must not desynchronize the
    encoder/decoder static shapes: the encoder buckets the post-dedup count
    (what the decoder reconstructs from sum(ks)), even when the raw row
    count straddles a bucket boundary (ADVICE round-2)."""
    from pct.pipeline.serial import _frames_to_arrays
    from pct.sparse.block import bucket_size

    enc, dec = codec
    pts = np.unique(rng.integers(0, 40, (700, 3)).astype(np.int32), axis=0)
    cols = rng.random((pts.shape[0], 3)).astype(np.float32)
    # duplicate every point: raw count 2n buckets differently than n
    dup_pts = np.concatenate([pts, pts], axis=0)
    dup_cols = np.concatenate([cols, cols], axis=0)
    frames = [{"points": dup_pts, "colors": dup_cols}]
    coords, _, mask = _frames_to_arrays(frames)
    assert mask.sum() == pts.shape[0], "per-frame dedup must precede bucketing"
    assert coords.shape[0] == bucket_size(pts.shape[0])
    levels, _ = enc.compress(frames, [[1.0, 1.0]])
    out, _ = dec.decompress(levels[0])
    assert out[0]["points"].shape[0] == pts.shape[0]


def test_lossless_geometry_mode(codec, rng):
    """geometry_mode="lossless": the full-resolution voxel set rides the
    octree coder, decoded geometry is bit-exact (every voxel, not just the
    count), and synthesis paints colors onto the true sets."""
    enc, dec = codec
    if enc.model.config.arch != "v1":
        pytest.skip("lossless-geometry synthesis is v1-only")
    frames = make_frames(rng, num_frames=2, n=400)
    levels, info = enc.compress(frames, [[1.0, 1.0]], geometry_mode="lossless")
    assert levels[0].geometry_mode == "lossless"
    # wire roundtrip preserves the mode flag
    reparsed = type(levels[0]).unpack(levels[0].pack())
    assert reparsed.geometry_mode == "lossless"
    out, _ = dec.decompress(levels[0].pack())
    for fr, orig in zip(out, frames):
        got = {tuple(r) for r in fr["points"]}
        want = {tuple(r) for r in orig["points"]}
        assert got == want, "lossless mode must reproduce the exact voxel set"
        assert fr["colors"].shape == (orig["points"].shape[0], 3)


def test_bucket_ladder_and_prewarm(codec):
    """prewarm_codec compiles every bucket tier on both codec sides; a
    subsequent encode/decode at any count <= max is a cache hit (no cold
    compile on the live path)."""
    from pct.pipeline import serial as serial_mod
    from pct.pipeline.warmup import bucket_ladder, prewarm_codec, synthetic_gop

    ladder = bucket_ladder(256, 2000)
    assert ladder == sorted(set(ladder))
    from pct.sparse.block import bucket_size

    assert all(bucket_size(b) == b for b in ladder)
    assert ladder[-1] >= 2000 and ladder[0] <= 256

    enc, dec = codec
    report = prewarm_codec(
        enc, dec, num_frames=2, max_points=1200, min_points=256,
        settings=[[1.0, 1.0]], verbose=False,
    )
    assert set(report) == set(bucket_ladder(256, 1200))
    # every live-path graph for an in-ladder segment is now warm
    seen_before = len(serial_mod._SEEN_SHAPES)
    frames = synthetic_gop(700, 2, seed=123)
    levels, _ = enc.compress(frames, [[1.0, 1.0]])
    out, _ = dec.decompress(levels[0])
    assert sum(f["points"].shape[0] for f in out) == 700


def test_prewarm_multi_level_flag(codec):
    """multi_level=False (live services: one selected representation per
    segment) must skip the fused multi-rate decode graphs but still warm the
    single-level decode path."""
    from pct.pipeline.serial import SerialDecoder
    from pct.pipeline.warmup import prewarm_codec

    enc, dec = codec
    calls = {"multi": 0, "single": 0}
    orig_multi = SerialDecoder.decompress_levels
    orig_single = SerialDecoder.decompress

    def spy_multi(self, levels, *a, **k):
        calls["multi"] += 1
        return orig_multi(self, levels, *a, **k)

    def spy_single(self, level, *a, **k):
        calls["single"] += 1
        return orig_single(self, level, *a, **k)

    SerialDecoder.decompress_levels = spy_multi
    SerialDecoder.decompress = spy_single
    try:
        prewarm_codec(
            enc, dec, num_frames=1, max_points=600, min_points=256,
            settings=[[1.0, 1.0], [0.5, 0.5]], verbose=False, multi_level=False,
        )
        assert calls["multi"] == 0, "multi_level=False must skip fused graphs"
        assert calls["single"] > 0, "single-level decode must still prewarm"
        prewarm_codec(
            enc, dec, num_frames=1, max_points=600, min_points=256,
            settings=[[1.0, 1.0], [0.5, 0.5]], verbose=False,
        )
        assert calls["multi"] > 0, "default must warm the fused graphs"
    finally:
        SerialDecoder.decompress_levels = orig_multi
        SerialDecoder.decompress = orig_single


def test_keep_factors_preserve_k_contract(codec, rng):
    """Over-provisioned intermediate pruning (keep_factors > 1) changes only
    internal survivor sets: the decoded per-frame point count still equals
    the transmitted k exactly, and the bitstream is identical to the
    exact-pruning encoder's."""
    import dataclasses

    from pct.models import ColorModel
    from pct.pipeline import SerialDecoder

    enc, dec = codec
    frames = make_frames(rng, num_frames=2, n=400)
    levels, _ = enc.compress(frames, [[1.0, 1.0]])
    m2 = ColorModel(dataclasses.replace(enc.model.config, keep_factors=(2.0, 1.5, 1.0)))
    dec2 = SerialDecoder(m2, enc.params)
    out, _ = dec2.decompress(levels[0])
    for fr, orig in zip(out, frames):
        assert fr["points"].shape[0] == orig["points"].shape[0]
    # config roundtrips through the checkpoint dict
    d = m2.config.to_dict()
    from pct.models import UnifiedConfig

    assert UnifiedConfig.from_dict(d) == m2.config


def test_lossless_color_residual_stream(codec, rng):
    """The lossless rung's optional color-residual stream bounds color error
    by the quantization step regardless of prediction quality (here: random
    weights, so prediction is noise — the residuals carry everything)."""
    enc, dec = codec
    if enc.model.config.arch != "v1":
        pytest.skip("lossless-geometry synthesis is v1-only")
    frames = make_frames(rng, num_frames=2, n=400)
    step = 8
    levels, _ = enc.compress(
        frames, [[1.0, 1.0]], geometry_mode="lossless", lossless_color_step=step
    )
    lv = levels[0]
    assert lv.color_step == step and len(lv.color_string) > 0
    reparsed = type(lv).unpack(lv.pack())
    assert reparsed.color_step == step
    assert reparsed.color_scale_idx == lv.color_scale_idx
    out, _ = dec.decompress(reparsed)
    for fr, orig in zip(out, frames):
        om = {tuple(p): c for p, c in zip(orig["points"].tolist(), orig["colors"])}
        for p, c in zip(fr["points"].tolist(), fr["colors"]):
            err = np.abs(np.asarray(om[tuple(p)]) - c) * 255.0
            # CR2 opponent-basis bound: (step/2) x max column L1 (1.694) + 1
            assert (err <= step / 2 * 1.694 + 1.0).all(), err
    # without residuals, random-weight colors are nowhere near the originals
    plain, _ = enc.compress(frames, [[1.0, 1.0]], geometry_mode="lossless")
    out0, _ = dec.decompress(plain[0])
    errs = []
    om = {tuple(p): c for p, c in zip(frames[0]["points"].tolist(), frames[0]["colors"])}
    for p, c in zip(out0[0]["points"].tolist(), out0[0]["colors"]):
        errs.append(np.abs(np.asarray(om[tuple(p)]) - c).max() * 255.0)
    assert np.mean(errs) > step, "test premise: prediction must be poor with random weights"


def test_latent_color_residual_stream(codec, rng):
    """Latent rungs support the CR2 residual tail: decoded HIT voxels are
    corrected to the exact input color within the opponent-basis quantizer
    bound (the encoder addresses residuals through a simulated decode of its
    own bytes, so the voxel order contract is decode==sim by construction)."""
    enc, dec = codec
    frames = make_frames(rng, num_frames=2, n=400)
    step = 8
    levels, _ = enc.compress(
        frames, [[1.0, 1.0]], geometry_mode="latent", lossless_color_step=step
    )
    lv = levels[0]
    assert lv.geometry_mode == "latent"
    assert lv.color_step == step and len(lv.color_string) > 0
    out, _ = dec.decompress(type(lv).unpack(lv.pack()))
    plain, _ = enc.compress(frames, [[1.0, 1.0]], geometry_mode="latent")
    out_plain, _ = dec.decompress(plain[0])
    n_hits = 0
    for fr, of, op in zip(frames, out, out_plain):
        np.testing.assert_array_equal(of["points"], op["points"])
        om = {tuple(p): c for p, c in zip(fr["points"].tolist(), fr["colors"])}
        for p, c in zip(of["points"].tolist(), of["colors"]):
            if tuple(p) in om:
                n_hits += 1
                err = np.abs(np.asarray(om[tuple(p)]) - c) * 255.0
                assert (err <= step / 2 * 1.694 + 1.0).all(), err
    assert n_hits > 0, "test premise: some decoded voxels must be exact hits"


def test_color_residual_cr1_backcompat(codec, rng):
    """Round-3 media wrote raw-RGB residuals under the CR1 tag; the decoder
    must keep decoding them (no opponent rotation on the way out)."""
    enc, dec = codec
    if enc.model.config.arch != "v1":
        pytest.skip("lossless-geometry synthesis is v1-only")
    frames = make_frames(rng, num_frames=1, n=300)
    step = 8
    levels, _ = enc.compress(
        frames, [[1.0, 1.0]], geometry_mode="lossless", lossless_color_step=step
    )
    lv = levels[0]
    # re-encode the residual tail the round-3 way: raw RGB symbols, CR1 tag
    from pct.entropy import colorres
    from pct.pipeline.serial import _pack_occ_keys

    pred, _ = dec.decompress(
        type(lv)(
            lv.q_g, lv.q_a, lv.y_shape, lv.z_shape, lv.y_string, lv.z_string,
            lv.gpcc_strings, lv.ks, "lossless",
        )
    )
    tgt, prd = colorres.residual_targets(frames, pred, _pack_occ_keys)
    lv.color_transform = False
    lv.color_scale_idx, lv.color_string = colorres.encode_residuals(
        enc.model.gaussian_conditional, enc.gc_tables, (tgt - prd) * 255.0, step, False
    )
    reparsed = type(lv).unpack(lv.pack())
    assert not reparsed.color_transform
    out, _ = dec.decompress(reparsed)
    for fr, of in zip(frames, out):
        om = {tuple(p): c for p, c in zip(fr["points"].tolist(), fr["colors"])}
        for p, c in zip(of["points"].tolist(), of["colors"]):
            err = np.abs(np.asarray(om[tuple(p)]) - c) * 255.0
            assert (err <= step / 2 + 1.0).all(), err  # raw-RGB bound


def test_multirate_fused_five_levels(codec, rng):
    """Five representations fuse into ONE batched decode graph (the round-3
    worker crash no longer reproduces — scripts/repro_fused5.py swept nq=3..6
    at 15k/76k points on the v5e, all green; MAX_FUSED_LEVELS is 6 with
    chunking as the safety valve). Output must match per-level decode."""
    enc, dec = codec
    assert dec.MAX_FUSED_LEVELS >= 5
    frames = make_frames(rng, num_frames=1, n=300)
    settings = [[1.0, a / 4] for a in range(5)]
    levels, _ = enc.compress(frames, settings)
    batched, info = dec.decompress_levels(levels)
    assert len(batched) == 5
    for lv, out_q in zip(levels, batched):
        serial_out, _ = dec.decompress(lv)
        for a, b in zip(serial_out, out_q):
            np.testing.assert_array_equal(a["points"], b["points"])
            np.testing.assert_array_equal(a["colors"], b["colors"])


def test_device_step_split_models_e2_e4(codec, rng):
    """The fused E1 device graph's wall is attributed across E1/E2/E4 by the
    modeled MAC split: all three nonzero, summing exactly to the measured
    device wall, with analysis dominant (hyper grids are ~64x smaller)."""
    enc, _ = codec
    frames = make_frames(rng)
    _, si = enc.compress(frames, [[1.0, 1.0]])
    tm = si["time_measurements"]
    e1, e2, e4 = tm["analysis"], tm["hyper_analysis"], tm["hyper_synthesis"]
    assert e1 > 0 and e2 > 0 and e4 > 0
    dev = enc.device_encode(frames, [[1.0, 1.0]])
    f = dev["step_fracs"]
    assert abs(sum(f) - 1.0) < 1e-6
    np.testing.assert_allclose((e1 + e2 + e4) * np.asarray(f) / sum(f),
                               [e1, e2, e4], rtol=1e-6)
    # at production capacities (shrunk level/z caps) the split must be
    # analysis-dominant — hyper grids are ~64x smaller than the input
    from pct.pipeline.serial import _caps_for, _device_step_fractions

    cap = 262144
    level_caps, cap_z = _caps_for(cap)
    fa, fha, fhs = _device_step_fractions(
        enc.params, enc.model.config, cap, level_caps, cap_z
    )
    assert abs(fa + fha + fhs - 1.0) < 1e-6
    assert fa > 0.5 and fa > fha and fa > fhs
