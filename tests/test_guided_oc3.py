"""OC3 guided-occupancy format (round 5): candidate-index enumeration +
family-form pyramid (pct/pipeline/serial.py::_guided_step_fam_core).

Contract under test:
- an OC3 stream round-trips to the EXACT input voxel set at every level
  (the guided guarantee), with the CR tail applying cleanly;
- the stream tag pins the decode profile: a decoder whose local model would
  resolve the classic profile still decodes OC3 through the family pyramid,
  and legacy OC2 streams still decode through the legacy pyramid (published
  media compatibility);
- the sharded per-frame decoder reproduces the serial OC3 decode, including
  frame counts not divisible by dp (the padded-lane path — ADVICE r4).
"""

import dataclasses

import numpy as np
import jax
import pytest

from pct.models import ColorModel, UnifiedConfig
from pct.pipeline import SerialDecoder, SerialEncoder
from tests.test_guided import SMALL, make_frames

FAM = dataclasses.replace(SMALL, family_synth=True)
CLASSIC = dataclasses.replace(SMALL, family_synth=False)


@pytest.fixture(scope="module")
def fam_codec():
    model = ColorModel(FAM)
    params = model.init_params(jax.random.key(0))
    return model, params, SerialEncoder(model, params), SerialDecoder(model, params)


def test_oc3_roundtrip_exact_geometry(fam_codec, rng):
    model, params, enc, dec = fam_codec
    frames = make_frames(rng)
    levels, _ = enc.compress(frames, [[1.0, 1.0]], geometry_mode="guided")
    assert levels[0].occ_family, "family encoder must write OC3"
    blob = levels[0].pack()
    from pct.entropy.bitstream import SegmentBitstream

    lv = SegmentBitstream.unpack(blob)
    assert lv.occ_family and lv.occ_calibrated and lv.geometry_mode == "guided"
    out, _ = dec.decompress(blob)
    for fr, o in zip(frames, out):
        want = {tuple(r) for r in np.unique(fr["points"], axis=0).tolist()}
        got = {tuple(r) for r in o["points"].tolist()}
        assert got == want


def test_oc3_tag_pins_profile_for_classic_decoder(fam_codec, rng):
    """A decoder whose model config resolves classic synthesis must still
    decode OC3 via the family pyramid (the tag, not the local profile,
    decides) — and vice versa for OC2 under a family decoder."""
    model, params, enc, _ = fam_codec
    frames = make_frames(rng, num_frames=1)
    lv_oc3, _ = enc.compress(frames, [[1.0, 1.0]], geometry_mode="guided")

    dec_classic = SerialDecoder(ColorModel(CLASSIC), params)
    out, _ = dec_classic.decompress(lv_oc3[0].pack())
    want = {tuple(r) for r in np.unique(frames[0]["points"], axis=0).tolist()}
    assert {tuple(r) for r in out[0]["points"].tolist()} == want

    # classic encoder writes OC2; family decoder decodes it via legacy path
    enc_classic = SerialEncoder(ColorModel(CLASSIC), params)
    lv_oc2, _ = enc_classic.compress(frames, [[1.0, 1.0]], geometry_mode="guided")
    assert not lv_oc2[0].occ_family
    dec_fam = SerialDecoder(ColorModel(FAM), params)
    out2, _ = dec_fam.decompress(lv_oc2[0].pack())
    assert {tuple(r) for r in out2[0]["points"].tolist()} == want


def test_oc3_color_residuals(fam_codec, rng):
    model, params, enc, dec = fam_codec
    frames = make_frames(rng, num_frames=2, n=500)
    levels, _ = enc.compress(
        frames, [[1.0, 1.0]], geometry_mode="guided", lossless_color_step=8
    )
    out, _ = dec.decompress(levels[0].pack())
    for fr, o in zip(frames, out):
        pts = np.unique(fr["points"], axis=0)
        assert o["points"].shape == pts.shape
        # step-8 quantized residuals bound the color error on every voxel
        want = {tuple(r): c for r, c in zip(fr["points"].tolist(), fr["colors"])}
        err = max(
            float(np.abs(want[tuple(r)] - c).max())
            for r, c in zip(o["points"].tolist(), o["colors"])
        )
        assert err <= (8 / 255.0) * 0.75 + 2 / 255.0, err


@pytest.mark.parametrize("num_frames", [4, 3])  # 3 on dp=4 = padded lanes
def test_sharded_oc3_matches_serial(fam_codec, rng, num_frames):
    from pct.parallel import ShardedFrameDecoder, make_mesh

    model, params, enc, dec = fam_codec
    devices = jax.devices()[:4]
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(devices, dp=4, tp=1)
    frames = make_frames(rng, num_frames=num_frames, n=600)
    levels, _ = enc.compress(
        frames, [[1.0, 1.0]], geometry_mode="guided", lossless_color_step=12
    )
    assert levels[0].occ_family
    serial_out, _ = dec.decompress(levels[0].pack())
    sharded_out = ShardedFrameDecoder(model, params, mesh).decode(levels[0])
    assert len(sharded_out) == len(serial_out)
    for a, b in zip(serial_out, sharded_out):
        wa = {tuple(r): tuple(c) for r, c in zip(a["points"].tolist(), a["colors"].tolist())}
        wb = {tuple(r): tuple(c) for r, c in zip(b["points"].tolist(), b["colors"].tolist())}
        assert set(wa) == set(wb)
        for k in wa:
            np.testing.assert_allclose(wa[k], wb[k], atol=1.5 / 255.0)
