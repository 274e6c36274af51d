"""cap_mode="counted" must be a pure graph-shape change: decoded frames are
bit-identical to the default tier caps (capacity only pads; selection,
ordering and values never depend on it — the contract the vox10 scale bench
relies on, pct/pipeline/serial.py::_synth_caps)."""

import jax
import numpy as np

from pct.models import ColorModel, UnifiedConfig
from pct.pipeline import SerialDecoder, SerialEncoder

CFG = UnifiedConfig(
    channels=(8, 16, 16), latent_channels=16, hyper_channels=8,
    occ_layers=2, occ_hidden=8,
)


def _frames(rng, n=1500, f=2):
    out = []
    for _ in range(f):
        pts = np.unique(rng.integers(0, 48, (n, 3)).astype(np.int32), axis=0)
        out.append(
            {"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)}
        )
    return out


def test_counted_caps_bit_identical(rng):
    model = ColorModel(CFG)
    params = model.init_params(jax.random.key(0))
    enc = SerialEncoder(model, params)
    frames = _frames(rng)
    levels, _ = enc.compress(frames, [[1.0, 1.0], [0.2, 0.8]])

    dec_tier = SerialDecoder(model, params)
    dec_cnt = SerialDecoder(model, params, cap_mode="counted")
    for lv in levels:
        a, _ = dec_tier.decompress(lv)
        b, _ = dec_cnt.decompress(lv)
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(fa["points"], fb["points"])
            np.testing.assert_array_equal(fa["colors"], fb["colors"])

    # multi-rate fused decode too
    outs_t, _ = dec_tier.decompress_levels(levels)
    outs_c, _ = dec_cnt.decompress_levels(levels)
    for a, b in zip(outs_t, outs_c):
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(fa["points"], fb["points"])
            np.testing.assert_array_equal(fa["colors"], fb["colors"])
