"""Torch-checkpoint converter tests (synthetic state_dict with the upstream
module naming)."""

import numpy as np
import jax
import pytest

from pct.models import ColorModel, UnifiedConfig
from pct.models.convert import convert_torch_checkpoint, default_name_map


TINY = UnifiedConfig(channels=(4, 4, 8), latent_channels=8, hyper_channels=4, scale_nn_hidden=4)


def synthetic_state_dict(model, rng):
    """Build a torch-style state_dict matching the default name map."""
    ref = model.init_params(jax.random.key(1))
    sd = {}
    for pct_path, torch_prefix in default_name_map(model.config.num_levels).items():
        node = ref
        for p in pct_path.split("/"):
            node = node[p]
        sd[torch_prefix + ".kernel"] = np.asarray(node["w"]) + 1.0  # distinct values
        sd[torch_prefix + ".bias"] = np.asarray(node["b"]) + 1.0
    sd["entropy_model.scale_nn.0.weight"] = np.asarray(ref["scale_nn"]["w0"]).T + 1.0
    sd["entropy_model.scale_nn.0.bias"] = np.asarray(ref["scale_nn"]["b0"]) + 1.0
    sd["entropy_model.scale_nn.2.weight"] = np.asarray(ref["scale_nn"]["w1"]).T + 1.0
    sd["entropy_model.scale_nn.2.bias"] = np.asarray(ref["scale_nn"]["b1"]) + 1.0
    eb = ref["entropy_bottleneck"]
    for k in range(4):
        sd[f"entropy_model.entropy_bottleneck._matrix{k}"] = np.asarray(eb[f"matrix_{k}"]) + 1.0
        sd[f"entropy_model.entropy_bottleneck._bias{k}"] = np.asarray(eb[f"bias_{k}"]) + 1.0
        if f"factor_{k}" in eb:
            sd[f"entropy_model.entropy_bottleneck._factor{k}"] = np.asarray(eb[f"factor_{k}"]) + 1.0
    sd["entropy_model.entropy_bottleneck.quantiles"] = np.asarray(eb["quantiles"]) + 1.0
    return sd


def test_convert_maps_all_tensors(rng):
    model = ColorModel(TINY)
    sd = synthetic_state_dict(model, rng)
    params, unmatched = convert_torch_checkpoint(sd, model, strict=True)
    assert unmatched == []
    # converted values actually landed (offset by +1 from a key-1 init)
    ref = model.init_params(jax.random.key(1))
    np.testing.assert_allclose(
        np.asarray(params["g_a"]["conv0"]["w"]),
        np.asarray(ref["g_a"]["conv0"]["w"]) + 1.0,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["scale_nn"]["w0"]),
        np.asarray(ref["scale_nn"]["w0"]) + 1.0,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["entropy_bottleneck"]["quantiles"]),
        np.asarray(ref["entropy_bottleneck"]["quantiles"]) + 1.0,
        rtol=1e-6,
    )


def test_convert_shape_mismatch_raises(rng):
    model = ColorModel(TINY)
    sd = synthetic_state_dict(model, rng)
    sd["g_a.conv0.kernel"] = np.zeros((27, 5, 5), np.float32)  # wrong shape
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_torch_checkpoint(sd, model)


def test_convert_reports_unmatched(rng):
    model = ColorModel(TINY)
    sd = synthetic_state_dict(model, rng)
    sd["some.unknown.tensor"] = np.zeros(3)
    params, unmatched = convert_torch_checkpoint(sd, model)
    assert unmatched == ["some.unknown.tensor"]
    with pytest.raises(ValueError, match="unmatched"):
        convert_torch_checkpoint(sd, model, strict=True)


def test_width_expansion_function_preserving(rng):
    """expand_width embeds a trained small model into a wider config whose
    forward pass reproduces the small model's outputs (eps=0), including the
    1-layer -> 2-layer occupancy-head upgrade via the relu(x)-relu(-x)
    identity."""
    import jax
    import jax.numpy as jnp

    from pct.models import ColorModel, UnifiedConfig
    from pct.models.expand import expand_width
    from pct.pipeline.serial import frames_to_block

    small_cfg = UnifiedConfig(channels=(8, 12, 16), latent_channels=16, hyper_channels=8, scale_nn_hidden=8)
    wide_cfg = UnifiedConfig(
        channels=(16, 24, 32), latent_channels=32, hyper_channels=16,
        scale_nn_hidden=8, occ_layers=2, occ_hidden=16,
    )
    sm = ColorModel(small_cfg)
    sp = sm.init_params(jax.random.key(3))
    wm, wp = expand_width(sm, sp, wide_cfg, eps=0.0)

    pts = np.unique(rng.integers(0, 40, (800, 3)).astype(np.int32), axis=0)
    frames = [{"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)}]
    block = frames_to_block(frames)

    ys, kss = sm.g_a(sp, block, 1)
    yw, ksw = wm.g_a(wp, block, 1)
    np.testing.assert_array_equal(np.asarray(kss), np.asarray(ksw))
    np.testing.assert_allclose(np.asarray(yw.feats)[:, :16], np.asarray(ys.feats), atol=2e-5)
    assert float(jnp.abs(yw.feats[:, 16:]).max()) < 1e-6

    caps = (block.capacity,) * 3
    rgb_s = sm.g_s(sp, ys, kss, level_capacities=caps)
    rgb_w = wm.g_s(wp, yw, ksw, level_capacities=caps)
    ps = {tuple(r) for r in np.asarray(rgb_s.coords)[np.asarray(rgb_s.mask)].tolist()}
    pw = {tuple(r) for r in np.asarray(rgb_w.coords)[np.asarray(rgb_w.mask)].tolist()}
    assert ps == pw
    np.testing.assert_allclose(
        np.asarray(rgb_w.feats)[np.asarray(rgb_w.mask)],
        np.asarray(rgb_s.feats)[np.asarray(rgb_s.mask)],
        atol=1e-4,
    )
