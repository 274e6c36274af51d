"""Two-stage fine-level selection (``UnifiedConfig.refine_levels``) — the
round-5 architectural hit-rate lever (VERDICT r4 item 2).

Contracts pinned here:
- a grafted ZERO-INIT refine head is selection-neutral: g_s output is
  bit-identical to the baseline model on both synthesis paths (the graft
  can ride on a trained checkpoint without disturbing it);
- with a NONZERO refine head, classic and family forms agree on the
  selected voxel set (the parity class the codec's cross-path tests rely
  on) and the refined aux entries supervise the heads (grads flow);
- the trainable-mask optimizer updates ONLY the refine heads (the coded
  rate cannot move when everything upstream of the wire bytes is frozen);
- config/checkpoint round-trip carries the refine fields.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pct.models import ColorModel, UnifiedConfig
from pct.models.expand import graft_refine
from tests.test_family_synth import CFG, _mk_inputs


def _refined(cfg):
    return dataclasses.replace(cfg, refine_levels=(1, 2))


def test_zero_init_graft_is_selection_neutral(rng):
    for family in (False, True):
        cfg = dataclasses.replace(CFG, family_synth=family)
        m_base, params, y, ks = _mk_inputs(rng, cfg)
        m_base = ColorModel(cfg)
        m_ref, params_ref = graft_refine(m_base, params, (1, 2))
        out_b = m_base.g_s(params, y, ks)
        out_r = m_ref.g_s(params_ref, y, ks)
        np.testing.assert_array_equal(np.asarray(out_b.mask), np.asarray(out_r.mask))
        np.testing.assert_array_equal(
            np.asarray(out_b.coords), np.asarray(out_r.coords)
        )
        m = np.asarray(out_b.mask)
        np.testing.assert_array_equal(
            np.asarray(out_b.feats)[m], np.asarray(out_r.feats)[m]
        )


def _nonzero_refine(params, levels, rng):
    out = jax.tree_util.tree_map(lambda x: x, params)
    for l in levels:
        pr = dict(out["g_s"][f"refine{l}"])
        pr["w2"] = jnp.asarray(
            rng.standard_normal(pr["w2"].shape), jnp.float32
        )
        out["g_s"][f"refine{l}"] = pr
    return out


def test_family_matches_classic_with_nonzero_refine(rng):
    cfg = _refined(CFG)
    m_classic, params, y, ks = _mk_inputs(rng, CFG)
    m_classic = ColorModel(dataclasses.replace(cfg, family_synth=False))
    m_family = ColorModel(dataclasses.replace(cfg, family_synth=True))
    _, params = graft_refine(ColorModel(CFG), params, (1, 2))
    params = _nonzero_refine(params, (1, 2), rng)

    out_c = m_classic.g_s(params, y, ks)
    out_f = m_family.g_s(params, y, ks)
    np.testing.assert_array_equal(np.asarray(out_c.mask), np.asarray(out_f.mask))
    np.testing.assert_array_equal(np.asarray(out_c.coords), np.asarray(out_f.coords))
    mc = np.asarray(out_c.mask)
    np.testing.assert_allclose(
        np.asarray(out_f.feats)[mc], np.asarray(out_c.feats)[mc], rtol=3e-5, atol=3e-5
    )


def test_refine_aux_entries_and_grads(rng):
    cfg = dataclasses.replace(_refined(CFG), family_synth=True)
    _, params, y, ks = _mk_inputs(rng, CFG)
    m = ColorModel(cfg)
    _, params = graft_refine(ColorModel(CFG), params, (1, 2))
    params = _nonzero_refine(params, (1, 2), rng)

    _, aux = m.g_s(params, y, ks, return_logits=True)
    # base entries for all 3 levels + refine entries for levels 1 and 2
    assert [e[0] for e in aux] == [0, 1, 1, 2, 2]
    # refine entry masks are subsets of the base candidate masks
    by_level = {}
    for lvl, _, mask, _ in aux:
        by_level.setdefault(lvl, []).append(np.asarray(mask))
    for lvl in (1, 2):
        base, prov = by_level[lvl]
        assert prov.sum() < base.sum()
        assert not (prov & ~base).any()

    def loss(p):
        _, aux = m.g_s(p, y, ks, return_logits=True)
        l = jnp.float32(0.0)
        for _, _, mask, logits in aux:
            l = l + jnp.sum(jnp.where(mask, logits, 0.0) ** 2)
        return l

    g = jax.grad(loss)(params)
    for l in (1, 2):
        for k in ("w1", "w2"):
            assert float(jnp.abs(g["g_s"][f"refine{l}"][k]).sum()) > 0


def test_trainable_mask_freezes_everything_else(rng):
    import optax

    from pct.train.step import TrainConfig, make_optimizer, trainable_mask

    _, params, y, ks = _mk_inputs(rng, CFG)
    _, params = graft_refine(ColorModel(CFG), params, (1, 2))
    mask = trainable_mask(params, "refine")
    flat = jax.tree_util.tree_leaves_with_path(mask)
    on = [p for p, v in flat if v]
    assert on and all("refine" in "/".join(str(k) for k in p) for p in on)

    opt = make_optimizer(TrainConfig(learning_rate=1e-2), params, "refine")
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    newp = optax.apply_updates(params, updates)
    moved = jax.tree_util.tree_map_with_path(
        lambda p, a, b: (np.asarray(a) != np.asarray(b)).any(), params, newp
    )
    for p, v in jax.tree_util.tree_leaves_with_path(moved):
        path = "/".join(str(k) for k in p)
        assert v == ("refine" in path), path


def test_config_roundtrip_and_checkpoint(tmp_path, rng):
    from pct.models import checkpoint

    cfg = dataclasses.replace(
        CFG, refine_levels=(2,), refine_factor=1.5, refine_hidden=8
    )
    assert UnifiedConfig.from_dict(cfg.to_dict()) == cfg
    m = ColorModel(cfg)
    params = m.init_params(jax.random.key(0))
    path = str(tmp_path / "ck.msgpack")
    checkpoint.save(path, m, params)
    m2, p2 = checkpoint.load(path)
    assert m2.config.refine_levels == (2,)
    assert "refine2" in p2["g_s"] and "refine1" not in p2["g_s"]


def test_refine_validation():
    with pytest.raises(ValueError):
        UnifiedConfig(channels=(8, 16, 16), latent_channels=16, refine_levels=(3,))
    with pytest.raises(ValueError):
        UnifiedConfig(
            channels=(8, 16, 16), latent_channels=16, refine_levels=(1,),
            refine_factor=1.0,
        )


def test_refine_codec_roundtrip(rng):
    """Serial encode/decode with a refine model: exact per-frame counts and
    decoder-side selection identical to the encoder's simulation."""
    from pct.pipeline import SerialDecoder, SerialEncoder

    cfg = dataclasses.replace(_refined(CFG))
    m = ColorModel(cfg)
    params = m.init_params(jax.random.key(3))
    params = _nonzero_refine(params, (1, 2), rng)
    frames = []
    for _ in range(2):
        pts = np.unique(rng.integers(0, 48, (900, 3)).astype(np.int32), axis=0)
        frames.append(
            {
                "points": pts,
                "colors": rng.random((pts.shape[0], 3)).astype(np.float32),
            }
        )
    enc = SerialEncoder(m, params)
    dec = SerialDecoder(m, params)
    levels, _ = enc.compress(frames, [[1.0, 1.0]])
    out, _ = dec.decompress(levels[0])
    assert len(out) == 2
    for f, o in zip(frames, out):
        assert o["points"].shape[0] == f["points"].shape[0]


def test_standardized_refine_loss_nulls_recalibration(rng):
    """The refine entries of ``frame_rd_loss`` train on per-frame
    STANDARDIZED scores (pct/train/losses.py): a uniform shift of the
    refined logits — the recalibration direction plain BCE collapsed into
    (PERF.md finding 6) — is removed by the masked mean, so the gradient
    w.r.t. the refine head's output bias ``b2`` must vanish, while the
    re-ordering directions (w1/w2) keep real gradient."""
    from pct.train import TrainConfig, batch_rd_loss, frames_to_training_batch

    cfg = dataclasses.replace(
        UnifiedConfig(
            channels=(4, 4, 8), latent_channels=8, hyper_channels=4,
            scale_nn_hidden=4,
        ),
        refine_levels=(1, 2),
    )
    model = ColorModel(cfg)
    params = model.init_params(jax.random.key(0))
    params = _nonzero_refine(params, (1, 2), rng)
    frames = []
    for _ in range(2):
        pts = np.unique(rng.integers(0, 32, (120, 3)).astype(np.int32), axis=0)
        frames.append(
            {"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)}
        )
    batch = frames_to_training_batch(frames, capacity=128)
    qs = jnp.asarray(rng.random((2, 2)), jnp.float32)
    keys = jax.random.split(jax.random.key(1), 2)
    def loss_of(p):
        return batch_rd_loss(model, TrainConfig(), p, batch, qs, keys)

    (loss, _), g = jax.value_and_grad(loss_of, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for l in (1, 2):
        gr = g["g_s"][f"refine{l}"]
        assert float(jnp.abs(gr["w1"]).sum()) > 0
        assert float(jnp.abs(gr["w2"]).sum()) > 0

    # finite-shift form of the invariance: a LARGE uniform bias shift of the
    # refined logits (the exact direction plain BCE descended into) changes
    # neither the selection (monotone) nor the standardized loss
    shifted = jax.tree_util.tree_map(lambda x: x, params)
    for l in (1, 2):
        pr = dict(shifted["g_s"][f"refine{l}"])
        pr["b2"] = pr["b2"] + 1.0
        shifted["g_s"][f"refine{l}"] = pr
    l0, _ = loss_of(params)
    l1, _ = loss_of(shifted)
    assert abs(float(l0) - float(l1)) < 1e-3 * max(abs(float(l0)), 1.0)
