"""Family-form g_s (pct/models/unified.py::_g_s_family) vs the classic path.

The family path computes the SAME candidate enumeration, top-k contract and
output ordering as classic g_s; only conv accumulation order differs. With
seeded random weights the occupancy logits are well separated, so the
decoded voxel SETS (the selection) must agree exactly and features must
agree to f32-accumulation tolerance. This pins the selection semantics the
round-5 decode wall fix rides on (PERF.md round 5; pct/ops/family.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pct.models import ColorModel, UnifiedConfig
from tests.test_union_kmap import make_gop_block

CFG = UnifiedConfig(
    channels=(8, 16, 16), latent_channels=16, hyper_channels=8,
    occ_layers=2, occ_hidden=8,
)


def _mk_inputs(rng, cfg, frames=2, per_frame=120):
    m = ColorModel(dataclasses.replace(cfg, family_synth=False))
    params = m.init_params(jax.random.key(0))
    block = make_gop_block(rng, frames, per_frame, 0.7, stride=8)
    y = block.with_feats(
        jnp.asarray(
            rng.standard_normal((block.capacity, cfg.latent_channels)), jnp.float32
        )
        * block.mask[:, None]
    )
    ks = jnp.asarray([[60] * frames, [200] * frames, [500] * frames], jnp.int32)
    return m, params, y, ks


@pytest.mark.parametrize("rgb_layers,keep_factors", [
    (1, (1.0, 1.0, 1.0)),
    (2, (2.0, 1.5, 1.0)),
])
def test_family_matches_classic_selection_and_feats(rng, rgb_layers, keep_factors):
    cfg = dataclasses.replace(CFG, rgb_layers=rgb_layers, keep_factors=keep_factors)
    m_classic, params, y, ks = _mk_inputs(rng, cfg)
    m_family = ColorModel(dataclasses.replace(cfg, family_synth=True))

    out_c = m_classic.g_s(params, y, ks)
    out_f = m_family.g_s(params, y, ks)

    # identical selection AND identical canonical ordering of the output
    np.testing.assert_array_equal(np.asarray(out_c.mask), np.asarray(out_f.mask))
    np.testing.assert_array_equal(np.asarray(out_c.coords), np.asarray(out_f.coords))
    mc = np.asarray(out_c.mask)
    np.testing.assert_allclose(
        np.asarray(out_f.feats)[mc], np.asarray(out_c.feats)[mc], rtol=3e-5, atol=3e-5
    )


def test_family_aux_logits_match(rng):
    """Training-path contract: per-level (cand_coords, cand_mask, logits)."""
    m_classic, params, y, ks = _mk_inputs(rng, CFG)
    m_family = ColorModel(dataclasses.replace(CFG, family_synth=True))
    _, aux_c = m_classic.g_s(params, y, ks, return_logits=True)
    _, aux_f = m_family.g_s(params, y, ks, return_logits=True)
    assert len(aux_c) == len(aux_f) == CFG.num_levels
    assert [e[0] for e in aux_c] == [e[0] for e in aux_f] == [0, 1, 2]
    for (_, cc, mc_, lc), (_, cf, mf, lf) in zip(aux_c, aux_f):
        np.testing.assert_array_equal(np.asarray(mc_), np.asarray(mf))
        m = np.asarray(mc_)
        np.testing.assert_array_equal(np.asarray(cc)[m], np.asarray(cf)[m])
        np.testing.assert_allclose(
            np.asarray(lf)[m], np.asarray(lc)[m], rtol=5e-5, atol=5e-5
        )


def test_family_grads_finite(rng):
    """The family path is differentiable (training can run family on TPU)."""
    m_family = ColorModel(dataclasses.replace(CFG, family_synth=True))
    _, params, y, ks = _mk_inputs(rng, CFG)

    def loss(p):
        rgb, aux = m_family.g_s(p, y, ks, return_logits=True)
        l = jnp.sum(rgb.feats**2 * rgb.mask[:, None])
        for _, _, mask, logits in aux:
            l = l + jnp.sum(jnp.where(mask, logits, 0.0) ** 2) * 1e-3
        return l

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g["g_s"])
    assert leaves and all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    # the conv weights receive gradient through the family block form
    assert float(jnp.abs(g["g_s"]["conv0"]["w"]).sum()) > 0
    assert float(jnp.abs(g["g_s"]["occ1"]["w1"]).sum()) > 0
