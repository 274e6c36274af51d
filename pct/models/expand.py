"""Function-preserving width expansion of trained checkpoints (net2net).

Grows a trained ``ColorModel`` into a wider configuration so training can
warm-start from the small model's function instead of from scratch: every
existing channel keeps its exact weights, new channels start as epsilon
noise with ZERO outgoing weights into the preserved paths, so the wide model
computes the same output as the small one at load (up to the epsilon noise)
and gradient flow breaks the zero-block symmetry immediately.

Supported growth: ``channels``, ``latent_channels``, ``hyper_channels``,
``family off``, and the 1-layer -> 2-layer occupancy head upgrade
(``occ_layers``): a linear scorer embeds exactly into conv-relu-conv via the
ReLU identity ``x == relu(x) - relu(-x)`` — the first conv carries
``[+w, -w]`` pairs and the second conv's center tap recombines them, so the
upgraded head reproduces the old logits bit-for-bit (before noise).

The hyper path's ``h_s.conv1`` output is ``[scales | means]`` chunked along
channels; the expansion maps the old scale block into the new scale block
and the old mean block into the new mean block (a plain copy would mix
them). New latent channels receive ~zero analysis weights so their symbols
cost ~0.03 bpp/channel at the factorized floor until training recruits them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pct.models.unified import ColorModel, Params, UnifiedConfig


def _grow(key, old: jax.Array, new_shape: tuple[int, ...], eps: float) -> jax.Array:
    """Embed ``old`` in the top-left corner of a new eps-noise tensor."""
    out = eps * jax.random.normal(key, new_shape, jnp.float32)
    sl = tuple(slice(0, s) for s in old.shape)
    return out.at[sl].set(old)


def graft_refine(
    model: ColorModel,
    params: Params,
    refine_levels: tuple[int, ...],
    refine_factor: float = 2.0,
    refine_hidden: int = 16,
    seed: int = 0,
) -> tuple[ColorModel, Params]:
    """Graft two-stage-selection refine heads onto a trained checkpoint
    (``UnifiedConfig.refine_levels``). The heads' output layers are zero, so
    the grafted model selects bit-identically to the source until the heads
    train — the intended warm start for the round-5 hit-rate work."""
    import dataclasses

    cfg = dataclasses.replace(
        model.config,
        refine_levels=tuple(refine_levels),
        refine_factor=refine_factor,
        refine_hidden=refine_hidden,
    )
    new_model = ColorModel(cfg)
    fresh = new_model.init_params(jax.random.key(seed))
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for lvl in refine_levels:
        out["g_s"][f"refine{lvl}"] = fresh["g_s"][f"refine{lvl}"]
    return new_model, out


def expand_width(
    small_model: ColorModel,
    small_params: Params,
    wide_cfg: UnifiedConfig,
    eps: float = 1e-3,
    seed: int = 0,
) -> tuple[ColorModel, Params]:
    """Returns ``(wide_model, wide_params)`` computing (approximately) the
    same function as the small model. Config must only GROW widths; arch and
    num_levels must match (v1 only)."""
    scfg = small_model.config
    assert scfg.arch == wide_cfg.arch == "v1", "expansion implemented for v1"
    assert scfg.num_levels == wide_cfg.num_levels
    for a, b in zip(scfg.channels, wide_cfg.channels):
        assert b >= a, "channels must grow"
    assert wide_cfg.latent_channels >= scfg.latent_channels
    assert wide_cfg.hyper_channels >= scfg.hyper_channels

    wide = ColorModel(wide_cfg)
    key = jax.random.key(seed)
    params = wide.init_params(key)  # provides fresh entropy_bottleneck etc.
    keys = iter(jax.random.split(jax.random.key(seed + 1), 256))
    sp = small_params
    Ls, Lw = scfg.latent_channels, wide_cfg.latent_channels
    Hs, Hw = scfg.hyper_channels, wide_cfg.hyper_channels

    def grow_cb(dst: dict, src: dict, w_shape, names=("w", "b")):
        dst[names[0]] = _grow(next(keys), src[names[0]], w_shape, eps)
        dst[names[1]] = _grow(next(keys), src[names[1]], (w_shape[-1],), 0.0)

    # ---- g_a
    for i, cw in enumerate(wide_cfg.channels):
        cin_w = wide_cfg.in_channels if i == 0 else wide_cfg.channels[i - 1]
        grow_cb(params["g_a"][f"conv{i}"], sp["g_a"][f"conv{i}"], (27, cin_w, cw))
        grow_cb(params["g_a"][f"down{i}"], sp["g_a"][f"down{i}"], (8, cw, cw))
    grow_cb(params["g_a"]["out"], sp["g_a"]["out"], (27, wide_cfg.channels[-1], Lw))

    # ---- h_a
    grow_cb(params["h_a"]["conv0"], sp["h_a"]["conv0"], (27, Lw, Hw))
    grow_cb(params["h_a"]["down0"], sp["h_a"]["down0"], (8, Hw, Hw))
    grow_cb(params["h_a"]["down1"], sp["h_a"]["down1"], (8, Hw, Hw))

    # ---- h_s (conv1 output is [scales | means]: map block-wise)
    grow_cb(params["h_s"]["up0"], sp["h_s"]["up0"], (8, Hw, Hw))
    grow_cb(params["h_s"]["conv0"], sp["h_s"]["conv0"], (27, Hw, Hw))
    grow_cb(params["h_s"]["up1"], sp["h_s"]["up1"], (8, Hw, Hw))
    w_old = sp["h_s"]["conv1"]["w"]  # [27, Hs, 2*Ls]
    b_old = sp["h_s"]["conv1"]["b"]
    w_new = eps * jax.random.normal(next(keys), (27, Hw, 2 * Lw), jnp.float32)
    b_new = jnp.zeros((2 * Lw,), jnp.float32)
    w_new = w_new.at[:, :Hs, :Ls].set(w_old[:, :, :Ls])  # scales block
    w_new = w_new.at[:, :Hs, Lw : Lw + Ls].set(w_old[:, :, Ls:])  # means block
    b_new = b_new.at[:Ls].set(b_old[:Ls]).at[Lw : Lw + Ls].set(b_old[Ls:])
    params["h_s"]["conv1"] = {"w": w_new, "b": b_new}

    # ---- g_s
    up_s = tuple(reversed(scfg.channels))
    up_w = tuple(reversed(wide_cfg.channels))
    cin_s, cin_w = Ls, Lw
    for i, (cs, cw) in enumerate(zip(up_s, up_w)):
        grow_cb(params["g_s"][f"up{i}"], sp["g_s"][f"up{i}"], (8, cin_w, cw))
        grow_cb(params["g_s"][f"conv{i}"], sp["g_s"][f"conv{i}"], (27, cw, cw))
        occ_old = sp["g_s"][f"occ{i}"]
        if wide_cfg.occ_layers == 2 and "w" in occ_old:
            # 1-layer [27, cin_s, 8] -> conv-relu-conv via x = relu(x)-relu(-x)
            oh = wide_cfg.occ_hidden
            assert oh >= 16, "occ upgrade needs occ_hidden >= 16"
            w1 = eps * jax.random.normal(next(keys), (27, cin_w, oh), jnp.float32)
            b1 = jnp.zeros((oh,), jnp.float32)
            w1 = w1.at[:, :cin_s, :8].set(occ_old["w"])
            w1 = w1.at[:, :cin_s, 8:16].set(-occ_old["w"])
            b1 = b1.at[:8].set(occ_old["b"]).at[8:16].set(-occ_old["b"])
            w2 = jnp.zeros((27, oh, 8), jnp.float32)
            eye = jnp.eye(8, dtype=jnp.float32)
            w2 = w2.at[13, :8, :].set(eye).at[13, 8:16, :].set(-eye)
            params["g_s"][f"occ{i}"] = {
                "w1": w1,
                "b1": b1,
                "w2": w2,
                "b2": jnp.zeros((8,), jnp.float32),
            }
        elif wide_cfg.occ_layers == 2:
            oh = wide_cfg.occ_hidden
            params["g_s"][f"occ{i}"] = {
                "w1": _grow(next(keys), occ_old["w1"], (27, cin_w, oh), eps),
                "b1": _grow(next(keys), occ_old["b1"], (oh,), 0.0),
                "w2": _grow(next(keys), occ_old["w2"], (27, oh, 8), eps),
                "b2": occ_old["b2"],
            }
        else:
            grow_cb(params["g_s"][f"occ{i}"], occ_old, (27, cin_w, 8))
        cin_s, cin_w = cs, cw
    rgb_old = sp["g_s"]["rgb"]
    if wide_cfg.rgb_layers == 2 and "w" in rgb_old:
        # 1-layer conv27 [27, c, 3] -> conv27-relu-dense via x = relu(x)-relu(-x):
        # hidden slots 0..2 carry +head (bias included), 3..5 carry -head,
        # the dense recombines them — bit-identical colors before noise.
        rh = wide_cfg.rgb_hidden
        assert rh >= 6, "rgb upgrade needs rgb_hidden >= 6"
        w1 = eps * jax.random.normal(next(keys), (27, up_w[-1], rh), jnp.float32)
        b1 = jnp.zeros((rh,), jnp.float32)
        w1 = w1.at[:, : up_s[-1], :3].set(rgb_old["w"])
        w1 = w1.at[:, : up_s[-1], 3:6].set(-rgb_old["w"])
        b1 = b1.at[:3].set(rgb_old["b"]).at[3:6].set(-rgb_old["b"])
        eye = jnp.eye(3, dtype=jnp.float32)
        w2 = jnp.zeros((rh, 3), jnp.float32).at[:3].set(eye).at[3:6].set(-eye)
        params["g_s"]["rgb"] = {
            "w1": w1, "b1": b1, "w2": w2, "b2": jnp.zeros((3,), jnp.float32)
        }
    elif wide_cfg.rgb_layers == 2:
        rh = wide_cfg.rgb_hidden
        params["g_s"]["rgb"] = {
            "w1": _grow(next(keys), rgb_old["w1"], (27, up_w[-1], rh), eps),
            "b1": _grow(next(keys), rgb_old["b1"], (rh,), 0.0),
            "w2": _grow(next(keys), rgb_old["w2"], (rh, 3), eps),
            "b2": rgb_old["b2"],
        }
    else:
        grow_cb(params["g_s"]["rgb"], rgb_old, (27, up_w[-1], 3))

    # ---- scale_nn (fresh columns for new latent channels start near gain 1)
    hs = sp["scale_nn"]["w0"].shape[1]
    hw = max(wide_cfg.scale_nn_hidden, hs)
    params["scale_nn"]["w0"] = _grow(next(keys), sp["scale_nn"]["w0"], (2, hw), eps)
    params["scale_nn"]["b0"] = _grow(next(keys), sp["scale_nn"]["b0"], (hw,), 0.0)
    w1g = eps * jax.random.normal(next(keys), (hw, Lw), jnp.float32)
    params["scale_nn"]["w1"] = w1g.at[:hs, :Ls].set(sp["scale_nn"]["w1"])
    b1g = jnp.full((Lw,), float(np.log(np.e - 1)), jnp.float32)  # softplus^-1(1)
    params["scale_nn"]["b1"] = b1g.at[:Ls].set(sp["scale_nn"]["b1"])

    # ---- entropy bottleneck: keep old channels' learned CDF params
    ebs, ebw = sp["entropy_bottleneck"], params["entropy_bottleneck"]
    for k in ebs:
        old, new = ebs[k], ebw[k]
        if old.shape == new.shape:
            ebw[k] = old
        else:  # leading channel axis grew Hs -> Hw
            ebw[k] = new.at[tuple(slice(0, s) for s in old.shape)].set(old)
    return wide, params
