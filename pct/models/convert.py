"""Convert a PyTorch ``ColorModel`` checkpoint into pct parameters.

The reference loads the external Unified-Point-Cloud-Compression model from
``unified/results/<name>/{config.yaml, weights.pt}`` (reference
``codec_pipeline.py:56-72``). This converter maps such a torch ``state_dict``
onto the pct parameter pytree so existing trained weights can be reused.

MinkowskiEngine stores sparse-conv kernels as ``[K, C_in, C_out]`` — the same
tap-major layout pct uses (``pct.ops.conv``), so conv weights copy through
without transposition; dense (linear) layers transpose torch's
``[out, in]`` to pct's ``[in, out]``. The mapping table below covers the
architecture documented in SURVEY.md §2.3 (3-level analysis/synthesis,
2-level hyperprior, scale_nn, factorized bottleneck); checkpoints with
different module names can pass a custom ``name_map``.

Unmapped reference tensors are reported, never silently dropped.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

import jax.numpy as jnp

from pct.models.unified import ColorModel, Params


def default_name_map(num_levels: int = 3) -> dict[str, str]:
    """pct param path -> torch state_dict key (without the trailing
    ``.weight``/``.bias`` selector, handled by the converter)."""
    m: dict[str, str] = {}
    for i in range(num_levels):
        m[f"g_a/conv{i}"] = f"g_a.conv{i}"
        m[f"g_a/down{i}"] = f"g_a.down{i}"
        m[f"g_s/up{i}"] = f"g_s.up{i}"
        m[f"g_s/conv{i}"] = f"g_s.conv{i}"
        m[f"g_s/occ{i}"] = f"g_s.occ{i}"
    m["g_a/out"] = "g_a.out"
    m["g_s/rgb"] = "g_s.rgb"
    m["h_a/conv0"] = "entropy_model.h_a.conv0"
    m["h_a/down0"] = "entropy_model.h_a.down0"
    m["h_a/down1"] = "entropy_model.h_a.down1"
    m["h_s/up0"] = "entropy_model.h_s.up0"
    m["h_s/conv0"] = "entropy_model.h_s.conv0"
    m["h_s/up1"] = "entropy_model.h_s.up1"
    m["h_s/conv1"] = "entropy_model.h_s.conv1"
    return m


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_torch_checkpoint(
    state_dict: Mapping[str, "np.ndarray"],
    model: ColorModel,
    name_map: dict[str, str] | None = None,
    strict: bool = False,
) -> tuple[Params, list[str]]:
    """Returns ``(params, unmatched_torch_keys)``.

    Starts from a fresh init (so missing modules keep valid shapes) and
    overwrites every mappable tensor. With ``strict=True`` raises if any
    torch tensor stays unmatched.
    """
    import jax

    params = model.init_params(jax.random.key(0))
    nm = name_map or default_name_map(model.config.num_levels)
    used: set[str] = set()

    def put(path: str, leaf: str, value: np.ndarray):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node[p]
        tgt = node[parts[-1]][leaf] if isinstance(node[parts[-1]], dict) else node[parts[-1]]
        if tuple(tgt.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch for {path}/{leaf}: pct {tuple(tgt.shape)} vs torch {tuple(value.shape)}"
            )
        if isinstance(node[parts[-1]], dict):
            node[parts[-1]][leaf] = jnp.asarray(value, jnp.float32)
        else:
            node[parts[-1]] = jnp.asarray(value, jnp.float32)

    # conv / linear modules
    for pct_path, torch_prefix in nm.items():
        wkey, bkey = torch_prefix + ".weight", torch_prefix + ".bias"
        kkey = torch_prefix + ".kernel"  # MinkowskiConvolution parameter name
        if kkey in state_dict:
            put(pct_path, "w", _to_np(state_dict[kkey]))
            used.add(kkey)
        elif wkey in state_dict:
            w = _to_np(state_dict[wkey])
            if w.ndim == 2:  # torch Linear [out, in] -> [in, out]
                w = w.T
            put(pct_path, "w", w)
            used.add(wkey)
        if bkey in state_dict:
            put(pct_path, "b", _to_np(state_dict[bkey]))
            used.add(bkey)

    # scale_nn MLP (torch Sequential: 0.weight, 0.bias, 2.weight, 2.bias)
    for pct_leaf, tkey in [
        ("w0", "entropy_model.scale_nn.0.weight"),
        ("b0", "entropy_model.scale_nn.0.bias"),
        ("w1", "entropy_model.scale_nn.2.weight"),
        ("b1", "entropy_model.scale_nn.2.bias"),
    ]:
        if tkey in state_dict:
            v = _to_np(state_dict[tkey])
            if v.ndim == 2:
                v = v.T
            params["scale_nn"][pct_leaf] = jnp.asarray(v, jnp.float32)
            used.add(tkey)

    # factorized bottleneck (CompressAI EntropyBottleneck parameter names)
    eb = params["entropy_bottleneck"]
    k = 0
    while f"entropy_model.entropy_bottleneck._matrix{k}" in state_dict or (
        f"entropy_model.entropy_bottleneck.matrices.{k}" in state_dict
    ):
        for fmt, leaf in [
            ("entropy_model.entropy_bottleneck._matrix{k}", "matrix_{k}"),
            ("entropy_model.entropy_bottleneck.matrices.{k}", "matrix_{k}"),
            ("entropy_model.entropy_bottleneck._bias{k}", "bias_{k}"),
            ("entropy_model.entropy_bottleneck.biases.{k}", "bias_{k}"),
            ("entropy_model.entropy_bottleneck._factor{k}", "factor_{k}"),
            ("entropy_model.entropy_bottleneck.factors.{k}", "factor_{k}"),
        ]:
            tkey = fmt.format(k=k)
            lkey = leaf.format(k=k)
            if tkey in state_dict and lkey in eb:
                v = _to_np(state_dict[tkey])
                if tuple(eb[lkey].shape) == tuple(v.shape):
                    eb[lkey] = jnp.asarray(v, jnp.float32)
                    used.add(tkey)
        k += 1
    qkey = "entropy_model.entropy_bottleneck.quantiles"
    if qkey in state_dict:
        eb["quantiles"] = jnp.asarray(_to_np(state_dict[qkey]), jnp.float32)
        used.add(qkey)

    unmatched = [k for k in state_dict.keys() if k not in used]
    if strict and unmatched:
        raise ValueError(f"unmatched torch keys: {unmatched}")
    return params, unmatched


def load_torch_checkpoint(path: str, model: ColorModel, **kw) -> tuple[Params, list[str]]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_checkpoint(sd, model, **kw)
