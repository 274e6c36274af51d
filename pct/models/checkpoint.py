"""Checkpoint save/load for the unified codec model.

Replaces the reference's torch checkpoint layout
(``unified/results/<name>/{config.yaml, weights.pt}`` loaded at reference
``codec_pipeline.py:56-72``) with a single msgpack file holding the config
dict and the parameter pytree. ``load`` rebuilds the model and, like the
reference's ``update()`` call, the entropy tables are rebuilt by the
pipelines at construction so encoder and decoder always agree.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import msgpack
import numpy as np

from pct.models.unified import ColorModel, Params, UnifiedConfig


def _to_plain(tree):
    return jax.tree.map(lambda a: np.asarray(a).tolist() if np.asarray(a).ndim == 0 else np.asarray(a), tree)


def _flatten(params) -> dict:
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            a = np.asarray(node)
            flat[prefix] = {"dtype": str(a.dtype), "shape": list(a.shape), "data": a.tobytes()}

    walk("", params)
    return flat


def _unflatten(flat: dict, to_jax: bool = True):
    out: dict = {}
    for key, spec in flat.items():
        a = np.frombuffer(spec["data"], dtype=spec["dtype"]).reshape(spec["shape"])
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(a) if to_jax else a
    return out


def save(path: str, model: ColorModel, params: Params, include_tables: bool = True) -> None:
    """Write config + params (+ the quantized entropy CDF tables by default,
    so encoder and decoder hosts share bit-identical coding tables instead of
    each re-deriving them through float paths)."""
    obj = {"config": model.config.to_dict(), "params": _flatten(params)}
    if include_tables:
        eb = model.entropy_bottleneck.update(params["entropy_bottleneck"])
        gc = model.gaussian_conditional.update()
        obj["tables"] = _flatten(
            {
                "eb": {"cdfs": eb.cdfs, "lengths": eb.lengths, "offsets": eb.offsets},
                "gc": {"cdfs": gc.cdfs, "lengths": gc.lengths, "offsets": gc.offsets},
            }
        )
    blob = msgpack.packb(obj, use_bin_type=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load(path: str) -> Tuple[ColorModel, Params]:
    model, params, _ = load_with_tables(path)
    return model, params


def _migrate(params):
    """Load-time migrations for older checkpoints: dense per-parent
    occupancy heads [C, 8] become 27-tap conv heads [27, C, 8] with the old
    weights in the center tap (identical function; see
    ``ColorModel.init_params``)."""
    g_s = params.get("g_s", {})
    for k, v in list(g_s.items()):
        if k.startswith("occ") and hasattr(v.get("w"), "ndim") and v["w"].ndim == 2:
            c, eight = v["w"].shape
            g_s[k] = {
                "w": jnp.zeros((27, c, eight), jnp.float32).at[13].set(v["w"]),
                "b": v["b"],
            }
    return params


def load_with_tables(path: str):
    """Returns ``(model, params, tables | None)`` where tables is a dict of
    :class:`pct.entropy.CdfTables` for keys ``eb`` and ``gc``."""
    from pct.entropy import CdfTables

    with open(path, "rb") as f:
        obj = msgpack.unpackb(f.read(), raw=False)
    model = ColorModel(UnifiedConfig.from_dict(obj["config"]))
    params = _migrate(_unflatten(obj["params"]))
    tables = None
    if "tables" in obj:
        t = _unflatten(obj["tables"], to_jax=False)
        tables = {
            "eb": CdfTables(t["eb"]["cdfs"], t["eb"]["lengths"], t["eb"]["offsets"]),
            "gc": CdfTables(t["gc"]["cdfs"], t["gc"]["lengths"], t["gc"]["offsets"]),
        }
    return model, params, tables
