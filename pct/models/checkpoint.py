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


def save(path: str, model: ColorModel, params: Params) -> None:
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            a = np.asarray(node)
            flat[prefix] = {"dtype": str(a.dtype), "shape": list(a.shape), "data": a.tobytes()}

    walk("", params)
    blob = msgpack.packb({"config": model.config.to_dict(), "params": flat}, use_bin_type=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load(path: str) -> Tuple[ColorModel, Params]:
    with open(path, "rb") as f:
        obj = msgpack.unpackb(f.read(), raw=False)
    model = ColorModel(UnifiedConfig.from_dict(obj["config"]))
    params: Params = {}
    for key, spec in obj["params"].items():
        a = np.frombuffer(spec["data"], dtype=spec["dtype"]).reshape(spec["shape"])
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(a)
    return model, params
