"""Device meshes and shardings for multi-chip SPMD (jax.sharding / pjit).

The reference scales by processes + threads on single-GPU hosts (SURVEY.md
§2.5); the TPU-native analogs are:

- **dp** — frames (the training batch axis / a GOP's frames) sharded over
  chips; gradient psum rides ICI,
- **tp** — feature channels of conv weights sharded over chips (the
  gather-GEMM contracts over C_in, so sharding C_out keeps the matmuls local
  and all-gathers only at level boundaries).

``make_mesh`` factors the device count into a 2-axis ("dp", "tp") mesh;
``shard_params``/``shard_batch`` produce NamedShardings for the train step.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Sequence | None = None, dp: int | None = None, tp: int | None = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        # favor dp; tp gets the largest power-of-two factor <= 4
        tp = 1
        for cand in (4, 2):
            if n % cand == 0 and n // cand >= 1:
                tp = cand
                break
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def param_spec(path_leaf: str, shape: tuple[int, ...], tp_size: int) -> P:
    """Shard conv/dense weights' output-channel (last) dim over tp when it
    divides evenly; replicate everything else."""
    if len(shape) >= 2 and shape[-1] % tp_size == 0 and shape[-1] >= tp_size:
        return P(*([None] * (len(shape) - 1) + ["tp"]))
    return P()


def shard_params(mesh: Mesh, params):
    tp = mesh.shape["tp"]

    def spec(leaf):
        return NamedSharding(mesh, param_spec("", leaf.shape, tp))

    return jax.tree.map(lambda leaf: jax.device_put(leaf, spec(leaf)), params)


def shard_batch(mesh: Mesh, batch):
    """Shard the leading frame axis over dp."""

    def spec(leaf):
        return NamedSharding(mesh, P("dp", *([None] * (leaf.ndim - 1))))

    return jax.tree.map(lambda leaf: jax.device_put(leaf, spec(leaf)), batch)


def replicated(mesh: Mesh, tree):
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree
    )
