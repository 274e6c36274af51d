"""Optax training step for the unified codec, vmapped over frames.

The leading frame axis is the data-parallel axis; with inputs sharded over a
``jax.sharding.Mesh`` (pct.parallel) the jitted step runs SPMD and XLA
inserts the gradient ``psum`` over ICI.
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import optax

from pct.models.unified import ColorModel, Params
from pct.sparse.block import SparseBlock
from pct.train.losses import frame_rd_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    aux_weight: float = 1e-3
    lambda_g: float = 1.0
    lambda_a: float = 6.5
    # >1 turns distortion weights into exponential schedules over q
    # (w = lambda * ratio**(q-1)); 1.0 keeps the legacy linear weighting.
    g_ratio: float = 1.0
    a_ratio: float = 1.0
    grad_clip: float = 0.0  # 0 disables
    # decode-matched distortion path (hard rounding, straight-through grads)
    ste: bool = False
    # weight (relative to w_a) of the teacher-forced color loss at the true
    # coordinate pyramid (v1 arch only — g_s_at); 0 disables
    tf_color: float = 0.0
    # per-synthesis-level occupancy-BCE weights, coarse -> fine: hit rate is
    # the product of per-level recalls and the measured loss concentrates at
    # the finest level — boost its share to train the latent-rung hit rate
    occ_level_weights: tuple = (1.0, 1.0, 1.0)


def trainable_mask(params: Params, pattern: str):
    """Bool pytree matching ``params``: True where the parameter's slash
    -joined path matches ``pattern`` (regex search). Feed to
    ``optax.masked`` to freeze everything else — e.g. ``pattern='refine'``
    trains only the grafted two-stage-selection heads, which by
    construction cannot move the coded rate (the wire bytes depend only on
    the frozen analysis/hyper path)."""
    import re

    rx = re.compile(pattern)

    def path_str(path):
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )

    return jax.tree_util.tree_map_with_path(
        lambda path, _: bool(rx.search(path_str(path))), params
    )


def make_optimizer(cfg: TrainConfig, params: Params | None = None, trainable_re: str = ""):
    opt = optax.adam(cfg.learning_rate)
    if cfg.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    if trainable_re:
        assert params is not None, "trainable_re needs params to build the mask"
        # optax.masked applies the inner transform to masked leaves and
        # passes the REST THROUGH UNCHANGED — freezing needs the frozen
        # leaves' updates zeroed first
        frozen = jax.tree.map(
            lambda b: not b, trainable_mask(params, trainable_re)
        )
        opt = optax.chain(optax.masked(optax.set_to_zero(), frozen), opt)
    return opt


def batch_rd_loss(model: ColorModel, cfg: TrainConfig, params: Params, batch: SparseBlock, qs: jax.Array, keys: jax.Array):
    """batch: SparseBlock with leading frame axis [B, N, ...]; qs [B, 2]."""
    losses, metrics = jax.vmap(
        lambda blk, q, k: frame_rd_loss(
            model, params, blk, q, k, cfg.lambda_g, cfg.lambda_a, cfg.g_ratio,
            cfg.a_ratio, cfg.ste, cfg.tf_color, cfg.occ_level_weights,
        )
    )(batch, qs, keys)
    loss = jnp.mean(losses) + cfg.aux_weight * model.entropy_bottleneck.aux_loss(
        params["entropy_bottleneck"]
    )
    return loss, jax.tree.map(jnp.mean, metrics)


def make_train_step(model: ColorModel, cfg: TrainConfig, optimizer):
    """Returns ``step(params, opt_state, batch, qs, key) -> (params, opt_state,
    loss, metrics)`` — jit/pjit this with sharded inputs for multi-chip."""

    def step(params, opt_state, batch: SparseBlock, qs, key):
        b = qs.shape[0]
        keys = jax.random.split(key, b)
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: batch_rd_loss(model, cfg, p, batch, qs, keys), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    return step


def arrays_to_training_batch(coords, feats, mask) -> SparseBlock:
    """Wrap pre-canonicalized per-frame arrays (``pct.train.data.FrameDataset``)
    into the leading-axis training block without re-sorting: the cache stores
    frames already in canonical order with padding at the tail."""
    import jax.numpy as jnp

    return SparseBlock(
        coords=jnp.asarray(coords),
        feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
        stride=1,
    )


def frames_to_training_batch(frames, capacity: int) -> SparseBlock:
    """Per-frame fixed-capacity blocks stacked on a leading axis (batch column
    zero in every frame — the frame index lives in the leading axis)."""
    import numpy as np
    from pct.sparse.block import canonicalize

    coords, feats, masks = [], [], []
    for fr in frames:
        pts = np.asarray(fr["points"], np.int32)[:capacity]
        col = np.asarray(fr["colors"], np.float32)[:capacity]
        n = pts.shape[0]
        pad = capacity - n
        c = np.concatenate([np.zeros((n, 1), np.int32), pts], axis=1)
        f = np.concatenate([np.ones((n, 1), np.float32), col], axis=1)
        c = np.concatenate([c, np.zeros((pad, 4), np.int32)], axis=0)
        f = np.concatenate([f, np.zeros((pad, 4), np.float32)], axis=0)
        m = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        blk = canonicalize(jnp.asarray(c), jnp.asarray(f), jnp.asarray(m), dedup=True)
        coords.append(blk.coords)
        feats.append(blk.feats)
        masks.append(blk.mask)
    return SparseBlock(
        coords=jnp.stack(coords),
        feats=jnp.stack(feats),
        mask=jnp.stack(masks),
        stride=1,
    )
