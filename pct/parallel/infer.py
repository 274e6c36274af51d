"""Multi-chip *inference*: a GOP's frames sharded over the ``dp`` mesh axis.

The serial encoder fuses a whole GOP into one batched block on one chip
(pct.pipeline.serial). For multi-chip encode the same math runs per frame
under ``vmap`` with the frame axis laid out over ``dp`` — valid because every
model op keys on the batch coordinate column, so kernel maps/joins never
cross frames, and the canonical batched order *is* frame-major order (batch
is the leading sort key). XLA partitions the vmapped graph along the frame
axis with zero collectives on the forward path; each chip encodes its local
frames and the host assembles the (frame-major) symbol planes, which are
bitstream-compatible with the single-chip encoder.

Wire/infra note: symbols entropy-code per frame-major concatenation exactly
like the fused encoder, so ``SerialEncoder.host_encode`` / the standard
decoder consume the result unchanged.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pct.models.unified import ColorModel, Params
from pct.pipeline.serial import PARAM_GRID, _caps_for, _static_truncate
from pct.sparse.block import SparseBlock, bucket_size, canonicalize


class ShardedFrameEncoder:
    """dp-sharded per-frame encode: ``encode(frames, settings) -> dev dict``
    with the same fields as ``SerialEncoder.device_encode``."""

    def __init__(self, model: ColorModel, params: Params, mesh: Mesh):
        self.model = model
        self.params = params
        self.mesh = mesh
        self.dp = mesh.shape["dp"]

    def __hash__(self):
        return hash((type(self).__name__, self.model.config, self.dp))

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and other.model.config == self.model.config
            and other.dp == self.dp
        )

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "level_caps", "cap_z", "nq"))
    def _encode_frames(self, params, coords, feats, mask, qs, level_caps, cap_z, nq):
        """[B, cap, ...] -> per-frame symbol planes (vmapped single-frame
        encode; with dp-sharded inputs XLA runs it SPMD over chips)."""
        m = self.model

        def one(coords, feats, mask):
            block = canonicalize(coords, feats, mask, dedup=True)
            y, ks = m.g_a(params, block, 1, level_caps)
            ny = y.count()
            z = m.h_a(params, y)
            nz = z.count()
            z = _static_truncate(z, cap_z)
            med = m.entropy_bottleneck.medians(params["entropy_bottleneck"])
            z_sym = jnp.round(z.feats - med[None, :])
            z_sym = jnp.where(z.mask[:, None], z_sym, 0)
            z_hat = z.with_feats(z_sym + med[None, :])
            scales, means = m.h_s(params, z_hat, y.coords, y.mask)
            scales = jnp.round(scales * PARAM_GRID) / PARAM_GRID
            means = jnp.round(means * PARAM_GRID) / PARAM_GRID
            scales = m.gaussian_conditional.lower_bound_scale(scales)
            syms, idxs = [], []
            for i in range(nq):
                gain = m.scale_nn(params, qs[i])
                sym = jnp.round(y.feats * gain[None, :] - means * gain[None, :])
                sym = jnp.where(y.mask[:, None], sym, 0)
                idx = m.gaussian_conditional.build_indexes(scales * gain[None, :])
                syms.append(sym.astype(jnp.int16))
                idxs.append(idx.astype(jnp.uint8))
            meta = jnp.concatenate([ks[:, 0], jnp.stack([ny, nz, block.count()])])
            return (
                meta.astype(jnp.int32),
                y.coords,
                y.mask,
                jnp.stack(syms),
                jnp.stack(idxs),
                z_sym.astype(jnp.int16),
                z.mask,
            )

        return jax.vmap(one)(coords, feats, mask)

    # ------------------------------------------------------------------
    def encode(self, frames: Sequence[dict], settings) -> dict:
        """Returns the ``SerialEncoder.device_encode`` dict (frame-major
        assembly), computed with frames sharded over the dp axis."""
        num_frames = len(frames)
        caps = [int(np.asarray(f["points"]).shape[0]) for f in frames]
        cap = bucket_size(max(caps))
        level_caps, cap_z = _caps_for(cap)
        b_pad = -(-num_frames // self.dp) * self.dp  # round up to dp multiple

        coords = np.zeros((b_pad, cap, 4), np.int32)
        feats = np.zeros((b_pad, cap, 4), np.float32)
        mask = np.zeros((b_pad, cap), bool)
        for b, fr in enumerate(frames):
            pts = np.asarray(fr["points"], np.int32)
            col = np.asarray(fr["colors"], np.float32)
            n = pts.shape[0]
            coords[b, :n, 1:] = pts
            feats[b, :n, 0] = 1.0
            feats[b, :n, 1:] = col
            mask[b, :n] = True

        shard = NamedSharding(self.mesh, P("dp"))
        rep = NamedSharding(self.mesh, P())
        qs = jax.device_put(np.asarray(settings, np.float32), rep)
        coords_d = jax.device_put(coords, shard)
        feats_d = jax.device_put(feats, shard)
        mask_d = jax.device_put(mask, shard)
        params = jax.tree.map(lambda a: jax.device_put(a, rep), self.params)

        meta, y_coords, y_mask, y_syms, y_idxs, z_syms, z_mask = jax.device_get(
            self._encode_frames(
                params, coords_d, feats_d, mask_d, qs, level_caps, cap_z, len(settings)
            )
        )
        L = self.model.config.num_levels
        overflow = any(
            int(meta[b, 1]) >= level_caps[0]  # stride-2 count vs cap[0]
            or int(meta[b, 0]) >= level_caps[1]  # stride-4 count vs cap[1]
            or int(meta[b, L]) >= level_caps[2]  # ny vs cap[2]
            or int(meta[b, L + 1]) >= cap_z
            for b in range(num_frames)
        )
        if overflow:  # rare: denser than the surface-ratio assumption
            meta, y_coords, y_mask, y_syms, y_idxs, z_syms, z_mask = jax.device_get(
                self._encode_frames(
                    params, coords_d, feats_d, mask_d, qs, (cap,) * L, cap, len(settings)
                )
            )

        # frame-major assembly == the fused encoder's batched canonical order
        ks = np.zeros((L, num_frames), np.int32)
        yc_parts, ys_parts, yi_parts, zs_parts = [], [], [], []
        tot_pts = 0
        for b in range(num_frames):
            ks[:, b] = meta[b, :L]
            ny_b, nz_b, np_b = int(meta[b, L]), int(meta[b, L + 1]), int(meta[b, L + 2])
            tot_pts += np_b
            yc = y_coords[b, :ny_b].copy()
            yc[:, 0] = b  # per-frame batch column 0 -> GOP frame index
            yc_parts.append(yc)
            ys_parts.append(y_syms[b, :, :ny_b])
            yi_parts.append(y_idxs[b, :, :ny_b])
            zs_parts.append(z_syms[b, :nz_b])
        return {
            "num_frames": num_frames,
            "num_points": tot_pts,
            "ks": ks,
            "ny": int(sum(p.shape[0] for p in yc_parts)),
            "nz": int(sum(p.shape[0] for p in zs_parts)),
            "y_coords": np.concatenate(yc_parts, axis=0),
            "y_syms": np.concatenate(ys_parts, axis=1),
            "y_idxs": np.concatenate(yi_parts, axis=1),
            "z_syms": np.concatenate(zs_parts, axis=0),
        }
