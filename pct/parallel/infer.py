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


def _dedup_frame(fr: dict) -> tuple[np.ndarray, np.ndarray]:
    """Per-frame point dedup (first occurrence wins), mirroring
    ``pct.pipeline.serial._frames_to_arrays``."""
    pts = np.asarray(fr["points"], np.int32)
    col = np.asarray(fr["colors"], np.float32)
    if pts.shape[0]:
        _, first = np.unique(pts, axis=0, return_index=True)
        first.sort()
        pts, col = pts[first], col[first]
    return pts, col


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
            s_codes = m.gaussian_conditional.quantize_scales(scales)
            means = jnp.round(means * PARAM_GRID) / PARAM_GRID
            syms, idxs = [], []
            for i in range(nq):
                gain = m.scale_nn(params, qs[i])
                g_codes = m.gaussian_conditional.quantize_gain(gain)
                sym = jnp.round(y.feats * gain[None, :] - means * gain[None, :])
                sym = jnp.where(y.mask[:, None], sym, 0)
                idx = m.gaussian_conditional.build_indexes_from_codes(
                    s_codes, g_codes[None, :]
                )
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
        assembly), computed with frames sharded over the dp axis.

        The static input capacity buckets the max PER-FRAME POST-DEDUP point
        count — exactly what :class:`ShardedFrameDecoder` reconstructs from
        the transmitted ks, so both sides run per-frame hyper synthesis
        under identical static shapes (the sharded analog of
        ``SerialDecoder.encoder_caps``)."""
        num_frames = len(frames)
        deduped = [_dedup_frame(f) for f in frames]
        cap = bucket_size(max(p.shape[0] for p, _ in deduped))
        level_caps, cap_z = _caps_for(cap)
        b_pad = -(-num_frames // self.dp) * self.dp  # round up to dp multiple

        coords = np.zeros((b_pad, cap, 4), np.int32)
        feats = np.zeros((b_pad, cap, 4), np.float32)
        mask = np.zeros((b_pad, cap), bool)
        for b, (pts, col) in enumerate(deduped):
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
        from pct.pipeline.serial import _device_step_fractions

        if overflow:
            level_caps, cap_z = (cap,) * L, cap
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
            # modeled E1/E2/E4 attribution, same contract as device_encode
            "step_fracs": _device_step_fractions(
                self.params, self.model.config, cap, level_caps, cap_z
            ),
        }


class ShardedFrameDecoder:
    """dp-sharded per-frame decode: ``decode(level) -> list[frame dict]``.

    The decode counterpart of :class:`ShardedFrameEncoder` — the north-star
    direction (BASELINE.md: >=30 fps vox10 *decode*): a GOP's frames are laid
    out over the ``dp`` mesh axis and each chip runs hyper-synthesis, index
    derivation, dequantization and the generative top-k synthesis for its
    local frames (reference decode steps D4-D6, ``codec_parallel.py:353-472``).
    Host rANS decodes stay fused over the GOP (the streams are frame-major).

    Static-shape contract: the per-frame input capacity is reconstructed
    from the transmitted ks exactly as the sharded encoder derived it
    (bucket of the max per-frame post-dedup count), so the per-frame hyper
    programs match the encoder's shape-for-shape; index parity then rests on
    the integerized code path (pct/entropy/gaussian.py).
    """

    def __init__(self, model: ColorModel, params: Params, mesh: Mesh, tables: dict | None = None):
        self.model = model
        self.params = params
        self.mesh = mesh
        self.dp = mesh.shape["dp"]
        self.eb_tables = (tables or {}).get("eb") or model.entropy_bottleneck.update(
            params["entropy_bottleneck"]
        )
        self.gc_tables = (tables or {}).get("gc") or model.gaussian_conditional.update()
        # binary-occupancy tables for uncalibrated (OC1) guided rungs:
        # checkpoint-independent, built once here instead of per decode
        # (ADVICE r4 — SerialDecoder already caches them at construction)
        self.bc_tables = model.binary_conditional.update()

    def __hash__(self):
        return hash((type(self).__name__, self.model.config, self.dp))

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and other.model.config == self.model.config
            and other.dp == self.dp
        )

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "cap_z"))
    def _indexes(self, params, y_coords, y_mask, z_syms, q, cap_z):
        """[B, ny_cap, ...] per-frame coords/z symbols -> per-frame
        (scales, means, idx); vmapped, dp-sharded over frames."""
        m = self.model
        from pct.pipeline.serial import PARAM_GRID

        def one(coords, mask, z_syms_f):
            cdim = m.config.latent_channels
            y = canonicalize(coords, jnp.zeros((coords.shape[0], cdim), jnp.float32), mask).with_stride(8)
            z = m.derive_z_coords(y)
            z = _static_truncate(z, cap_z)
            med = m.entropy_bottleneck.medians(params["entropy_bottleneck"])
            zf = jnp.zeros((z.capacity, med.shape[0]), jnp.float32)
            zf = zf.at[: z_syms_f.shape[0]].set(z_syms_f.astype(jnp.float32))
            zf = jnp.where(z.mask[:, None], zf + med[None, :], 0.0)
            z = SparseBlock(coords=z.coords, feats=zf, mask=z.mask, stride=z.stride)
            scales, means = m.h_s(params, z, y.coords, y.mask)
            s_codes = m.gaussian_conditional.quantize_scales(scales)
            scales = s_codes.astype(jnp.float32) / PARAM_GRID
            means = jnp.round(means * PARAM_GRID) / PARAM_GRID
            gain = m.scale_nn(params, q)
            g_codes = m.gaussian_conditional.quantize_gain(gain)
            idx = m.gaussian_conditional.build_indexes_from_codes(
                s_codes, g_codes[None, :]
            ).astype(jnp.uint8)
            return y.coords, y.mask, scales, means, idx

        return jax.vmap(one)(y_coords, y_mask, z_syms)

    @functools.partial(jax.jit, static_argnames=("self", "level_capacities"))
    def _synthesize(self, params, y_coords, y_mask, scales, means, y_syms, q, ks, level_capacities):
        """Per-frame dequant + generative top-k synthesis -> packed uint8
        buffers [B, ...] (coords int16 | colors u8 | mask u8)."""
        m = self.model

        def one(coords, mask, sc, mn, syms, ks_f):
            gain = m.scale_nn(params, q)
            sym = syms.astype(jnp.float32)
            if m.config.use_offsets:
                offs = m.get_offsets(sc * gain[None, :], jnp.abs(sym))
                mag = jnp.abs(sym) + jnp.where(sym == 0, 0.0, offs)
            else:
                mag = jnp.abs(sym)
            y_hat = jnp.sign(sym) * mag / gain[None, :] + mn
            y_hat = jnp.where(mask[:, None], y_hat, 0.0)
            y = SparseBlock(coords=coords, feats=y_hat, mask=mask, stride=8)
            rgb = m.g_s(params, y, ks_f[:, None], level_capacities)
            coords16 = rgb.coords.astype(jnp.int16)
            colors8 = jnp.clip(jnp.round(rgb.feats * 255.0), 0, 255).astype(jnp.uint8)
            return jnp.concatenate(
                [
                    jax.lax.bitcast_convert_type(coords16.reshape(-1), jnp.uint8).reshape(-1),
                    colors8.reshape(-1),
                    rgb.mask.astype(jnp.uint8),
                ]
            )

        return jax.vmap(one)(y_coords, y_mask, scales, means, y_syms, ks)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _synthesize_lossless(
        self, params, y_coords, y_mask, scales, means, y_syms, q,
        c4, m4, c2, m2, c1, m1,
    ):
        """Per-frame dequant + synthesis at the exact transmitted pyramid
        (the sharded analog of ``SerialDecoder._phase2_lossless``) -> uint8
        colors [B, cap1 * 3]."""
        m = self.model

        def one(coords, mask, sc, mn, syms, c4f, m4f, c2f, m2f, c1f, m1f):
            gain = m.scale_nn(params, q)
            sym = syms.astype(jnp.float32)
            if m.config.use_offsets:
                offs = m.get_offsets(sc * gain[None, :], jnp.abs(sym))
                mag = jnp.abs(sym) + jnp.where(sym == 0, 0.0, offs)
            else:
                mag = jnp.abs(sym)
            y_hat = jnp.sign(sym) * mag / gain[None, :] + mn
            y_hat = jnp.where(mask[:, None], y_hat, 0.0)
            y = SparseBlock(coords=coords, feats=y_hat, mask=mask, stride=8)
            rgb = m.g_s_at(params, y, [(c4f, m4f), (c2f, m2f), (c1f, m1f)])
            return jnp.clip(jnp.round(rgb.feats * 255.0), 0, 255).astype(jnp.uint8).reshape(-1)

        return jax.vmap(one)(y_coords, y_mask, scales, means, y_syms, c4, m4, c2, m2, c1, m1)

    def _decode_lossless(self, level) -> list[dict]:
        """Sharded decode of a lossless-geometry rung: each chip derives its
        local frames' coordinate pyramid colors via ``g_s_at`` (serial
        counterpart ``SerialDecoder._decompress_lossless``)."""
        from pct.gpcc import decode_points

        num_frames = level.num_frames
        pyr = []  # per frame: (s1, s2, s4, s8) canonical, batch col 0
        for g in level.gpcc_strings:
            pts = decode_points(g)
            s1 = np.concatenate([np.zeros((pts.shape[0], 1), np.int32), pts], axis=1)
            s1 = s1[np.lexsort((s1[:, 3], s1[:, 2], s1[:, 1], s1[:, 0]))]

            def down(c, f):
                d = c.copy()
                d[:, 1:] = (d[:, 1:] // f) * f
                return np.unique(d, axis=0)

            pyr.append((s1, down(s1, 2), down(s1, 4), down(s1, 8)))
        ks = np.asarray(level.ks, np.int32)  # [B, L]
        assert sum(p[0].shape[0] for p in pyr) == int(ks[:, 2].sum()), (
            "geometry/bitstream mismatch"
        )
        assert sum(p[3].shape[0] for p in pyr) == level.y_shape

        b_pad = -(-num_frames // self.dp) * self.dp
        caps = [bucket_size(max(p[i].shape[0] for p in pyr)) for i in range(4)]
        cap1, cap2, cap4, ny_cap = caps
        nz_counts = [np.unique(p[3][:, 1:] // 32, axis=0).shape[0] for p in pyr]
        cap_z = bucket_size(max(nz_counts))

        from pct.sparse.block import PAD_COORD

        pad_row = np.asarray(PAD_COORD, np.int32)

        def padded(idx, cap):
            c = np.tile(pad_row, (b_pad, cap, 1))
            m = np.zeros((b_pad, cap), bool)
            for b, p in enumerate(pyr):
                s = p[idx]
                c[b, : s.shape[0]] = s
                m[b, : s.shape[0]] = True
            return c, m

        c1, m1 = padded(0, cap1)
        c2, m2 = padded(1, cap2)
        c4, m4 = padded(2, cap4)
        y_coords = np.zeros((b_pad, ny_cap, 4), np.int32)
        y_mask = np.zeros((b_pad, ny_cap), bool)
        for b, p in enumerate(pyr):
            s8 = p[3]
            y_coords[b, : s8.shape[0]] = s8
            y_mask[b, : s8.shape[0]] = True

        # fused host z decode (frame-major stream) -> per-frame planes
        z_all = self.model.entropy_bottleneck.decompress_symbols(
            self.eb_tables, level.z_string, level.z_shape
        ).T.astype(np.int16)
        assert sum(nz_counts) == level.z_shape, "z geometry/bitstream mismatch"
        z_syms = np.zeros((b_pad, cap_z, z_all.shape[1]), np.int16)
        off = 0
        for b, nz_b in enumerate(nz_counts):
            z_syms[b, :nz_b] = z_all[off : off + nz_b]
            off += nz_b

        shard = NamedSharding(self.mesh, P("dp"))
        rep = NamedSharding(self.mesh, P())
        params = jax.tree.map(lambda a: jax.device_put(a, rep), self.params)
        q = jax.device_put(np.asarray([level.q_g, level.q_a], np.float32), rep)
        yc_d, ym_d, sc_d, mn_d, idx_d = self._indexes(
            params,
            jax.device_put(y_coords, shard),
            jax.device_put(y_mask, shard),
            jax.device_put(z_syms, shard),
            q,
            cap_z,
        )
        idx = np.asarray(jax.device_get(idx_d))

        ny_list = [p[3].shape[0] for p in pyr]
        idx_cat = np.concatenate(
            [idx[b, :n] for b, n in enumerate(ny_list)], axis=0
        ).astype(np.int32)
        syms_cat = self.model.gaussian_conditional.decompress(
            self.gc_tables, level.y_string, idx_cat
        ).astype(np.int16)
        y_syms = np.zeros((b_pad, ny_cap, syms_cat.shape[1]), np.int16)
        off = 0
        for b, n in enumerate(ny_list):
            y_syms[b, :n] = syms_cat[off : off + n]
            off += n

        colors = np.asarray(
            jax.device_get(
                self._synthesize_lossless(
                    params, yc_d, ym_d, sc_d, mn_d,
                    jax.device_put(y_syms, shard), q,
                    *(jax.device_put(a, shard) for a in (c4, m4, c2, m2, c1, m1)),
                )
            )
        ).reshape(b_pad, cap1, 3)
        col_parts = [
            colors[b, : p[0].shape[0]].astype(np.float32)
            for b, p in enumerate(pyr)
        ]
        if level.color_step > 0:
            # residuals are coded over the batched canonical order ==
            # frame-major concat of the per-frame canonical sets
            from pct.entropy import colorres

            cat = np.concatenate(col_parts, axis=0)
            res = colorres.decode_residuals(
                self.model.gaussian_conditional, self.gc_tables,
                level.color_string, level.color_scale_idx, cat.shape[0],
                level.color_step, level.color_transform,
            )
            cat = np.clip(np.round(cat + res), 0, 255)
            col_parts, off = [], 0
            for p in pyr:
                n = p[0].shape[0]
                col_parts.append(cat[off : off + n])
                off += n
        return [
            {
                "points": p[0][:, 1:].astype(np.int32),
                "colors": np.clip(c / 255.0, 0.0, 1.0),
            }
            for p, c in zip(pyr, col_parts)
        ]

    # ------------------------------------------------------------------
    def _phase1_frames(self, level):
        """Shared dp-sharded phase 1 for latent-layout rungs (latent and
        guided): per-frame gpcc y-sets padded to encoder-mirrored static
        caps, fused host z/y entropy decode split back into per-frame
        planes, device-side (scales, means)."""
        from pct.gpcc import decode_points

        num_frames = level.num_frames
        ks = np.asarray(level.ks, np.int32)  # [B, L] coarse->fine
        L = ks.shape[1]

        # mirror the sharded encoder's static shapes from the bitstream
        cap = bucket_size(int(ks[:, -1].max()))
        level_caps, cap_z = _caps_for(cap)
        y_sets, nz_counts = [], []
        for g in level.gpcc_strings:
            pts = decode_points(g) * 8
            y_sets.append(pts)
            nz_counts.append(np.unique(pts // 32, axis=0).shape[0])
        overflow = any(
            int(ks[b, 1]) >= level_caps[0]
            or int(ks[b, 0]) >= level_caps[1]
            or y_sets[b].shape[0] >= level_caps[2]
            or nz_counts[b] >= cap_z
            for b in range(num_frames)
        )
        if overflow:
            level_caps, cap_z = (cap,) * L, cap
        ny_cap = level_caps[-1]

        b_pad = -(-num_frames // self.dp) * self.dp
        y_coords = np.zeros((b_pad, ny_cap, 4), np.int32)
        y_mask = np.zeros((b_pad, ny_cap), bool)
        for b, pts in enumerate(y_sets):
            n = pts.shape[0]
            y_coords[b, :n, 1:] = pts
            y_mask[b, :n] = True

        # fused host z decode (frame-major stream) -> per-frame planes
        nz_total = level.z_shape
        z_all = self.model.entropy_bottleneck.decompress_symbols(
            self.eb_tables, level.z_string, nz_total
        ).T.astype(np.int16)  # [nz_total, Cz]
        assert sum(nz_counts) == nz_total, "z geometry/bitstream mismatch"
        z_syms = np.zeros((b_pad, cap_z, z_all.shape[1]), np.int16)
        off = 0
        for b, nz_b in enumerate(nz_counts):
            z_syms[b, :nz_b] = z_all[off : off + nz_b]
            off += nz_b

        shard = NamedSharding(self.mesh, P("dp"))
        rep = NamedSharding(self.mesh, P())
        params = jax.tree.map(lambda a: jax.device_put(a, rep), self.params)
        q = jax.device_put(np.asarray([level.q_g, level.q_a], np.float32), rep)
        yc_d, ym_d, sc_d, mn_d, idx_d = self._indexes(
            params,
            jax.device_put(y_coords, shard),
            jax.device_put(y_mask, shard),
            jax.device_put(z_syms, shard),
            q,
            cap_z,
        )
        idx = np.asarray(jax.device_get(idx_d))

        # fused host y decode (frame-major stream) -> per-frame symbol planes
        ny_list = [p.shape[0] for p in y_sets]
        idx_cat = np.concatenate(
            [idx[b, :n] for b, n in enumerate(ny_list)], axis=0
        ).astype(np.int32)
        syms_cat = self.model.gaussian_conditional.decompress(
            self.gc_tables, level.y_string, idx_cat
        ).astype(np.int16)
        y_syms = np.zeros((b_pad, ny_cap, syms_cat.shape[1]), np.int16)
        off = 0
        for b, n in enumerate(ny_list):
            y_syms[b, :n] = syms_cat[off : off + n]
            off += n

        return (
            params, q, shard, yc_d, ym_d, sc_d, mn_d, y_syms, ny_list,
            b_pad, ny_cap,
        )

    # ------------------------------------------------------------------
    # guided-occupancy rungs: the per-level device stages vmap the SAME
    # core functions the serial decoder jits (pct.pipeline.serial.
    # _guided_head_core/_guided_step_core — the logits are parity-critical
    # coding inputs), frames laid out over dp; between levels the host
    # rANS-decodes each level's occupancy stream over the frame-major
    # concatenation of the per-frame logit bins (== the fused encoder's
    # batched canonical symbol order, batch is the leading sort key).
    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self",))
    def _guided_head_frames(self, params, y_coords, y_mask, scales, means, y_syms, q):
        from pct.pipeline.serial import _guided_head_core

        def one(c, m_, sc, mn, sy):
            blk = SparseBlock(
                coords=c,
                feats=jnp.zeros((c.shape[0], sy.shape[1]), jnp.float32),
                mask=m_,
                stride=8,
            )
            return _guided_head_core(self.model, params, blk, sc, mn, sy, q)

        return jax.vmap(one)(y_coords, y_mask, scales, means, y_syms)

    @functools.partial(
        jax.jit, static_argnames=("self", "cap_next", "level", "stride")
    )
    def _guided_step_frames(
        self, params, p_coords, p_feats, p_mask, p_kidx, p_kfound,
        cand_coords, cand_mask, bits, cap_next, level, stride,
    ):
        from pct.pipeline.serial import _guided_step_core

        def one(pc, pf, pm, pki, pkf, cc, cm, b):
            return _guided_step_core(
                self.model, params, pc, pf, pm, pki, pkf, cc, cm, b,
                cap_next, level, stride,
            )

        return jax.vmap(one)(
            p_coords, p_feats, p_mask, p_kidx, p_kfound,
            cand_coords, cand_mask, bits,
        )

    @functools.partial(
        jax.jit, static_argnames=("self", "cap_next", "level", "stride")
    )
    def _guided_step_fam_frames(
        self, params, x_coords, x_feats, x_mask, xk_idx, xk_found,
        cand_coords, cand_mask, bits, cap_next, level, stride,
    ):
        """OC3 per-frame guided step (vmaps the serial decoder's
        ``_guided_step_fam_core`` — single-trace parity, like the legacy
        wrapper above). The OC3 enumeration (candidate-index order) is
        frame-major in the batched pyramid because compaction preserves
        candidate order and level-0 parents are batch-leading canonical, so
        per-frame streams stay contiguous slices of the serial stream."""
        from pct.pipeline.serial import _guided_step_fam_core

        def one(xc, xf, xm, xki, xkf, cc, cm, b):
            return _guided_step_fam_core(
                self.model, params, xc, xf, xm, xki, xkf, cc, cm, b,
                cap_next, level, stride,
            )

        return jax.vmap(one)(
            x_coords, x_feats, x_mask, xk_idx, xk_found,
            cand_coords, cand_mask, bits,
        )

    def _decode_guided(self, level) -> list[dict]:
        """Sharded decode of a guided-occupancy rung (serial counterpart
        ``SerialDecoder._decompress_guided``)."""
        from pct.pipeline.serial import _synth_caps

        num_frames = level.num_frames
        ks = np.asarray(level.ks, np.int32)  # [B, L] coarse->fine
        L = ks.shape[1]
        assert len(level.occ_strings) == L, "missing occupancy streams"

        (params, q, shard, yc_d, ym_d, sc_d, mn_d, y_syms, ny_list, b_pad,
         ny_cap) = self._phase1_frames(level)

        # one static cap tuple for all frames: _synth_caps of the per-frame
        # maxima (monotone in the per-frame counts, so it dominates every
        # frame's own cap)
        caps = _synth_caps(self.model, ks.max(axis=0)[:, None])
        bc = self.model.binary_conditional
        bc_tables = self.bc_tables
        family = level.occ_family

        out = self._guided_head_frames(
            params, yc_d, ym_d, sc_d, mn_d, jax.device_put(y_syms, shard), q
        )
        y_hat_d, cand_c, cand_m, bins_d, pki, pkf = out
        p_c, p_f, p_m = yc_d, y_hat_d, ym_d
        n_parent_list = ny_list
        stride = 8
        for lvl in range(L):
            # host: rANS-decode this level's stream over the frame-major
            # concatenation of each frame's valid logit bins (parents are
            # compacted at the front of every per-frame block)
            bins = np.asarray(jax.device_get(bins_d))
            idx_cat = np.concatenate(
                [bins[b, : 8 * n] for b, n in enumerate(n_parent_list)]
            )
            if level.occ_calibrated:
                syms = bc.decompress_calibrated(level.occ_strings[lvl], idx_cat)
            else:  # OC1: static bin-center tables (pre-round-4 media)
                syms = bc.decompress(bc_tables, level.occ_strings[lvl], idx_cat)
            bits = np.zeros((b_pad, int(cand_m.shape[1])), bool)
            off = 0
            for b, n in enumerate(n_parent_list):
                bits[b, : 8 * n] = syms[off : off + 8 * n].astype(bool)
                off += 8 * n
            step = self._guided_step_fam_frames if family else self._guided_step_frames
            out = step(
                params, p_c, p_f, p_m, pki, pkf, cand_c, cand_m,
                jax.device_put(bits, shard), caps[lvl], lvl, stride,
            )
            if lvl == L - 1:
                bufs = np.asarray(jax.device_get(out))
                break
            p_c, p_f, p_m, pki, pkf, cand_c, cand_m, bins_d = (
                out if family
                else (out[0], out[1], out[2], out[6], out[7], out[3], out[4], out[5])
            )
            n_parent_list = [int(ks[b, lvl]) for b in range(num_frames)]
            stride //= 2

        cap_out = caps[-1]
        frames = []
        for b in range(num_frames):
            buf = bufs[b]
            coords16 = buf[: cap_out * 8].view(np.int16).reshape(cap_out, 4)
            colors8 = buf[cap_out * 8 : cap_out * 11].reshape(cap_out, 3)
            m = buf[cap_out * 11 :].astype(bool)
            frames.append(
                {
                    "points": coords16[m][:, 1:].astype(np.int32),
                    "colors": colors8[m].astype(np.float32),
                }
            )
        if level.color_step > 0:
            # CR tail: batched canonical order == frame-major concat of the
            # per-frame canonical buffers
            from pct.entropy import colorres

            cat = np.concatenate([f["colors"] for f in frames], axis=0)
            res = colorres.decode_residuals(
                self.model.gaussian_conditional, self.gc_tables,
                level.color_string, level.color_scale_idx, cat.shape[0],
                level.color_step, level.color_transform,
            )
            cat = np.clip(np.round(cat + res), 0, 255)
            off = 0
            for f in frames:
                n = f["colors"].shape[0]
                f["colors"] = cat[off : off + n]
                off += n
        for f in frames:
            f["colors"] = np.clip(f["colors"] / 255.0, 0.0, 1.0)
        return frames

    # ------------------------------------------------------------------
    def decode(self, level) -> list[dict]:
        """Decode one representation's bitstream with frames over dp."""
        from pct.entropy.bitstream import SegmentBitstream
        from pct.gpcc import decode_points

        if isinstance(level, (bytes, bytearray)):
            level = SegmentBitstream.unpack(bytes(level))
        if level.geometry_mode == "lossless":
            return self._decode_lossless(level)
        if level.geometry_mode == "guided":
            return self._decode_guided(level)
        num_frames = level.num_frames
        ks = np.asarray(level.ks, np.int32)  # [B, L] coarse->fine
        L = ks.shape[1]

        (params, q, shard, yc_d, ym_d, sc_d, mn_d, y_syms, ny_list, b_pad,
         ny_cap) = self._phase1_frames(level)

        ks_pad = np.zeros((b_pad, L), np.int32)
        ks_pad[:num_frames] = ks
        kf = self.model.config.keep_factors
        caps_s = tuple(
            int(bucket_size(int(np.ceil(float(ks[:, l].max()) * (kf[l] if l < L - 1 else 1.0)))))
            for l in range(L)
        )
        bufs = np.asarray(
            jax.device_get(
                self._synthesize(
                    params,
                    yc_d,
                    ym_d,
                    sc_d,
                    mn_d,
                    jax.device_put(y_syms, shard),
                    q,
                    jax.device_put(ks_pad, shard),
                    caps_s,
                )
            )
        )
        cap_out = caps_s[-1]
        frames = []
        for b in range(num_frames):
            buf = bufs[b]
            coords16 = buf[: cap_out * 8].view(np.int16).reshape(cap_out, 4)
            colors8 = buf[cap_out * 8 : cap_out * 11].reshape(cap_out, 3)
            m = buf[cap_out * 11 :].astype(bool)
            frames.append(
                {
                    "points": coords16[m][:, 1:].astype(np.int32),
                    "colors": colors8[m].astype(np.float32),
                }
            )
        if level.color_step > 0:
            # CR tail: batched canonical order == frame-major concat of the
            # per-frame canonical buffers
            from pct.entropy import colorres

            cat = np.concatenate([f["colors"] for f in frames], axis=0)
            res = colorres.decode_residuals(
                self.model.gaussian_conditional, self.gc_tables,
                level.color_string, level.color_scale_idx, cat.shape[0],
                level.color_step, level.color_transform,
            )
            cat = np.clip(np.round(cat + res), 0, 255)
            off = 0
            for f in frames:
                n = f["colors"].shape[0]
                f["colors"] = cat[off : off + n]
                off += n
        for f in frames:
            f["colors"] = np.clip(f["colors"] / 255.0, 0.0, 1.0)
        return frames
