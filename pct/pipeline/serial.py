"""Serial encode/decode pipelines — the end-to-end codec slice.

TPU-native counterpart of the reference's serial codecs
(``sender/encoder/codec_single.py`` steps E1-E7 and
``receiver/decoder/codec_single.py`` steps D1-D6): neural transforms run as
jitted JAX stages on padded canonical blocks; entropy coding (rANS) and
octree geometry coding run host-side on the valid row prefixes. Per-step
wall-times are recorded with the reference's E*/D* naming so the telemetry
and evaluation pipelines line up (SURVEY.md §5).

Encode (per GOP / segment, all frames batched along the coordinate batch
column, every quality level coded from one shared analysis pass — the
reference's multi-rate batching, ``codec_pipeline.py:397-437``):

  E1 analysis g_a -> y, k counts     E2 hyper-analysis h_a -> z
  E3 factorized bottleneck (z)       E4 hyper-synthesis h_s -> (scales, means)
  E5 Gaussian conditional (y, per q) E6 octree geometry coding (y coords / 8)
  E7 bitstream assembly

Decode mirrors: D1 bitstream read, D2 geometry decode, D3 factorized decode,
D4 hyper-synthesis, D5 Gaussian decode + offset dequantization, D6 synthesis
g_s with per-frame top-k pruning.

Determinism note: decode correctness requires encoder and decoder to agree on
the Gaussian (scale, mean) parameters bit-wise. Both sides round them onto a
1/256 grid inside the jitted hyper-synthesis stage to suppress cross-backend
float drift; exact parity is guaranteed when both sides run the same backend
(as in the reference, which pins deterministic CUDA for the same reason —
``codec_pipeline.py:16-18``).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pct.entropy.bitstream import SegmentBitstream, pack_segment, unpack_segment
from pct.gpcc import decode_points, encode_points
from pct.models.unified import ColorModel, Params
from pct.sparse.block import SparseBlock, bucket_size, canonicalize, truncate_capacity
from pct.sparse import coords as coords_lib

PARAM_GRID = 256.0  # (scale, mean) quantization grid, see module docstring


def frames_to_block(frames: Sequence[dict], capacity: int | None = None) -> SparseBlock:
    """Stack per-frame ``{"points": int [N,3], "colors": float [N,3]}`` dicts
    into one batched canonical block with features ``[1, R, G, B]``
    (constant-1 channel as in reference ``codec_pipeline.py:258``)."""
    coords, feats = [], []
    for b, fr in enumerate(frames):
        pts = np.asarray(fr["points"], np.int32)
        col = np.asarray(fr["colors"], np.float32)
        n = pts.shape[0]
        coords.append(np.concatenate([np.full((n, 1), b, np.int32), pts], axis=1))
        feats.append(np.concatenate([np.ones((n, 1), np.float32), col], axis=1))
    coords = np.concatenate(coords, axis=0)
    feats = np.concatenate(feats, axis=0)
    cap = capacity or bucket_size(coords.shape[0])
    pad = cap - coords.shape[0]
    mask = np.concatenate([np.ones(coords.shape[0], bool), np.zeros(pad, bool)])
    coords = np.concatenate([coords, np.zeros((pad, 4), np.int32)], axis=0)
    feats = np.concatenate([feats, np.zeros((pad, feats.shape[1]), np.float32)], axis=0)
    return canonicalize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(mask), dedup=True)


def block_to_frames(block: SparseBlock, num_frames: int) -> list[dict]:
    """Split a decoded stride-1 block back into per-frame point/color dicts
    (reference ``get_points_per_batch``/``pack_batches``)."""
    coords = np.asarray(block.coords)
    feats = np.asarray(block.feats)
    mask = np.asarray(block.mask)
    out = []
    for b in range(num_frames):
        sel = mask & (coords[:, 0] == b)
        out.append(
            {
                "points": coords[sel][:, 1:].copy(),
                "colors": np.clip(feats[sel], 0.0, 1.0),
            }
        )
    return out


class SerialEncoder:
    """compress(frames, settings) -> (compressed_data, sideinfo) — the
    ``CompressionPipeline.compress`` surface (reference ``codec_single.py:47``)."""

    def __init__(self, model: ColorModel, params: Params, tables: dict | None = None):
        self.model = model
        self.params = params
        # prefer checkpoint-shipped tables (bit-identical across hosts);
        # rebuild locally otherwise (the reference's update()-at-load analog)
        self.eb_tables = (tables or {}).get("eb") or model.entropy_bottleneck.update(
            params["entropy_bottleneck"]
        )
        self.gc_tables = (tables or {}).get("gc") or model.gaussian_conditional.update()

    @functools.partial(jax.jit, static_argnames=("self", "num_frames"))
    def _analysis(self, params, block, num_frames):
        return self.model.g_a(params, block, num_frames)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _hyper_analysis(self, params, y_block):
        return self.model.h_a(params, y_block)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _hyper_synthesis(self, params, z_block, y_coords, y_mask):
        scales, means = self.model.h_s(params, z_block, y_coords, y_mask)
        scales = jnp.round(scales * PARAM_GRID) / PARAM_GRID
        means = jnp.round(means * PARAM_GRID) / PARAM_GRID
        scales = self.model.gaussian_conditional.lower_bound_scale(scales)
        return scales, means

    @functools.partial(jax.jit, static_argnames=("self",))
    def _gain(self, params, q):
        return self.model.scale_nn(params, q)

    def compress(self, frames: Sequence[dict], settings: Sequence[Sequence[float]]):
        """Returns ``(levels: list[SegmentBitstream], sideinfo: dict)``."""
        t_codec_start = time.time()
        num_frames = len(frames)
        block = frames_to_block(frames)

        # E1 analysis; capacities are re-tightened between stages so the hyper
        # path never pays for stride-1 padding (host sync per stage, like the
        # reference's torch.cuda.synchronize step boundaries)
        t0 = time.time()
        y, ks = self._analysis(self.params, block, num_frames)
        ks_np = np.asarray(ks)  # [L, B]
        ny = int(y.count())
        y = truncate_capacity(y, bucket_size(ny))
        t_analysis = time.time() - t0

        # E2 hyper analysis
        t0 = time.time()
        z = self._hyper_analysis(self.params, y)
        nz = int(z.count())
        z = truncate_capacity(z, bucket_size(nz))
        t_hyper_analysis = time.time() - t0

        # E3 factorized bottleneck round-trip (encoder must see the decoder's z_hat)
        t0 = time.time()
        z_feats = np.asarray(z.feats)[:nz].T  # [C, nz]
        eb = self.model.entropy_bottleneck
        z_string = eb.compress(self.params["entropy_bottleneck"], self.eb_tables, z_feats)
        z_hat = eb.decompress(self.params["entropy_bottleneck"], self.eb_tables, z_string, nz)
        t_factorized = time.time() - t0

        # E4 hyper synthesis at y coords
        t0 = time.time()
        z_hat_feats = jnp.zeros_like(z.feats).at[:nz].set(jnp.asarray(z_hat.T))
        z_hat_block = z.with_feats(z_hat_feats)
        scales, means = self._hyper_synthesis(self.params, z_hat_block, y.coords, y.mask)
        jax.block_until_ready(scales)
        t_hyper_synthesis = time.time() - t0

        # E6 geometry: per-frame stride-8 latent coords / 8 (reference
        # shared/utils.py:178 contract)
        t0 = time.time()
        y_coords_np = np.asarray(y.coords)[:ny]
        gpcc_strings = []
        for b in range(num_frames):
            pts = y_coords_np[y_coords_np[:, 0] == b][:, 1:] // 8
            gpcc_strings.append(encode_points(pts))
        t_geometry = time.time() - t0

        # E5 Gaussian conditional per quality level (multi-rate from one pass)
        y_feats = np.asarray(y.feats)[:ny]
        scales_np = np.asarray(scales)[:ny]
        means_np = np.asarray(means)[:ny]
        gc = self.model.gaussian_conditional
        levels, t_gaussian, t_bitstream = [], 0.0, 0.0
        for q in settings:
            t0 = time.time()
            gain = np.asarray(self._gain(self.params, jnp.asarray(q, jnp.float32)))
            idx = np.asarray(gc.build_indexes(jnp.asarray(scales_np * gain)))
            y_string = gc.compress(
                self.gc_tables, y_feats * gain, idx, means_np * gain
            )
            t_gaussian += time.time() - t0
            t0 = time.time()
            levels.append(
                SegmentBitstream(
                    q_g=float(q[0]),
                    q_a=float(q[1]),
                    y_shape=ny,
                    z_shape=nz,
                    y_string=y_string,
                    z_string=z_string,
                    gpcc_strings=gpcc_strings,
                    ks=[tuple(int(ks_np[l, b]) for l in range(ks_np.shape[0])) for b in range(num_frames)],
                )
            )
            t_bitstream += time.time() - t0

        num_points = int(block.count())
        total_bytes = sum(lv.num_bytes() for lv in levels)
        sideinfo = {
            "num_points": num_points,
            "gop_info": {
                "bpp": total_bytes * 8 / max(num_points, 1) / max(len(settings), 1),
                "num_frames": num_frames,
            },
            "time_measurements": {
                "analysis": t_analysis,
                "hyper_analysis": t_hyper_analysis,
                "factorized_model": t_factorized,
                "hyper_synthesis": t_hyper_synthesis,
                "gaussian_model": t_gaussian,
                "geometry_compression": t_geometry,
                "bitstream_writing": t_bitstream,
            },
            "timestamps": {"codec_start": t_codec_start, "codec_end": time.time()},
        }
        return levels, sideinfo

    def compress_bytes(self, frames, settings):
        levels, sideinfo = self.compress(frames, settings)
        return pack_segment(levels), sideinfo


class SerialDecoder:
    """decompress(data) -> (frames, sideinfo) — the
    ``DecompressionPipeline.decompress`` surface (reference
    ``receiver/decoder/codec_single.py:44``)."""

    def __init__(self, model: ColorModel, params: Params, tables: dict | None = None):
        self.model = model
        self.params = params
        self.eb_tables = (tables or {}).get("eb") or model.entropy_bottleneck.update(
            params["entropy_bottleneck"]
        )
        self.gc_tables = (tables or {}).get("gc") or model.gaussian_conditional.update()

    @functools.partial(jax.jit, static_argnames=("self",))
    def _derive_z(self, y_block):
        return self.model.derive_z_coords(y_block)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _hyper_synthesis(self, params, z_block, y_coords, y_mask):
        scales, means = self.model.h_s(params, z_block, y_coords, y_mask)
        scales = jnp.round(scales * PARAM_GRID) / PARAM_GRID
        means = jnp.round(means * PARAM_GRID) / PARAM_GRID
        scales = self.model.gaussian_conditional.lower_bound_scale(scales)
        return scales, means

    @functools.partial(jax.jit, static_argnames=("self",))
    def _gain(self, params, q):
        return self.model.scale_nn(params, q)

    @functools.partial(jax.jit, static_argnames=("self", "level_capacities"))
    def _synthesis(self, params, y_block, ks, level_capacities):
        return self.model.g_s(params, y_block, ks, level_capacities)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _dequant(self, symbols, scales, means, gain):
        offs = self.model.get_offsets(scales * gain)
        mag = jnp.abs(symbols) + jnp.where(symbols == 0, 0.0, offs)
        return jnp.sign(symbols) * mag / gain + means

    def decompress(self, level: SegmentBitstream | bytes):
        t_codec_start = time.time()
        t0 = time.time()
        if isinstance(level, (bytes, bytearray)):
            # one representation blob, as stored per ID{q} segment file
            level = SegmentBitstream.unpack(bytes(level))
        t_read = time.time() - t0
        num_frames = level.num_frames

        # D2 geometry decode -> batched canonical y coords
        t0 = time.time()
        coords = []
        for b, g in enumerate(level.gpcc_strings):
            pts = decode_points(g) * 8
            coords.append(
                np.concatenate([np.full((pts.shape[0], 1), b, np.int32), pts], axis=1)
            )
        coords = np.concatenate(coords, axis=0)
        assert coords.shape[0] == level.y_shape, "geometry/bitstream mismatch"
        cap = bucket_size(coords.shape[0])
        pad = cap - coords.shape[0]
        mask = np.concatenate([np.ones(coords.shape[0], bool), np.zeros(pad, bool)])
        coords = np.concatenate([coords, np.zeros((pad, 4), np.int32)], axis=0)
        cdim = self.model.config.latent_channels
        y_block = canonicalize(
            jnp.asarray(coords), jnp.zeros((cap, cdim), jnp.float32), jnp.asarray(mask)
        ).with_stride(8)
        t_geometry = time.time() - t0

        # D3 factorized decode on derived z coords
        t0 = time.time()
        z_block = self._derive_z(y_block)
        nz = int(z_block.count())
        assert nz == level.z_shape, f"z count mismatch: {nz} != {level.z_shape}"
        z_block = truncate_capacity(z_block, bucket_size(nz))
        eb = self.model.entropy_bottleneck
        z_hat = eb.decompress(self.params["entropy_bottleneck"], self.eb_tables, level.z_string, nz)
        z_feats = jnp.zeros((z_block.capacity, z_hat.shape[0]), jnp.float32).at[:nz].set(
            jnp.asarray(z_hat.T)
        )
        z_block = SparseBlock(
            coords=z_block.coords, feats=z_feats, mask=z_block.mask, stride=z_block.stride
        )
        t_factorized = time.time() - t0

        # D4 hyper synthesis
        t0 = time.time()
        scales, means = self._hyper_synthesis(self.params, z_block, y_block.coords, y_block.mask)
        jax.block_until_ready(scales)
        t_hyper = time.time() - t0

        # D5 Gaussian decode + offset dequantization
        t0 = time.time()
        ny = level.y_shape
        gain = self._gain(self.params, jnp.asarray([level.q_g, level.q_a], jnp.float32))
        gain_np = np.asarray(gain)
        scales_np = np.asarray(scales)[:ny]
        gc = self.model.gaussian_conditional
        idx = np.asarray(gc.build_indexes(jnp.asarray(scales_np * gain_np)))
        symbols = gc.decompress(self.gc_tables, level.y_string, idx)
        y_hat_valid = self._dequant(
            jnp.asarray(symbols), jnp.asarray(scales_np), jnp.asarray(means)[:ny], gain
        )
        y_feats = jnp.zeros((y_block.capacity, y_hat_valid.shape[1]), jnp.float32).at[
            :ny
        ].set(y_hat_valid)
        y_block = y_block.with_feats(y_feats)
        t_gaussian = time.time() - t0

        # D6 synthesis with per-frame top-k pruning
        t0 = time.time()
        ks = np.asarray(level.ks, np.int32).T  # [L, B]
        caps = tuple(int(bucket_size(int(ks[l].sum()))) for l in range(ks.shape[0]))
        rgb = self._synthesis(self.params, y_block, jnp.asarray(ks), caps)
        jax.block_until_ready(rgb.feats)
        frames = block_to_frames(rgb, num_frames)
        t_synth = time.time() - t0

        sideinfo = {
            "time_measurements": {
                "bitstream_reading": t_read,
                "geometry_decompression": t_geometry,
                "factorized_model": t_factorized,
                "hyper_synthesis": t_hyper,
                "guassian_model": t_gaussian,  # (sic) reference CSV schema
                "synthesis_transform": t_synth,
            },
            "timestamps": {"codec_start": t_codec_start, "codec_end": time.time()},
        }
        return frames, sideinfo
