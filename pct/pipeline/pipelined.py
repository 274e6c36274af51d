"""Pipelined encoder/decoder: overlapped device + host stages.

The reference's pipelined codecs (``sender/encoder/codec_pipeline.py`` — 6
threads, ``receiver/decoder/codec_parallel.py`` — 4 threads) overlap GPU NN
steps with CPU entropy/G-PCC steps across consecutive segments. The TPU
serial codec already fuses each side into two device dispatches
(pct.pipeline.serial), so the pipelined variants are two-stage:

  encoder: [device: fused analysis->symbol planes] -> [host: rANS + octree + pack]
  decoder: [host: parse + geometry + factorized rANS] -> [device: hyper ->
            host gaussian rANS -> device synthesis]

Stage s of segment n overlaps stage s-1 of segment n+1; ``compress``/
``decompress`` block on a per-call result queue so service thread pools
pipeline naturally. Stage exceptions are forwarded to the blocked caller.
"""

from __future__ import annotations

import time
from typing import Sequence


from pct.entropy.bitstream import pack_segment
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
        self.q_done = NotifyingQueue()
        Stage("enc-device", self._device, self.q_in, self.q_mid)
        Stage("enc-host", self._host, self.q_mid, self.q_done)

    def _device(self, item):
        frames, settings, result_q, t_start, geometry_mode, lossless_extra, color_step = item
        try:
            t0 = time.time()
            dev = self._serial.device_encode(frames, settings)
            return (dev, settings, frames, geometry_mode, lossless_extra, color_step, result_q, t_start, time.time() - t0)
        except Exception:  # noqa: BLE001 - forward to the blocked caller
            import traceback

            result_q.put(StageError(Exception("encode device stage"), traceback.format_exc()))
            return None

    def _host(self, item):
        if item is None:
            return None
        dev, settings, frames, geometry_mode, lossless_extra, color_step, result_q, t_start, t_device = item
        try:
            levels, times = self._serial.host_encode(
                dev, settings, frames, geometry_mode=geometry_mode,
                lossless_extra=lossless_extra, lossless_color_step=color_step,
            )
            # modeled E1/E2/E4 split of the fused device wall (see
            # serial._device_step_fractions); the step sum stays t_device
            f_a, f_ha, f_hs = dev.get("step_fracs", (1.0, 0.0, 0.0))
            times.update({
                "analysis": t_device * f_a,
                "hyper_analysis": t_device * f_ha,
                "hyper_synthesis": t_device * f_hs,
            })
            total_bytes = sum(lv.num_bytes() for lv in levels)
            sideinfo = {
                "num_points": dev["num_points"],
                "gop_info": {
                    "bpp": total_bytes * 8 / max(dev["num_points"], 1) / max(len(settings), 1),
                    "num_frames": dev["num_frames"],
                },
                "time_measurements": times,
                "timestamps": {"codec_start": t_start, "codec_end": time.time()},
            }
            result_q.put((levels, sideinfo))
        except Exception:  # noqa: BLE001
            import traceback

            result_q.put(StageError(Exception("encode host stage"), traceback.format_exc()))
        return None

    def compress(self, frames: Sequence[dict], settings: Sequence[Sequence[float]], geometry_mode="latent", lossless_extra: bool = False, lossless_color_step=0):
        result_q = NotifyingQueue()
        self.q_in.put((list(frames), list(settings), result_q, time.time(), geometry_mode, lossless_extra, lossless_color_step))
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
        self.q_done = NotifyingQueue()
        Stage("dec-head", self._head, self.q_in, self.q_mid)
        Stage("dec-neural", self._neural, self.q_mid, self.q_done)

    def _head(self, item):
        """Host-entropy front half (reference D1-D5: bitstream read, octree
        geometry, factorized + Gaussian rANS, hyper synthesis dispatch).
        While this stage chews segment n+1's rANS streams on the CPU, the
        neural stage runs segment n's device synthesis — the overlap the
        reference gets from its 4 decoder threads (codec_parallel.py:28-43)."""
        import time as _time

        from pct.entropy.bitstream import SegmentBitstream

        level, result_q, t_start = item
        try:
            t0 = _time.time()
            if isinstance(level, (bytes, bytearray)):
                level = SegmentBitstream.unpack(bytes(level))
            t_read = _time.time() - t0
            if level.geometry_mode != "latent":
                # guided/lossless decode their pyramid level-by-level with
                # host<->device ping-pong — no clean entropy/synthesis seam;
                # they run whole in the neural stage (still overlapping the
                # head stage of the NEXT segment).
                return ("whole", level, None, result_q, t_start)
            front = self._serial._latent_phase1_host(level)
            return ("split", level, (front, t_read), result_q, t_start)
        except Exception:  # noqa: BLE001 - forward to the blocked caller
            import traceback

            result_q.put(StageError(Exception("decode head stage"), traceback.format_exc()))
            return None

    def _neural(self, item):
        if item is None:
            return None
        kind, level, headout, result_q, t_start = item
        try:
            if kind == "whole":
                frames, sideinfo = self._serial.decompress(level)
            else:
                front, t_read = headout
                frames, sideinfo = self._serial._latent_phase2_host(level, front, t_read)
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
