"""Decoder service: concurrent segment decompression.

Reference: ``receiver/decoder/decoder.py`` — PULLs downloaded segments from
the client, decodes on a 3-worker pool (``codecs=="unified"`` -> neural
decompression, ``"raw"`` -> passthrough with zeroed timings), re-attaches
timing sideinfo, and PUSHes decoded frames back to the client. The decoder
implementation is selected by config ``decoder_type`` ("Single" serial vs
pipelined)."""

from __future__ import annotations

import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from pct.config import Config
from pct.streaming.media_server import unpack_raw_frames
from pct.streaming.transport import PullSocket, PushSocket
from pct.utils import stamp


class Decoder:
    def __init__(self, config: Optional[Config] = None, pipeline=None, workers: int = 3):
        self.config = config or Config.load()
        self.pull = PullSocket(self.config["decoder_address"])
        self._stop = threading.Event()
        self.push = PushSocket(self.config["client_address"])
        self.executor = ThreadPoolExecutor(max_workers=workers)
        self.pipeline = pipeline or self._default_pipeline()

    def _default_pipeline(self):
        from pct.models import ColorModel, UnifiedConfig, checkpoint

        ckpt = self.config.get("checkpoint_path")
        tables = None
        if ckpt:
            model, params, tables = checkpoint.load_with_tables(ckpt)
        else:
            import jax

            model = ColorModel(
                UnifiedConfig(channels=(16, 32, 64), latent_channels=64, hyper_channels=32)
            )
            params = model.init_params(jax.random.key(0))
        if self.config.get("decoder_type", "Pipelined") == "Single":
            from pct.pipeline import SerialDecoder

            return SerialDecoder(model, params, tables)
        from pct.pipeline import DecompressionPipeline

        return DecompressionPipeline(model, params, tables)

    # ------------------------------------------------------------------
    def decode_and_send(self, msg: dict) -> None:
        try:
            sideinfo = dict(msg.get("sideinfo", {}))
            stamp(sideinfo, "decoder_received")
            data = bytes(msg["data"])
            if msg.get("codecs") == "unified":
                frames, codec_info = self.pipeline.decompress(data)
                sideinfo.update(
                    {k: v for k, v in codec_info.items() if k != "timestamps"}
                )
                sideinfo.setdefault("timestamps", {}).update(
                    codec_info.get("timestamps", {})
                )
                out = [
                    {
                        "points": f["points"].astype(np.float32),
                        "colors": f["colors"].astype(np.float32),
                    }
                    for f in frames
                ]
            else:  # raw passthrough (zeroed codec timings, reference decoder.py:58-70)
                raw = unpack_raw_frames(data)
                out = [
                    {
                        "points": f["points"].astype(np.float32),
                        "colors": f["colors"].astype(np.float32) / 255.0,
                    }
                    for f in raw
                ]
                sideinfo["time_measurements"] = {
                    k: 0.0
                    for k in (
                        "bitstream_reading",
                        "geometry_decompression",
                        "factorized_model",
                        "hyper_synthesis",
                        "guassian_model",
                        "synthesis_transform",
                    )
                }
            stamp(sideinfo, "decoder_finished")
            self.push.send(
                {
                    "segment_number": msg.get("segment_number"),
                    "quality": msg.get("quality"),
                    "frames": out,
                    "sideinfo": sideinfo,
                }
            )
        except Exception as e:  # noqa: BLE001
            print(f"[decoder] segment {msg.get('segment_number')} failed: {e}", flush=True)

    def prewarm(self) -> None:
        """Compile the decode bucket ladder before live traffic (config
        ``prewarm_buckets``): encode synthetic GOPs with a local encoder
        built from the same weights, then decode them through this
        pipeline's serial core."""
        from pct.pipeline import SerialEncoder
        from pct.pipeline.warmup import prewarm_codec

        serial = getattr(self.pipeline, "_serial", self.pipeline)
        enc = SerialEncoder(
            serial.model,
            serial.params,
            {"eb": serial.eb_tables, "gc": serial.gc_tables},
        )
        fps = int(self.config.get("target_fps", 5))
        n = max(1, round(float(self.config.get("segment_duration", 1.0)) * fps))
        maxp = int(self.config.get("prewarm_max_points", 0)) or min(
            int(self.config.get("max_points", 150_000)), n * 20_000
        )
        from pct.streaming.encoder_service import _prewarm_examples

        prewarm_codec(
            enc,
            self.pipeline,
            num_frames=n,
            max_points=maxp,
            settings=list(self.config.get("encoding_settings")),
            lossless=bool(self.config.get("lossless_rep", False)),
            geometry_mode=self.config.get("geometry_mode", "latent"),
            # the service decodes ONE selected representation per segment;
            # the fused multi-rate graphs are RD-tooling-only and can crash
            # the v5e TPU worker at big tiers
            multi_level=False,
            example_frames=_prewarm_examples(self.config),
        )

    def stop(self) -> None:
        self._stop.set()
        self.executor.shutdown(wait=False)

    def run(self, max_segments: Optional[int] = None) -> None:
        if self.config.get("prewarm_buckets", False):
            self.prewarm()
        done = 0
        while not self._stop.is_set():
            try:
                msg = self.pull.recv(timeout=0.5)
            except TimeoutError:
                continue
            self.executor.submit(self.decode_and_send, msg)
            done += 1
            if max_segments is not None and done >= max_segments:
                self.executor.shutdown(wait=True)
                return


if __name__ == "__main__":
    import sys

    Decoder(Config.load(sys.argv[1] if len(sys.argv) > 1 else None)).run()
