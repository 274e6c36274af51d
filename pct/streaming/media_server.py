"""Media server: wall-clock-aligned DASH segment publisher + HTTP server.

Reference: ``sender/media_server/media_server.py`` — PULLs compressed
segments from the encoder, buffers them, publishes each quality level to
``media/ID{q}/segment-{N:015d}.bin`` (atomic tmp+rename) at
``capture_time + publish_offset``, updates the live MPD, deletes segments
more than 10 behind, and appends the sender CSV telemetry row. Quality 0 is
the raw passthrough representation (``codecs="raw"``). Segment files wrap
``{data: payload, sideinfo}`` in msgpack (the pickle-free analog of the
reference's ``pickle.dumps((bytes, sideinfo))``, ``media_server.py:131-141``)
so encoder step timings travel to the receiver.
"""

from __future__ import annotations

import http.server
import os
import socketserver
import threading
import time
from typing import Optional

import numpy as np

from pct.config import Config
from pct.streaming.mpd import MPDManager
from pct.streaming.transport import PullSocket, dumps
from pct.utils import append_csv_row, stamp


def pack_raw_frames(frames: list[dict]) -> bytes:
    """Serialize the uncompressed representation: per frame
    ``[n: i32][points: int16 n*3][colors: uint8 n*3]``."""
    import struct

    out = bytearray(struct.pack("<i", len(frames)))
    for f in frames:
        pts = np.asarray(f["points"], np.int16)
        cols = np.asarray(f["colors"], np.uint8)
        out += struct.pack("<i", pts.shape[0])
        out += pts.tobytes()
        out += cols.tobytes()
    return bytes(out)


def unpack_raw_frames(data: bytes) -> list[dict]:
    import struct

    off = 0
    (nf,) = struct.unpack_from("<i", data, off)
    off += 4
    frames = []
    for _ in range(nf):
        (n,) = struct.unpack_from("<i", data, off)
        off += 4
        pts = np.frombuffer(data, np.int16, n * 3, off).reshape(n, 3)
        off += n * 6
        cols = np.frombuffer(data, np.uint8, n * 3, off).reshape(n, 3)
        off += n * 3
        frames.append({"points": pts.copy(), "colors": cols.copy()})
    return frames


class HTTPServerHandler:
    """Serve the media directory (reference ``sender/media_server/server.py``)."""

    def __init__(self, directory: str, port: int):
        handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
            *a, directory=directory, **kw
        )
        socketserver.ThreadingTCPServer.allow_reuse_address = True
        self.httpd = socketserver.ThreadingTCPServer(("0.0.0.0", port), handler)
        self.httpd.daemon_threads = True

    def start(self):
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def stop(self):
        self.httpd.shutdown()


class StreamingServer:
    def __init__(self, config: Optional[Config] = None):
        self.config = config or Config.load()
        self.media_dir = self.config.get("media_dir", "/tmp/pct_media")
        self.publish_offset = float(self.config.get("publish_offset", 3.0))
        self.segment_duration = float(self.config.get("segment_duration", 1.0))
        self.cleanup_window = 10
        os.makedirs(self.media_dir, exist_ok=True)

        self.pull = PullSocket(self.config["media_server_address"])
        self._stop = threading.Event()
        num_levels = len(self.config.get("encoding_settings"))
        if self.config.get("lossless_rep", False):
            num_levels += 1  # the lossless-geometry top rung
        self.mpd = MPDManager(self.segment_duration)
        self.mpd.setup_adaptation_set()
        self.mpd.add_representation(0, "raw")
        for q in range(1, num_levels + 1):
            self.mpd.add_representation(q, "unified")
        self.mpd.save_mpd(os.path.join(self.media_dir, "manifest.mpd"))
        self.http = HTTPServerHandler(self.media_dir, int(self.config.get("media_server_port", 8080)))
        self.http.start()
        self.log_path = os.path.join(
            self.config.get("log_dir", "/tmp/pct_logs"), "sender", "log.csv"
        )

    # ------------------------------------------------------------------
    def segment_number(self, capture_time: float) -> int:
        """Absolute wall-clock grid (reference ``media_server.py:127-128``):
        ``floor((capture + publish_offset) / segment_duration)`` with no local
        epoch, so the receiver can derive the same number from its own clock
        (``StreamingClient.download_loop``) without coordination."""
        return int((capture_time + self.publish_offset) // self.segment_duration)

    def handle_data(self, msg: dict) -> None:
        sideinfo = msg.get("sideinfo", {})
        stamp(sideinfo, "media_server_received")
        capture = sideinfo.get("timestamps", {}).get("capturing", time.time())
        number = max(self.segment_number(capture), 0)

        payloads = {0: pack_raw_frames(msg.get("raw_frames", []))}
        for q, blob in enumerate(msg.get("compressed_levels", []), start=1):
            payloads[q] = bytes(blob)

        for q, blob in payloads.items():
            d = os.path.join(self.media_dir, f"ID{q}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"segment-{number:015d}.bin")
            # segment file = payload + traveling sideinfo (the reference's
            # pickle((bytes, sideinfo)) at media_server.py:131-141, msgpack
            # here) so encoder-side step timings reach the receiver dashboard
            wrapped = dumps({"data": blob, "sideinfo": sideinfo})
            with open(path + ".tmp", "wb") as f:
                f.write(wrapped)
            os.replace(path + ".tmp", path)
            self.mpd.update_metadata(q, int(len(blob) * 8 / self.segment_duration))

        self.mpd.update_segment(number)
        self.mpd.save_mpd(os.path.join(self.media_dir, "manifest.mpd"))
        stamp(sideinfo, "server_published")
        self.cleanup_segments(number)
        # the published wall-clock number is the join key of the sender and
        # receiver CSVs (reference merges on it, evaluation/plot.py:46-79)
        append_csv_row(self.log_path, {"ID": number, **sideinfo})

    def cleanup_segments(self, current: int) -> None:
        cutoff = current - self.cleanup_window
        for d in os.listdir(self.media_dir):
            full = os.path.join(self.media_dir, d)
            if not (d.startswith("ID") and os.path.isdir(full)):
                continue
            for f in os.listdir(full):
                if f.startswith("segment-") and f.endswith(".bin"):
                    try:
                        if int(f[len("segment-") : -len(".bin")]) < cutoff:
                            os.remove(os.path.join(full, f))
                    except ValueError:
                        pass

    def stop(self) -> None:
        """Graceful sender-side shutdown: unblock run() and stop the HTTP
        server (ADVICE r4 — sender services had no shutdown path)."""
        self._stop.set()
        self.http.stop()

    def run(self, max_segments: Optional[int] = None) -> None:
        done = 0
        while not self._stop.is_set():
            try:
                msg = self.pull.recv(timeout=0.5)
            except TimeoutError:
                continue
            self.handle_data(msg)
            done += 1
            if max_segments is not None and done >= max_segments:
                return


if __name__ == "__main__":
    import sys

    StreamingServer(Config.load(sys.argv[1] if len(sys.argv) > 1 else None)).run()
