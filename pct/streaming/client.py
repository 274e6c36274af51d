"""Streaming client: MPD polling, scheduled downloads, playout pacing, GUI.

Reference: ``receiver/client/client.py`` — three threads + dashboard:

- ``download_loop``    — polls the MPD, computes the next segment number from
  the wall clock, wakes up ``request_offset`` early, downloads via the ABR
  downloader and PUSHes to the decoder,
- ``decoder_receiver`` — receives decoded frames, computes per-frame playout
  deadlines ``segment_start + (i+1)/num_frames + playout_offset``, updates
  the dashboard stats from the E*/D* sideinfo, logs the receiver CSV row,
- ``visualizer_sender`` — plays frames out at their deadlines (printing
  ``Stalling``/``Catching up`` on schedule misses) and forwards packed
  ``float32 xyz ⧺ uint8 rgb`` buffers to the visualizer.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional

import numpy as np

from pct.config import Config
from pct.streaming.downloader import SegmentDownloader
from pct.streaming.mpd import MPDParser
from pct.streaming.transport import PullSocket, PushSocket
from pct.streaming.transport import loads as transport_loads
from pct.utils import append_csv_row, stamp


def pack_view_frame(points: np.ndarray, colors: np.ndarray) -> bytes:
    """Wire format of the visualizer (reference ``client.py:140-146`` /
    ``visualizer/main.js:46-60``): [N*3 float32 xyz][N*3 uint8 rgb]."""
    pts = np.ascontiguousarray(points, np.float32)
    cols = np.ascontiguousarray(np.clip(colors * 255.0, 0, 255), np.uint8)
    return pts.tobytes() + cols.tobytes()


class StreamingClient:
    def __init__(self, config: Optional[Config] = None, gui=None):
        self.config = config or Config.load()
        self.segment_duration = float(self.config.get("segment_duration", 1.0))
        self.request_offset = float(self.config.get("request_offset", 0.3))
        self.playout_offset = float(self.config.get("playout_offset", 3.0))
        self.mpd = MPDParser(self.config["mpd_url"])
        base = self.config["mpd_url"].rsplit("/", 1)[0]
        self.downloader = SegmentDownloader(
            base,
            fixed_quality_mode=bool(self.config.get("fixed_quality_mode", True)),
            init_quality=int(self.config.get("init_quality", 1)),
        )
        self.decoder_push = PushSocket(self.config["decoder_address"])
        self.client_pull = PullSocket(self.config["client_address"])
        self.visualizer_push = PushSocket(self.config["visualizer_address"])
        self.gui = gui
        self.log_path = os.path.join(
            self.config.get("log_dir", "/tmp/pct_logs"), "receiver", "log.csv"
        )
        self._playout_q: list[tuple[float, bytes, int]] = []
        self._playout_cv = threading.Condition()
        self._stop = threading.Event()

    # ------------------------------------------------------------------
    def download_loop(self, max_segments: Optional[int] = None) -> None:
        """Wall-clock segment scheduling (reference ``client.py:74-96``):
        the next segment number is ``floor(now / segment_duration)`` — the
        sender numbers segments on the same absolute grid
        (``media_server.segment_number``) — gated on the manifest's
        ``publishTime`` changing, then sleep until the next grid point minus
        ``request_offset``."""
        last = -1
        last_publish = None
        done = 0
        while not self._stop.is_set():
            if not self.mpd.update_mpd():
                time.sleep(self.segment_duration / 4)
                continue
            publish_time = self.mpd.mpd.get("publishTime")
            if publish_time is None or publish_time == last_publish:
                # nothing newly published: poll at ~4 Hz relative to cadence
                time.sleep(max(self.segment_duration / 4, 0.05))
                continue
            last_publish = publish_time
            number = int(time.time() // self.segment_duration)
            adv = self.mpd.mpd.get("latestSegmentNumber")
            adv = int(adv) if adv is not None else None
            ok = False
            if number > last:
                if 0 <= last < number - 1:
                    # a stalled iteration skipped grid points (the round-3
                    # 1 fps campaign lost exactly these): the skipped
                    # segments are already published and, with the playout
                    # offset, still playable — backfill the recent ones
                    # (oldest first) instead of dropping them
                    backfill = int(self.playout_offset // self.segment_duration)
                    for n in range(max(last + 1, number - backfill), number):
                        if self.download_segment(n):
                            done += 1
                ok = self.download_segment(number)
                last = number
            if not ok and adv is not None and adv != number and adv > last:
                # publisher grid offset (slow encoder, clock skew, finite
                # playback): fall back to the newest advertised segment
                ok = self.download_segment(adv)
                last = max(last, adv)
            if ok:
                done += 1
                if max_segments is not None and done >= max_segments:
                    return
            wake = (number + 1) * self.segment_duration - self.request_offset
            sleep = wake - time.time()
            if sleep > 0:
                self._stop.wait(sleep)

    def download_segment(self, number: int) -> bool:
        reps = self.mpd.get_representations()
        quality = self.downloader.decide_quality(reps)
        codecs = next(
            (r["codecs"] for r in reps if int(r["id"]) == quality), "unified"
        )
        t0 = time.time()
        raw = self.downloader.download_segment(quality, number)
        if raw is None:
            print(f"[client] segment {number} lost", flush=True)
            return False
        # segment files wrap {data, sideinfo}: forward the sender's traveling
        # sideinfo (capture/codec timestamps + E* step timings) alongside the
        # receiver's own, as the reference does (client.py:107-118)
        try:
            wrapped = transport_loads(raw)
            data = bytes(wrapped["data"])
            tx_info = wrapped.get("sideinfo", {})
        except Exception:
            data, tx_info = raw, {}
        sideinfo = {
            "segment_number": number,
            "quality": quality,
            "download_time": time.time() - t0,
            "num_bytes": len(data),
            "encoder_time_measurements": tx_info.get("time_measurements", {}),
            "gop_info": tx_info.get("gop_info", {}),
            "timestamps": dict(tx_info.get("timestamps", {})),
        }
        stamp(sideinfo, "client_received")
        self.decoder_push.send(
            {
                "segment_number": number,
                "quality": quality,
                "codecs": codecs,
                "data": data,
                "sideinfo": sideinfo,
            }
        )
        return True

    # ------------------------------------------------------------------
    def decoder_receiver(self, max_segments: Optional[int] = None) -> None:
        done = 0
        while not self._stop.is_set():
            try:
                msg = self.client_pull.recv(timeout=1.0)
            except TimeoutError:
                continue
            sideinfo = msg.get("sideinfo", {})
            stamp(sideinfo, "client_playout_scheduled")
            frames = msg["frames"]
            number = int(msg.get("segment_number", 0))
            # anchor playout to the wall-clock segment grid (reference
            # ``client.py:127-154``): deadlines derive from the segment
            # number, not the decode-arrival time, so inter-segment pacing
            # does not drift with download/decode jitter; the max() only
            # defers segments that arrived after their scheduled start
            now = time.time()
            base = max(number * self.segment_duration + self.playout_offset, now)
            with self._playout_cv:
                for i, f in enumerate(frames):
                    deadline = base + (i + 1) * self.segment_duration / max(len(frames), 1)
                    buf = pack_view_frame(f["points"], f["colors"])
                    self._playout_q.append((deadline, buf, number))
                self._playout_q.sort(key=lambda x: x[0])
                self._playout_cv.notify()
            if self.gui is not None:
                self.gui.update_stats(sideinfo, frames)
            append_csv_row(self.log_path, {"ID": number, **sideinfo})
            done += 1
            if max_segments is not None and done >= max_segments:
                return

    def visualizer_sender(self) -> None:
        while not self._stop.is_set():
            with self._playout_cv:
                if not self._playout_cv.wait_for(lambda: self._playout_q, timeout=0.5):
                    continue
                deadline, buf, number = self._playout_q[0]
                now = time.time()
                if now < deadline:
                    self._playout_cv.wait(timeout=deadline - now)
                    continue
                self._playout_q.pop(0)
            late = time.time() - deadline
            if late > self.segment_duration:
                print(f"[client] Catching up ({late:.2f}s late)", flush=True)
            elif late > 0.25 * self.segment_duration:
                print("[client] Stalling", flush=True)
            self.visualizer_push.send({"frame": np.frombuffer(buf, np.uint8)})

    # ------------------------------------------------------------------
    def run(self) -> None:
        threads = [
            threading.Thread(target=self.download_loop, daemon=True),
            threading.Thread(target=self.decoder_receiver, daemon=True),
            threading.Thread(target=self.visualizer_sender, daemon=True),
        ]
        for t in threads:
            t.start()
        if self.gui is not None:
            self.gui.run()  # blocks
        else:
            for t in threads:
                t.join()

    def stop(self):
        self._stop.set()


if __name__ == "__main__":
    import sys

    cfg = Config.load(sys.argv[1] if len(sys.argv) > 1 else None)
    from pct.streaming.gui import DashboardGUI

    client = StreamingClient(cfg, gui=DashboardGUI(cfg))
    client.gui.attach(client)
    client.run()
