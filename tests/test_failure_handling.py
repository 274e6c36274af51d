"""Failure-detection / best-effort-streaming semantics (SURVEY.md §5):
lost segments are skipped with retries, ABR reacts to bandwidth, stage
errors surface, atomic publication never exposes partial files."""

import http.server
import os
import socketserver
import threading

import numpy as np
import pytest

from pct.streaming.downloader import SegmentDownloader

PORT = 18200


@pytest.fixture(scope="module")
def media_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("media")
    os.makedirs(root / "ID1", exist_ok=True)
    (root / "ID1" / "segment-000000000000007.bin").write_bytes(b"x" * 1000)
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(root), **kw
    )
    httpd = socketserver.ThreadingTCPServer(("127.0.0.1", PORT), handler)
    httpd.daemon_threads = True
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield root
    httpd.shutdown()


def test_download_success_updates_bandwidth(media_server):
    d = SegmentDownloader(f"http://127.0.0.1:{PORT}")
    data = d.download_segment(1, 7)
    assert data == b"x" * 1000
    assert d.bandwidth_estimate > 0


def test_download_missing_returns_none_after_retries(media_server):
    d = SegmentDownloader(f"http://127.0.0.1:{PORT}", retries=2)
    assert d.download_segment(1, 99) is None


def test_abr_decision():
    d = SegmentDownloader("http://x", fixed_quality_mode=False, init_quality=1)
    reps = [
        {"id": "0", "codecs": "raw", "bandwidth": 10_000_000},
        {"id": "1", "codecs": "unified", "bandwidth": 100_000},
        {"id": "2", "codecs": "unified", "bandwidth": 500_000},
    ]
    d.bandwidth_estimate = 700_000  # affords rep 1+2 (<= 560k), not raw
    assert d.decide_quality(reps) == 2
    d.bandwidth_estimate = 130_000
    assert d.decide_quality(reps) == 1
    d.bandwidth_estimate = 1.0  # nothing affordable -> lowest listed
    assert d.decide_quality(reps) == 0
    d.fixed_quality_mode = True
    d.fixed_quality = 1
    assert d.decide_quality(reps) == 1


def test_mpd_parser_retries_unreachable():
    from pct.streaming.mpd import MPDParser

    p = MPDParser(f"http://127.0.0.1:{PORT + 1}/manifest.mpd", retries=2)
    assert p.update_mpd() is False
    assert p.get_representations() == []


def test_atomic_segment_publish(tmp_path):
    """handle_data writes via tmp+rename — no partial .bin files visible."""
    from pct.config import Config
    from pct.streaming.media_server import StreamingServer

    cfg = Config.load()
    cfg.update(
        {
            "media_dir": str(tmp_path / "m"),
            "log_dir": str(tmp_path / "l"),
            "media_server_address": "tcp://127.0.0.1:18230",
            "media_server_port": 18231,
            "encoding_settings": [[1.0, 1.0]],
        }
    )
    s = StreamingServer(cfg)
    msg = {
        "segment_id": 0,
        "compressed_levels": [b"payload"],
        "raw_frames": [
            {"points": np.zeros((3, 3), np.int16), "colors": np.zeros((3, 3), np.uint8)}
        ],
        "sideinfo": {"timestamps": {"capturing": __import__("time").time()}},
    }
    s.handle_data(msg)
    files = []
    for d in os.listdir(cfg["media_dir"]):
        full = os.path.join(cfg["media_dir"], d)
        if os.path.isdir(full):
            files += os.listdir(full)
    assert files and not any(f.endswith(".tmp") for f in files)
    s.http.stop()


def test_notifying_queue_timeout():
    from pct.pipeline.queues import NotifyingQueue

    q = NotifyingQueue()
    with pytest.raises(TimeoutError):
        q.get(timeout=0.05)
    q.put(1)
    assert q.get(timeout=1) == 1
