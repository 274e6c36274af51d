"""Dashboard GUI + visualizer HTTP surfaces."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from pct.config import Config


def test_dashboard_data_and_quality_override():
    from pct.streaming.gui import DashboardGUI

    cfg = Config.load()
    cfg.update({"gui_port": 18300, "encoding_settings": [[1, 1]], "init_quality": 1})
    gui = DashboardGUI(cfg)
    gui.start_background()
    time.sleep(0.2)

    with urllib.request.urlopen("http://127.0.0.1:18300/data", timeout=5) as r:
        data = json.loads(r.read())
    assert data["quality"] == 1 and data["num_qualities"] == 2

    # stats update path (what decoder_receiver feeds)
    gui.update_stats(
        {
            "num_bytes": 1000,
            "download_time": 0.1,
            "quality": 0,
            "timestamps": {"capturing": time.time() - 1.5, "client_playout_scheduled": time.time()},
            "time_measurements": {"synthesis_transform": 0.1, "guassian_model": 0.02},
            "encoder_time_measurements": {"analysis": 0.2, "gaussian_model": 0.05},
        },
        [{"points": np.zeros((10, 3))}],
    )
    with urllib.request.urlopen("http://127.0.0.1:18300/data", timeout=5) as r:
        data = json.loads(r.read())
    assert data["points"] == 10 and data["bandwidth"] > 0 and data["latency"] > 1.0
    # per-step E/D latencies served for the stacked step bars
    assert data["decoder_latencies"]["synthesis_transform"] == pytest.approx(0.1)
    assert data["encoder_latencies"]["analysis"] == pytest.approx(0.2)
    # the page renders the stacked-bar charts for both
    with urllib.request.urlopen("http://127.0.0.1:18300/", timeout=5) as r:
        page = r.read().decode()
    assert "drawStacked" in page and "encoder_latencies" in page

    # quality override POST (reference gui.py:17-22 surface)
    req = urllib.request.Request(
        "http://127.0.0.1:18300/quality",
        data=json.dumps({"fixed_quality": 0}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=5) as r:
        assert r.status == 200
    with urllib.request.urlopen("http://127.0.0.1:18300/data", timeout=5) as r:
        assert json.loads(r.read())["quality"] == 0

    # dashboard page served
    with urllib.request.urlopen("http://127.0.0.1:18300/", timeout=5) as r:
        assert b"pct streaming dashboard" in r.read()
    gui.stop()


def test_visualizer_page_and_ws_bridge():
    pytest.importorskip("websockets")
    from pct.streaming.visualizer import VisualizerBackend
    from pct.streaming.transport import PushSocket
    from pct.streaming.client import pack_view_frame

    cfg = Config.load()
    cfg.update(
        {
            "visualizer_address": "tcp://127.0.0.1:18310",
            "websocket_port": 18311,
            "visualizer_http_port": 18312,
        }
    )
    backend = VisualizerBackend(cfg)
    threading.Thread(target=backend.run, daemon=True).start()
    time.sleep(0.5)

    with urllib.request.urlopen("http://127.0.0.1:18312/", timeout=5) as r:
        page = r.read()
    assert b"WebSocket" in page and b"18311" in page

    # ws client receives the binary frame pushed through the bridge
    import asyncio
    import websockets

    received = {}

    async def client():
        async with websockets.connect("ws://127.0.0.1:18311") as ws:
            await asyncio.sleep(0.3)
            push = PushSocket(cfg["visualizer_address"])
            buf = pack_view_frame(
                np.arange(9, dtype=np.float32).reshape(3, 3),
                np.full((3, 3), 0.5, np.float32),
            )
            push.send({"frame": np.frombuffer(buf, np.uint8)})
            received["data"] = await asyncio.wait_for(ws.recv(), timeout=10)

    asyncio.run(client())
    data = received["data"]
    assert len(data) == 3 * 12 + 3 * 3
    pts = np.frombuffer(data[:36], np.float32).reshape(3, 3)
    np.testing.assert_array_equal(pts, np.arange(9, dtype=np.float32).reshape(3, 3))
