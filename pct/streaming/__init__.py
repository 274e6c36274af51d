from pct.streaming.transport import PushSocket, PullSocket, dumps, loads
from pct.streaming.mpd import MPDManager, MPDParser
from pct.streaming.downloader import SegmentDownloader
from pct.streaming.capturer import Capturer, load_recorded_frames
from pct.streaming.encoder_service import Encoder, sample_frames
from pct.streaming.media_server import (
    StreamingServer,
    HTTPServerHandler,
    pack_raw_frames,
    unpack_raw_frames,
)
from pct.streaming.decoder_service import Decoder
from pct.streaming.client import StreamingClient, pack_view_frame
from pct.streaming.gui import DashboardGUI
from pct.streaming.visualizer import VisualizerBackend

__all__ = [
    "PushSocket",
    "PullSocket",
    "dumps",
    "loads",
    "MPDManager",
    "MPDParser",
    "SegmentDownloader",
    "Capturer",
    "load_recorded_frames",
    "Encoder",
    "sample_frames",
    "StreamingServer",
    "HTTPServerHandler",
    "pack_raw_frames",
    "unpack_raw_frames",
    "Decoder",
    "StreamingClient",
    "pack_view_frame",
    "DashboardGUI",
    "VisualizerBackend",
]
