"""Single-process launcher: run the full streaming system on one host.

The reference deploys its 6 services as Docker containers on two Jetsons
(docker-compose files, SURVEY.md §1). For single-host demos, development and
integration tests this launcher runs every service in-process on threads —
the same code paths and sockets, just one interpreter. Production multi-host
deployment is unchanged: start each service's ``__main__`` on its host with a
shared config.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

from pct.config import Config


class SystemLauncher:
    def __init__(self, config: Optional[Config] = None, enc_pipeline=None, dec_pipeline=None,
                 with_gui: bool = False, with_visualizer: bool = False):
        from pct.streaming import (
            Capturer,
            Decoder,
            Encoder,
            StreamingClient,
            StreamingServer,
        )

        self.config = config or Config.load()
        # bind-side services first (PULL binds)
        self.encoder = Encoder(self.config, pipeline=enc_pipeline)
        self.server = StreamingServer(self.config)
        self.decoder = Decoder(self.config, pipeline=dec_pipeline)
        gui = None
        if with_gui:
            from pct.streaming import DashboardGUI

            gui = DashboardGUI(self.config)
        self.client = StreamingClient(self.config, gui=gui)
        if gui is not None:
            gui.attach(self.client)
            gui.start_background()
        self.visualizer = None
        if with_visualizer:
            from pct.streaming import VisualizerBackend

            self.visualizer = VisualizerBackend(self.config)
        self.capturer = Capturer(self.config)
        self._threads: list[threading.Thread] = []

    def start(self, max_frames: Optional[int] = None) -> None:
        targets = [
            ("encoder", lambda: self.encoder.run()),
            ("media-server", lambda: self.server.run()),
            ("decoder", lambda: self.decoder.run()),
            ("client-download", lambda: self.client.download_loop()),
            ("client-receive", lambda: self.client.decoder_receiver()),
            ("client-playout", lambda: self.client.visualizer_sender()),
        ]
        if self.visualizer is not None:
            targets.append(("visualizer", lambda: self.visualizer.run()))
        for name, fn in targets:
            t = threading.Thread(target=fn, name=name, daemon=True)
            t.start()
            self._threads.append(t)
        time.sleep(0.2)
        cap = threading.Thread(
            target=lambda: self.capturer.run(max_frames=max_frames),
            name="capturer",
            daemon=True,
        )
        cap.start()
        self._threads.append(cap)

    def stop(self):
        self.client.stop()


if __name__ == "__main__":
    import sys

    cfg = Config.load(sys.argv[1] if len(sys.argv) > 1 else None)
    launcher = SystemLauncher(cfg, with_gui=True, with_visualizer=True)
    launcher.start()
    print("pct streaming system running; dashboard on "
          f"http://localhost:{cfg.get('gui_port')}, viewer on "
          f"http://localhost:{cfg.get('visualizer_http_port')}", flush=True)
    while True:
        time.sleep(3600)
