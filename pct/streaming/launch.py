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
                 with_gui: bool = False, with_visualizer: bool = False,
                 role: str = "all"):
        """``role`` selects which half of the system this process runs —
        ``"sender"`` (capturer + encoder + media server), ``"receiver"``
        (client + decoder [+ gui/visualizer]) or ``"all"`` — the two-host
        deployment split of the reference's sender/receiver docker-compose
        files (configs/{sender,receiver}.yaml carry the matching configs;
        tested cross-process by tests/test_two_host.py)."""
        from pct.streaming import (
            Capturer,
            Decoder,
            Encoder,
            StreamingClient,
            StreamingServer,
        )

        assert role in ("all", "sender", "receiver"), role
        self.role = role
        self.config = config or Config.load()
        sender = role in ("all", "sender")
        receiver = role in ("all", "receiver")
        # bind-side services first (PULL binds)
        self.encoder = Encoder(self.config, pipeline=enc_pipeline) if sender else None
        self.server = StreamingServer(self.config) if sender else None
        self.decoder = Decoder(self.config, pipeline=dec_pipeline) if receiver else None
        gui = None
        if with_gui and receiver:
            from pct.streaming import DashboardGUI

            gui = DashboardGUI(self.config)
        self.client = StreamingClient(self.config, gui=gui) if receiver else None
        if gui is not None:
            gui.attach(self.client)
            gui.start_background()
        self.visualizer = None
        if with_visualizer and receiver:
            from pct.streaming import VisualizerBackend

            self.visualizer = VisualizerBackend(self.config)
        self.capturer = Capturer(self.config) if sender else None
        self._threads: list[threading.Thread] = []

    def start(self, max_frames: Optional[int] = None) -> None:
        targets = []
        if self.encoder is not None:
            targets += [
                ("encoder", lambda: self.encoder.run()),
                ("media-server", lambda: self.server.run()),
            ]
        if self.client is not None:
            targets += [
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
        if self.capturer is not None:
            time.sleep(0.2)
            cap = threading.Thread(
                target=lambda: self.capturer.run(max_frames=max_frames),
                name="capturer",
                daemon=True,
            )
            cap.start()
            self._threads.append(cap)

    def stop(self):
        """Graceful shutdown of every service this launcher started — both
        halves have real stop hooks (ADVICE r4: sender shutdown used to be
        process-kill only)."""
        for svc in (
            self.capturer, self.encoder, self.server,  # sender half
            self.decoder, self.client,  # receiver half
        ):
            if svc is not None:
                svc.stop()


if __name__ == "__main__":
    import sys

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    role = "all"
    for a in sys.argv[1:]:
        if a.startswith("--role="):
            role = a.split("=", 1)[1]
    cfg = Config.load(args[0] if args else None)
    launcher = SystemLauncher(
        cfg, with_gui=role != "sender", with_visualizer=role != "sender", role=role
    )
    launcher.start()
    if role == "sender":
        print("pct sender running (capturer + encoder + media server)", flush=True)
    else:
        print("pct streaming system running; dashboard on "
              f"http://localhost:{cfg.get('gui_port')}, viewer on "
              f"http://localhost:{cfg.get('visualizer_http_port')}", flush=True)
    while True:
        time.sleep(3600)
