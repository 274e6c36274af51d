"""Inter-service transport: PUSH/PULL message pipes + msgpack wire format.

The reference wires its 6 services with ZeroMQ PUSH/PULL sockets carrying
pickled dicts (addresses in ``shared/config.yaml:23-32``; e.g. reference
``capturer.py:37-39``, ``decoder.py:31-36``). This module keeps the same
topology but replaces pickle with msgpack + typed ndarray encoding (pickle
over the network is unsafe and slow) and falls back to a stdlib TCP
implementation with length-prefixed frames when pyzmq is unavailable.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Any, Optional

import msgpack
import numpy as np

try:
    import zmq

    _HAS_ZMQ = True
except Exception:  # pragma: no cover
    _HAS_ZMQ = False


# ----------------------------------------------------------------------------
# serialization: msgpack with ndarray support
# ----------------------------------------------------------------------------


def _encode(obj):
    if isinstance(obj, np.ndarray):
        return {
            b"__nd__": True,
            b"dtype": str(obj.dtype),
            b"shape": list(obj.shape),
            b"data": obj.tobytes(),
        }
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"unserializable type {type(obj)}")


def _decode(obj):
    if b"__nd__" in obj:
        return np.frombuffer(obj[b"data"], dtype=obj[b"dtype"]).reshape(obj[b"shape"])
    return obj


def dumps(msg: Any) -> bytes:
    return msgpack.packb(msg, default=_encode, use_bin_type=True)


def loads(data: bytes) -> Any:
    return msgpack.unpackb(data, object_hook=_decode, raw=False, strict_map_key=False)


# ----------------------------------------------------------------------------
# sockets
# ----------------------------------------------------------------------------


def _parse_tcp(addr: str) -> tuple[str, int]:
    assert addr.startswith("tcp://"), addr
    host, port = addr[len("tcp://") :].rsplit(":", 1)
    return host, int(port)


class PushSocket:
    """Connect-and-send half of a pipe (ZMQ PUSH semantics)."""

    def __init__(self, addr: str):
        self.addr = addr
        if _HAS_ZMQ:
            self._ctx = zmq.Context.instance()
            self._sock = self._ctx.socket(zmq.PUSH)
            self._sock.connect(addr)
        else:
            self._sock = None
            self._lock = threading.Lock()

    def _ensure_tcp(self):
        if self._sock is None:
            s = socket.create_connection(_parse_tcp(self.addr), timeout=30)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._sock = s

    def send(self, msg: Any) -> None:
        data = dumps(msg)
        if _HAS_ZMQ:
            self._sock.send(data)
        else:
            with self._lock:
                self._ensure_tcp()
                self._sock.sendall(struct.pack("<Q", len(data)) + data)

    def close(self):
        if self._sock is not None:
            self._sock.close()


class PullSocket:
    """Bind-and-receive half of a pipe (ZMQ PULL semantics)."""

    def __init__(self, addr: str):
        self.addr = addr
        if _HAS_ZMQ:
            self._ctx = zmq.Context.instance()
            self._sock = self._ctx.socket(zmq.PULL)
            self._sock.bind(addr)
        else:
            host, port = _parse_tcp(addr)
            self._server = socket.create_server((host, port))
            self._conns: list[socket.socket] = []
            self._queue: list[bytes] = []
            self._cv = threading.Condition()
            threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self):  # pragma: no cover - fallback path
        while True:
            conn, _ = self._server.accept()
            threading.Thread(target=self._recv_loop, args=(conn,), daemon=True).start()

    def _recv_loop(self, conn):  # pragma: no cover - fallback path
        try:
            while True:
                hdr = self._recv_exact(conn, 8)
                if hdr is None:
                    return
                (n,) = struct.unpack("<Q", hdr)
                data = self._recv_exact(conn, n)
                if data is None:
                    return
                with self._cv:
                    self._queue.append(data)
                    self._cv.notify()
        finally:
            conn.close()

    @staticmethod
    def _recv_exact(conn, n):  # pragma: no cover - fallback path
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def recv(self, timeout: Optional[float] = None) -> Any:
        if _HAS_ZMQ:
            if timeout is not None:
                if not self._sock.poll(timeout * 1000):
                    raise TimeoutError(f"no message within {timeout}s on {self.addr}")
            return loads(self._sock.recv())
        with self._cv:
            if not self._cv.wait_for(lambda: self._queue, timeout=timeout):
                raise TimeoutError(f"no message within {timeout}s on {self.addr}")
            return loads(self._queue.pop(0))

    def close(self):
        if _HAS_ZMQ:
            self._sock.close()
        else:  # pragma: no cover
            self._server.close()
