"""Python binding for the C++ octree geometry coder.

API mirrors the reference's G-PCC wrappers (``gpcc_encode``/``gpcc_decode``,
reference ``shared/utils.py:169-240``) minus the PLY-tempfile/subprocess hop:
in-memory int32 arrays in, bytes out. The latent-coordinate scaling contract
(stride-8 coords are divided by 8 before geometry coding and re-multiplied on
decode) lives in the codec pipeline, not here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CPP = os.path.join(_HERE, "cpp", "gpcc.cpp")
_HDR = os.path.join(_HERE, "cpp", "priors_v3.h")
_SO = os.path.join(_HERE, "cpp", "libgpcc.so")

_lock = threading.Lock()
_lib = None


def _load_lib():
    global _lib
    with _lock:
        if _lib is None:
            src_mtime = max(
                os.path.getmtime(_CPP),
                os.path.getmtime(_HDR) if os.path.exists(_HDR) else 0.0,
            )
            if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < src_mtime:
                # pid-unique tmp: concurrent first-use builds must not
                # interleave writes to one tmp file (cross-process races)
                tmp = f"{_SO}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _CPP],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
            lib.pct_gpcc_encode.restype = ctypes.c_int
            lib.pct_gpcc_decode.restype = ctypes.c_int
            _lib = lib
        return _lib


def encode_points(xyz: np.ndarray) -> bytes:
    """Losslessly encode a set of unique int32 points ``[N, 3]`` -> bytes."""
    xyz = np.ascontiguousarray(xyz, np.int32)
    assert xyz.ndim == 2 and xyz.shape[1] == 3
    lib = _load_lib()
    capacity = 64 + 8 * xyz.shape[0] + xyz.nbytes
    out = np.empty(capacity, np.uint8)
    n = lib.pct_gpcc_encode(
        xyz.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(xyz.shape[0]),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(capacity),
    )
    if n < 0:
        raise ValueError("gpcc encode failed")
    return out[:n].tobytes()


def decode_points(stream: bytes) -> np.ndarray:
    """Decode back to int32 ``[N, 3]`` (Morton order; re-sort canonically)."""
    if len(stream) < 4:
        raise ValueError("gpcc stream too short")
    n = int(np.frombuffer(stream[:4], np.int32)[0])
    lib = _load_lib()
    buf = np.frombuffer(stream, np.uint8)
    out = np.empty((max(n, 1), 3), np.int32)
    rc = lib.pct_gpcc_decode(
        buf.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(buf.size),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(max(n, 1)),
    )
    if rc < 0:
        raise ValueError("gpcc decode failed")
    return out[:rc]
