"""ctypes binding for the native OTZ segment decoder (csrc/otz_core.cpp).

Encode runs on the TPU; decode is sequential per segment, so this native
routine is the fast decode path, run in parallel across segments by the
container (threads — the C call releases the GIL for its duration).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "otz_core.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")

_lib = None
_lock = threading.Lock()


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = os.path.join(_BUILD_DIR, f"libotz_core_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp.{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-fno-exceptions",
             "-funroll-loops", _SRC, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, so_path)
    return so_path


def get_library():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.otz_raw_len.restype = ctypes.c_int64
            lib.otz_raw_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.otz_decode_segment.restype = ctypes.c_int64
            lib.otz_decode_segment.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ]
            _lib = lib
    return _lib


def decode_segment_native(payload: bytes, max_raw_len: int = 1 << 31) -> bytes:
    """max_raw_len: sanity cap on the decoded size; the ORZT container
    passes its segment_size so corrupt headers can't trigger huge
    allocations (the format's true bound)."""
    lib = get_library()
    src = np.frombuffer(payload, dtype=np.uint8)
    raw_len = lib.otz_raw_len(src.ctypes.data, src.size)
    if raw_len < 0 or raw_len > max_raw_len:
        raise ValueError("invalid OTZ segment header")
    if raw_len == 0:
        return b""
    dst = np.empty(raw_len, dtype=np.uint8)
    rc = lib.otz_decode_segment(src.ctypes.data, src.size, dst.ctypes.data, dst.size)
    if rc < 0:
        raise ValueError(f"invalid OTZ segment (native decoder error {rc})")
    return dst.tobytes()
