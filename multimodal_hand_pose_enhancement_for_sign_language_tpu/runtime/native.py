"""ctypes binding + auto-build for the native OpenPose scanner.

The shared library is built once per environment with g++ (no network, no
pybind11) and cached next to the source; every API has a pure-Python
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "openpose_parser.cpp")
_LIB = os.path.join(_DIR, "_openpose_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    """Build to a process-unique temp file and atomically rename, so
    concurrent builds from ProcessPoolExecutor workers can't hand a
    partially-written .so to dlopen."""
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, _LIB)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.parse_openpose_frame.restype = ctypes.c_int
            lib.parse_openpose_frame.argtypes = [
                ctypes.c_char_p,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except OSError:
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def parse_openpose_frame_bytes(buf: bytes):
    """One frame's JSON bytes -> (body (75,), hands (126,)) float32, or
    None if the native library is unavailable (caller falls back to the
    Python json path)."""
    lib = _get_lib()
    if lib is None:
        return None
    body = np.empty(75, np.float32)
    rh = np.empty(63, np.float32)
    lh = np.empty(63, np.float32)
    rc = lib.parse_openpose_frame(
        buf,
        len(buf),
        body.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rh.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lh.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"native OpenPose parse failed with code {rc}")
    # match the Python json path's float64 rows so downstream pickles are
    # dtype-identical regardless of toolchain availability
    return body.astype(np.float64), np.concatenate([rh, lh]).astype(np.float64)
