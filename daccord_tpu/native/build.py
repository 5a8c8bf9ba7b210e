"""Build/load the native host library (g++ -O3, cached .so, ctypes ABI)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "realign.cpp"),
         os.path.join(_DIR, "cpu_consensus.cpp")]
_SO = os.path.join(_DIR, "librealign.so")


def _build() -> bool:
    try:
        src_m = max(os.path.getmtime(s) for s in _SRCS)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_m:
            return True
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", _SO + ".tmp"] + _SRCS + ["-lpthread"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib():
    """ctypes handle to librealign.so, or None (numpy fallback)."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.bpos_at_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.bpos_at_batch.restype = None
            lib.ops_count_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.ops_count_batch.restype = None
            lib.ops_count_rows.argtypes = lib.ops_count_batch.argtypes
            lib.ops_count_rows.restype = None
            lib.stitch_jstar_runs.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.stitch_jstar_runs.restype = None
            lib.ragged_gather_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.ragged_gather_rows.restype = None
            lib.cpu_consensus_batch.argtypes = (
                [ctypes.c_void_p] * 7
                + [ctypes.c_int64] * 11
                + [ctypes.c_void_p] * 3 + [ctypes.c_int64])
            lib.cpu_consensus_batch.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib
