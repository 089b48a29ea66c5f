"""ctypes loader for the native runtime library (csrc/brt_native.cpp).

Builds lazily with `make -C csrc` on first use (g++ is part of the
toolchain); callers fall back to pure Python if the build is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "build", "libbrt_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def load():
    """Return the loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO):
                subprocess.run(
                    ["make", "-C", _CSRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.brt_tonemap_srgb.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            for fn in (lib.brt_write_png, lib.brt_write_ppm):
                fn.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                fn.restype = ctypes.c_int
            lib.brt_write_exr.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.brt_write_exr.restype = ctypes.c_int
            lib.brt_assemble_tiles.argtypes = [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.brt_writer_create.argtypes = [ctypes.c_int]
            lib.brt_writer_create.restype = ctypes.c_void_p
            lib.brt_writer_submit.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.brt_writer_submit.restype = ctypes.c_int
            lib.brt_writer_wait.argtypes = [ctypes.c_void_p]
            lib.brt_writer_wait.restype = ctypes.c_int
            lib.brt_writer_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib
