"""Native (C++) runtime components, loaded via ctypes.

Built on demand with g++ (no pybind11 in this image); a missing toolchain
degrades gracefully to the pure-Python paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvda_native.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_DIR, "exr_codec.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", _SO, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load():
    """-> ctypes lib or None when native build is unavailable.

    A prebuilt .so is used as-is when the source is missing (installed
    package without sources) or when a staleness rebuild fails (no g++ on
    this machine) — graceful degradation must never discard a loadable
    library, and a missing source must not raise.
    """
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_DIR, "exr_codec.cpp")
        have_so = os.path.exists(_SO)
        stale = (have_so and os.path.exists(src)
                 and os.path.getmtime(_SO) < os.path.getmtime(src))
        if (not have_so or stale) and not _build() and not have_so:
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.vda_write_exr_z.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.vda_write_exr_z.restype = ctypes.c_int
        lib.vda_write_exr_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.vda_write_exr_batch.restype = ctypes.c_int
        lib.vda_exr_unzip.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64]
        lib.vda_exr_unzip.restype = ctypes.c_int64
        _LIB = lib
        return _LIB
