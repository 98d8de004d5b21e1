"""ctypes bindings for the native async snapshot writer
(native/snapwriter.cpp; SURVEY.md §3 C16).

The shared library is built on demand with g++ (no pip deps) and cached
under native/.  Falls back cleanly: callers check `available()` and use
the synchronous NumPy path otherwise (io/snapshots.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_ROOT, "snapwriter.cpp"))
_SO = os.path.abspath(os.path.join(_ROOT, "libsnapwriter.so"))

_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.sw_open.restype = ctypes.c_void_p
        lib.sw_open.argtypes = [ctypes.c_size_t]
        lib.sw_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_void_p, ctypes.c_size_t]
        lib.sw_flush.argtypes = [ctypes.c_void_p]
        lib.sw_errors.restype = ctypes.c_long
        lib.sw_errors.argtypes = [ctypes.c_void_p]
        lib.sw_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class AsyncWriter:
    """Queue raw buffers for a background writer thread.

    submit() copies the buffer and returns immediately; flush() blocks
    until everything queued so far is on disk.
    """

    def __init__(self, max_queued_bytes: int = 1 << 30):
        lib = _load()
        if lib is None:
            raise RuntimeError("native snapwriter unavailable "
                               "(g++ build failed)")
        self._lib = lib
        self._h = lib.sw_open(max_queued_bytes)

    def submit(self, path: str, arr: np.ndarray) -> None:
        a = np.ascontiguousarray(arr)
        self._lib.sw_submit(self._h, path.encode(),
                            a.ctypes.data_as(ctypes.c_void_p), a.nbytes)

    def flush(self) -> None:
        self._lib.sw_flush(self._h)

    @property
    def errors(self) -> int:
        return int(self._lib.sw_errors(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.sw_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
