"""ctypes bindings for the native C++ decode-ahead data loader.

``native/dataloader.cc`` provides the multithreaded PNG/JPEG prefetch
pipeline (the host-side native runtime component; the reference decodes
synchronously per frame, datasets/*.cc). Falls back gracefully when the
shared library hasn't been built — ``available()`` reports status and
``build()`` invokes make.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libnrslam_dataloader.so"
_lib = None


def build(force: bool = False) -> bool:
    """Compile the shared library via make. Returns success."""
    if _SO_PATH.exists() and not force:
        return True
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
        return _SO_PATH.exists()
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO_PATH.exists() and not build():
        raise RuntimeError("native dataloader not built (run make -C native)")
    lib = ctypes.CDLL(str(_SO_PATH))
    lib.dl_open.restype = ctypes.c_void_p
    lib.dl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                            ctypes.c_int, ctypes.c_int]
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int)]
    lib.dl_size.restype = ctypes.c_int
    lib.dl_size.argtypes = [ctypes.c_void_p]
    lib.dl_close.argtypes = [ctypes.c_void_p]
    lib.dl_decode.restype = ctypes.c_int
    lib.dl_decode.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def decode(path: str, max_pixels: int = 8 << 20) -> Optional[np.ndarray]:
    """Synchronously decode one image to float32 grayscale."""
    lib = _load()
    buf = np.empty(max_pixels, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    n = lib.dl_decode(path.encode(), buf.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)), max_pixels,
        ctypes.byref(h), ctypes.byref(w))
    if n <= 0:
        return None
    return buf[:n].reshape(h.value, w.value).copy()


class PrefetchLoader:
    """Iterate decoded frames with native decode-ahead workers."""

    def __init__(self, paths: Sequence[str], n_threads: int = 4,
                 capacity: int = 8, max_pixels: int = 8 << 20):
        self._lib = _load()
        arr = (ctypes.c_char_p * len(paths))(
            *[str(p).encode() for p in paths])
        self._handle = self._lib.dl_open(arr, len(paths), n_threads, capacity)
        self._buf = np.empty(max_pixels, np.float32)
        self._max_pixels = max_pixels
        self._n = len(paths)

    def __len__(self):
        return self._n

    def __iter__(self):
        while True:
            frame = self.next()
            if frame is None:
                return
            yield frame

    def next(self) -> Optional[np.ndarray]:
        h = ctypes.c_int()
        w = ctypes.c_int()
        n = self._lib.dl_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._max_pixels, ctypes.byref(h), ctypes.byref(w))
        if n <= 0:
            return None
        return self._buf[:n].reshape(h.value, w.value).copy()

    def close(self):
        if self._handle:
            self._lib.dl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
