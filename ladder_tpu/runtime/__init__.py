"""Native runtime: ctypes binding for the C++ TFRecord batch reader.

Builds libtfrecord.so from tfrecord_reader.cc on first use (g++, cached next
to the source). Falls back cleanly when no compiler is available — callers
check `native_available()` and use the pure-Python reader otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tfrecord_reader.cc")
_LIB = os.path.join(_HERE, "libtfrecord.so")

_lib = None
_build_lock = threading.Lock()
_build_failed = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-msse4.2",  # hardware crc32c (guarded by __SSE4_2__ in the .cc)
           "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _build_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.isfile(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.ldr_open.restype = ctypes.c_void_p
            lib.ldr_open.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                     ctypes.c_char_p, ctypes.c_int]
            lib.ldr_count.restype = ctypes.c_long
            lib.ldr_count.argtypes = [ctypes.c_void_p]
            lib.ldr_read_batch.restype = ctypes.c_long
            lib.ldr_read_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
                ctypes.c_long, ctypes.POINTER(ctypes.c_ubyte)]
            lib.ldr_close.argtypes = [ctypes.c_void_p]
            lib.ldr_crc32c.restype = ctypes.c_uint32
            lib.ldr_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_long]
            _lib = lib
        except Exception as e:  # pragma: no cover - no-compiler environments
            print(f"native tfrecord reader unavailable ({e}); "
                  "using the pure-Python path")
            _build_failed = True
    return _lib


def native_available():
    return _load() is not None


def native_crc32c(data):
    """Hardware CRC32C of a bytes object, or None when the native library
    is unavailable (callers fall back to the pure-Python table loop)."""
    lib = _load()
    if lib is None:
        return None
    return int(lib.ldr_crc32c(data, len(data)))


class NativeImageRecordReader:
    """Drop-in counterpart of data.tfrecord.ImageRecordReader backed by the
    C++ library (parallel batch decode)."""

    def __init__(self, path, shape, key="X", n_threads=None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native reader unavailable")
        self._lib = lib
        self.shape = tuple(shape)
        self.image_bytes = int(np.prod(shape))
        n_threads = n_threads or min(os.cpu_count() or 4, 8)
        self._handle = lib.ldr_open(path.encode(), self.image_bytes,
                                    key.encode(), n_threads)
        if not self._handle:
            raise IOError(f"cannot open {path}")
        self.n = int(lib.ldr_count(self._handle))

    def __len__(self):
        return self.n

    def read_batch(self, idxs):
        idxs = np.ascontiguousarray(idxs, dtype=np.int64)
        n = len(idxs)
        out = np.empty((n, self.image_bytes), dtype=np.uint8)
        ok = self._lib.ldr_read_batch(
            self._handle,
            idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if ok != n:
            raise IOError(f"decoded {ok}/{n} records")
        return out.reshape((n,) + self.shape)

    def read(self, i):
        return self.read_batch([i])[0]

    def close(self):
        if self._handle:
            self._lib.ldr_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
