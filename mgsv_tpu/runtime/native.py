"""ctypes bindings + on-demand build for the native IO runtime.

Builds libmgsv_io.so from mgsv_tpu/runtime/mgsv_io.cc with g++ at first use
(cached next to the source; rebuilt when the source is newer).  Every entry
point degrades gracefully: if the toolchain or the build is unavailable the
callers fall back to numpy gathers.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger("mgsv_tpu.native")

_SRC = os.path.join(os.path.dirname(__file__), "mgsv_io.cc")
_SO = os.path.join(os.path.dirname(__file__), "libmgsv_io.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover
        logger.warning("native IO build failed (%s); using numpy fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        need_build = (not os.path.exists(_SO)
                      or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if need_build and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:  # pragma: no cover
            logger.warning("native IO load failed (%s)", e)
            _lib_failed = True
            return None
        lib.mgsv_open_store.restype = ctypes.c_void_p
        lib.mgsv_open_store.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64]
        lib.mgsv_close_store.argtypes = [ctypes.c_void_p]
        lib.mgsv_gather.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
        lib.mgsv_gather_f16_to_f32.argtypes = lib.mgsv_gather.argtypes
        lib.mgsv_prefetch_rows.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                           ctypes.c_int64]
        _lib = lib
        return _lib


def npy_data_offset(path: str) -> int:
    """Byte offset of the raw data inside a .npy file (v1/v2 headers)."""
    with open(path, "rb") as f:
        magic = f.read(8)
        assert magic[:6] == b"\x93NUMPY", f"not a npy file: {path}"
        major = magic[6]
        if major == 1:
            (hlen,) = np.frombuffer(f.read(2), "<u2")
            return 10 + int(hlen)
        (hlen,) = np.frombuffer(f.read(4), "<u4")
        return 12 + int(hlen)


class NativeStore:
    """Row-gatherable view over one packed .npy array file."""

    def __init__(self, path: str, shape, dtype):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.rows = self.shape[0]
        self.row_elems = int(np.prod(self.shape[1:], dtype=np.int64))
        self.row_bytes = self.row_elems * self.dtype.itemsize
        lib = get_lib()
        self._lib = lib
        self._handle = None
        if lib is not None:
            offset = npy_data_offset(path)
            handle = lib.mgsv_open_store(path.encode(), offset,
                                         self.rows, self.row_bytes)
            self._handle = handle or None
        if self._handle is None:
            self._mmap = np.load(path, mmap_mode="r")

    def gather(self, idx: np.ndarray, out_dtype=np.float32,
               threads: int = 0) -> np.ndarray:
        if out_dtype is None:
            out_dtype = self.dtype
        idx = np.ascontiguousarray(idx, np.int64)
        n = len(idx)
        if n and (idx.min() < 0 or idx.max() >= self.rows):
            # the native path is a raw memcpy — a bad index would segfault
            # the process instead of raising like numpy fancy-indexing
            raise IndexError(
                f"gather indices out of range [0, {self.rows}): "
                f"min={idx.min()} max={idx.max()}")
        threads = threads or min(4, os.cpu_count() or 1)
        if self._handle is not None:
            if self.dtype == np.float16 and np.dtype(out_dtype) == np.float32:
                out = np.empty((n, self.row_elems), np.float32)
                self._lib.mgsv_gather_f16_to_f32(
                    self._handle, idx.ctypes.data_as(ctypes.c_void_p), n,
                    out.ctypes.data_as(ctypes.c_void_p), threads)
                return out.reshape((n,) + self.shape[1:])
            out = np.empty((n, self.row_elems), self.dtype)
            self._lib.mgsv_gather(
                self._handle, idx.ctypes.data_as(ctypes.c_void_p), n,
                out.ctypes.data_as(ctypes.c_void_p), threads)
            out = out.reshape((n,) + self.shape[1:])
            return out.astype(out_dtype) if out.dtype != out_dtype else out
        return self._mmap[idx].astype(out_dtype)

    def prefetch(self, idx: np.ndarray) -> None:
        if self._handle is not None:
            idx = np.ascontiguousarray(idx, np.int64)
            self._lib.mgsv_prefetch_rows(
                self._handle, idx.ctypes.data_as(ctypes.c_void_p), len(idx))

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.mgsv_close_store(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
