"""ctypes bindings for the native runtime (native/compv_native.cpp).

Compiles on first import (g++ -O3 -shared); falls back to pure-Python
implementations if the toolchain is unavailable, so the package never hard-
fails. Public surface: AlignedPool, PrefetchLoader, copy_strided.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["native_available", "AlignedPool", "PrefetchLoader", "copy_strided"]

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "compv_native.cpp")
_SO = os.path.join(_ROOT, "native", "libcompv_native.so")
_lib = None
_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.compv_pool_create.restype = ctypes.c_void_p
        lib.compv_pool_create.argtypes = [ctypes.c_size_t]
        lib.compv_pool_alloc.restype = ctypes.c_void_p
        lib.compv_pool_alloc.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        lib.compv_pool_release.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.compv_pool_stats.restype = ctypes.c_uint64
        lib.compv_pool_stats.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.compv_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.compv_loader_open.restype = ctypes.c_void_p
        lib.compv_loader_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                          ctypes.c_int, ctypes.c_int]
        lib.compv_loader_num_frames.restype = ctypes.c_long
        lib.compv_loader_num_frames.argtypes = [ctypes.c_void_p]
        lib.compv_loader_next.restype = ctypes.c_long
        lib.compv_loader_next.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_uint8)]
        lib.compv_loader_close.argtypes = [ctypes.c_void_p]
        lib.compv_copy_strided.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_size_t]
        _lib = lib
        return lib


def native_available() -> bool:
    return _load() is not None


class AlignedPool:
    """Aligned host-buffer pool (reference CompVMem pool, compv_mem.h:36-91).
    Buffers are reused by size bucket; stats expose hit/miss counts."""

    def __init__(self, alignment: int = 64):
        self._lib = _load()
        self._pool = (self._lib.compv_pool_create(alignment)
                      if self._lib else None)
        self._fallback = {}

    def alloc(self, size: int) -> np.ndarray:
        if self._pool:
            ptr = self._lib.compv_pool_alloc(self._pool, size)
            buf = (ctypes.c_uint8 * size).from_address(ptr)
            return np.frombuffer(buf, np.uint8)
        return np.empty(size, np.uint8)

    def release(self, arr: np.ndarray) -> None:
        # the frombuffer view's data pointer IS the pool pointer
        if self._pool:
            self._lib.compv_pool_release(
                self._pool, ctypes.c_void_p(arr.ctypes.data))

    def stats(self) -> dict:
        if not self._pool:
            return {"hits": 0, "misses": 0, "blocks": 0, "bytes": 0}
        s = self._lib.compv_pool_stats
        return {"hits": s(self._pool, 0), "misses": s(self._pool, 1),
                "blocks": s(self._pool, 2), "bytes": s(self._pool, 3)}

    def close(self) -> None:
        if self._pool:
            self._lib.compv_pool_destroy(self._pool)
            self._pool = None


class PrefetchLoader:
    """Background-thread raw-frame loader (native double-buffered IO). Use
    for .yuv frame sequences feeding the device: the read happens on the C++
    thread while the previous frame computes."""

    def __init__(self, path: str, height: int, width: int, channels: int = 1,
                 depth: int = 4, loop: bool = False):
        self.shape = (height, width) if channels == 1 else (height, width, channels)
        self.frame_bytes = int(np.prod(self.shape))
        self._lib = _load()
        self._h = None
        self._py = None
        if self._lib:
            self._h = self._lib.compv_loader_open(
                path.encode(), self.frame_bytes, depth, int(loop))
        if not self._h:
            # pure-python fallback
            self._py = open(path, "rb")
            self._py_frames = os.path.getsize(path) // self.frame_bytes
            self._py_next = 0
            self._loop = loop

    def __len__(self):
        if self._h:
            return int(self._lib.compv_loader_num_frames(self._h))
        return self._py_frames

    def next(self) -> np.ndarray | None:
        buf = np.empty(self.frame_bytes, np.uint8)
        if self._h:
            idx = self._lib.compv_loader_next(
                self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if idx < 0:
                return None
            return buf.reshape(self.shape)
        if self._py_next >= self._py_frames:
            if not self._loop:
                return None
            self._py.seek(0)
            self._py_next = 0
        data = self._py.read(self.frame_bytes)
        self._py_next += 1
        return np.frombuffer(data, np.uint8).reshape(self.shape)

    def __iter__(self):
        while True:
            f = self.next()
            if f is None:
                return
            yield f

    def close(self):
        if self._h:
            self._lib.compv_loader_close(self._h)
            self._h = None
        if self._py:
            self._py.close()


def copy_strided(src: np.ndarray, src_stride: int, dst: np.ndarray,
                 dst_stride: int, row_bytes: int, rows: int) -> None:
    """Stride-removal copy (reference CompVImage::wrap)."""
    lib = _load()
    if lib:
        lib.compv_copy_strided(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), src_stride,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dst_stride,
            row_bytes, rows)
        return
    for r in range(rows):
        dst[r * dst_stride: r * dst_stride + row_bytes] = \
            src[r * src_stride: r * src_stride + row_bytes]
