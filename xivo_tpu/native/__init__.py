"""Native (C++) IO runtime: build-on-demand + ctypes bindings.

See xivo_io.cpp for what lives here (csv parse, PGM decode, SPSC image
prefetcher — the host-runtime pieces that are native C++ in the
reference). Falls back to the pure-Python io/loader.py paths when a
compiler is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "xivo_io.cpp")
_SO = os.path.join(_HERE, "libxivo_io.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) > os.path.getmtime(
            _SRC):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO, "-lz"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            path = _build()
        except Exception:
            return None
        lib = ctypes.CDLL(path)
        lib.xivo_parse_imu_csv.restype = ctypes.c_int
        lib.xivo_parse_imu_csv.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int]
        lib.xivo_load_pgm.restype = ctypes.c_int
        lib.xivo_load_pgm.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.xivo_load_image.restype = ctypes.c_int
        lib.xivo_load_image.argtypes = lib.xivo_load_pgm.argtypes
        lib.xivo_prefetcher_create.restype = ctypes.c_void_p
        lib.xivo_prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.xivo_prefetcher_next.restype = ctypes.c_int
        lib.xivo_prefetcher_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.xivo_prefetcher_destroy.restype = None
        lib.xivo_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def parse_imu_csv(path: str, max_rows: int = 1_000_000):
    """(N, 7) array [ts_s, gx, gy, gz, ax, ay, az] via the native parser."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty((max_rows, 7), np.float64)
    n = lib.xivo_parse_imu_csv(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows)
    if n < 0:
        raise IOError(f"failed to open {path}")
    return out[:n].copy()


def load_pgm(path: str, max_pixels: int = 4096 * 4096):
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.empty((max_pixels,), np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    st = lib.xivo_load_pgm(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_pixels, ctypes.byref(w), ctypes.byref(h))
    if st != 0:
        raise IOError(f"pgm decode failed ({st}) for {path}")
    return buf[:w.value * h.value].reshape(h.value, w.value).copy()


def load_image(path: str, max_pixels: int = 4096 * 4096):
    """Native grayscale decode, PGM or PNG by extension (cv::imread
    IMREAD_GRAYSCALE analogue; PNG via zlib, BT.601 luma for color)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.empty((max_pixels,), np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    st = lib.xivo_load_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_pixels, ctypes.byref(w), ctypes.byref(h))
    if st != 0:
        raise IOError(f"image decode failed ({st}) for {path}")
    return buf[:w.value * h.value].reshape(h.value, w.value).copy()


class ImagePrefetcher:
    """Background-thread image decoder (EstimatorProcess/SPSC analogue)."""

    def __init__(self, paths, capacity: int = 8,
                 max_pixels: int = 2048 * 2048):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._max_pixels = max_pixels
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._handle = lib.xivo_prefetcher_create(arr, len(paths),
                                                  capacity, max_pixels)
        self._n = len(paths)
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= self._n:
            raise StopIteration
        buf = np.empty((self._max_pixels,), np.float32)
        w = ctypes.c_int()
        h = ctypes.c_int()
        st = self._lib.xivo_prefetcher_next(
            self._handle,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(w), ctypes.byref(h))
        self._i += 1
        if st == -100:
            raise StopIteration
        if st != 0:
            raise IOError(f"decode failed ({st})")
        return buf[:w.value * h.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._handle:
            self._lib.xivo_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
