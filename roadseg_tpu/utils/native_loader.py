"""ctypes bindings for the native C++ PNG batch loader (``native/``).

Decodes a directory's PNGs with a multithreaded libpng pipeline straight
into one contiguous [N, H, W, C] uint8 array — one host->device transfer,
no per-image Python overhead. Falls back transparently to PIL in
``images_io.load`` when the shared library isn't built or a decode fails.

Build once with ``make -C native`` — or let this module build it on first
use (g++ is in the image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libroadseg_io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                               check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.roadseg_probe_png.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32)]
            lib.roadseg_probe_png.restype = ctypes.c_int
            lib.roadseg_load_png_batch.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
                ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
            lib.roadseg_load_png_batch.restype = ctypes.c_int
            _lib = lib
        except Exception as e:  # missing toolchain/libpng -> PIL fallback
            print(f"native loader unavailable ({e}); using PIL")
            _lib_failed = True
        return _lib


def available() -> bool:
    return _load_library() is not None


def load_png_batch(paths: List[str], threads: int = 0) -> np.ndarray:
    """Decode PNGs (all same shape) into one uint8 [N, H, W, C] / [N, H, W].

    Raises RuntimeError on any decode problem (caller falls back to PIL).
    """
    lib = _load_library()
    if lib is None:
        raise RuntimeError("native loader not available")
    if not paths:
        return np.zeros((0,), np.uint8)

    h = ctypes.c_uint32()
    w = ctypes.c_uint32()
    c = ctypes.c_uint32()
    rc = lib.roadseg_probe_png(paths[0].encode(), ctypes.byref(h),
                               ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise RuntimeError(f"probe failed for {paths[0]} (rc={rc})")
    n = len(paths)
    out = np.empty((n, h.value, w.value, c.value), np.uint8)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    err = ctypes.create_string_buffer(512)
    if threads <= 0:
        threads = min(n, os.cpu_count() or 1)
    rc = lib.roadseg_load_png_batch(
        blob, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h.value, w.value, c.value, threads, err, len(err))
    if rc != 0:
        raise RuntimeError(err.value.decode())
    if c.value == 1:
        out = out[..., 0]
    return out
