"""ctypes bindings for the native host data path (``ptidata.cpp``).

Builds lazily with g++ on first import (cached as ``libptidata.so`` next to
the source); every entry point has a Python fallback, so environments without
a toolchain lose only host-side throughput, never functionality.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "preprocess_tiff", "decode_tiff", "build"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ptidata.cpp")
_LIB = os.path.join(_DIR, "libptidata.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> str | None:
    """Compile the shared library; returns its path or None on failure."""
    if os.path.exists(_LIB) and not force and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.pti_tiff_probe.restype = ctypes.c_int
        lib.pti_tiff_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.pti_tiff_decode_f32.restype = ctypes.c_int
        lib.pti_tiff_decode_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ]
        lib.pti_preprocess.restype = ctypes.c_int
        lib.pti_preprocess.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_tiff(path: str) -> np.ndarray | None:
    """Native TIFF decode -> float32 [H, W]; None when unsupported."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as fh:
        buf = fh.read()
    h = ctypes.c_uint32()
    w = ctypes.c_uint32()
    if lib.pti_tiff_probe(buf, len(buf), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value), dtype=np.float32)
    rc = lib.pti_tiff_decode_f32(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size
    )
    return out if rc == 0 else None


def preprocess_tiff(path: str, patch_size: tuple[int, int]) -> np.ndarray | None:
    """Fused native decode + area resize + mask z-score -> [H, W, 1] f32;
    None when the file needs the Python fallback."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as fh:
        buf = fh.read()
    h_out, w_out = int(patch_size[0]), int(patch_size[1])
    out = np.empty((h_out, w_out), dtype=np.float32)
    rc = lib.pti_preprocess(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h_out, w_out
    )
    return out[..., None] if rc == 0 else None
