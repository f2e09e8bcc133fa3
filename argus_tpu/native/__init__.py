"""Native (C++) input-feed runtime: batched PNG decode + crop via libpng.

Builds `loader.cpp` into a shared library on first use (g++, cached next to the
source) and exposes it through ctypes. Falls back cleanly when a toolchain or
libpng is unavailable — `available()` reports which path is active, and
`argus_tpu.data.dataset.HostDataLoader` uses the native batch decoder when present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_LIB_PATH = os.path.join(_HERE, "_build", "libargusloader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-lpng", "-lz", "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        path = _LIB_PATH
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(_SRC):
            path = _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _build_failed = True
            return None
        lib.argus_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.argus_decode_batch.restype = ctypes.c_int
        lib.argus_png_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.argus_png_size.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native decoder built/loaded successfully."""
    return _load() is not None


def png_size(path: str) -> Tuple[int, int]:
    """(height, width) of a PNG without decoding pixels."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.argus_png_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise FileNotFoundError(f"failed to read PNG header: {path}")
    return h.value, w.value


def decode_batch(
    paths: Sequence[str],
    crop_hw: Tuple[int, int],
    n_threads: int = 8,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode + center-crop a batch of PNGs -> uint8 (n, crop_h, crop_w, 3).

    One C call; the thread pool lives inside the library (no GIL involvement).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    ch, cw = crop_hw
    if out is None:
        out = np.empty((n, ch, cw, 3), np.uint8)
    assert out.flags["C_CONTIGUOUS"] and out.shape == (n, ch, cw, 3)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.argus_decode_batch(
        arr, n, ch, cw, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads
    )
    if rc != 0:
        raise IOError(f"native PNG decode failed with code {rc} (first failing image zeroed)")
    return out
