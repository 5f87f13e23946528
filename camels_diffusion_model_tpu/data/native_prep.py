"""ctypes bindings for the native (C++) host-side data-prep library.

``native/camels_prep.cpp`` provides multithreaded fused implementations of
the map-normalization reductions and the torch-semantics bilinear resize (the
host-side cost of job startup on a full 15000x256x256 CAMELS stack).  This
module loads the shared library, building it on first use if a toolchain is
present, and transparently falls back to the numpy implementations in
``data.pipeline`` when no library can be produced.

Use :func:`available` to check, :func:`normalize_maps_native` /
:func:`resize_maps_native` to run.  Parity with the numpy path is covered by
tests/test_native_prep.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcamels_prep.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if os.environ.get("CAMELS_NO_NATIVE") == "1":
                return None
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.camels_minmax.argtypes = [f32p, ctypes.c_int64, f32p, f32p]
        lib.camels_normalize.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ]
        lib.camels_resize_bilinear.argtypes = [
            f32p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def minmax_native(data: np.ndarray):
    lib = _load()
    assert lib is not None
    data = np.ascontiguousarray(data, np.float32)
    lo = ctypes.c_float()
    hi = ctypes.c_float()
    lib.camels_minmax(
        _ptr(data), data.size, ctypes.byref(lo), ctypes.byref(hi)
    )
    return float(lo.value), float(hi.value)


def normalize_maps_native(raw: np.ndarray) -> np.ndarray:
    """"code"-style normalization (shift/max/log10/minmax -> [0,1]) using the
    fused multithreaded C++ path; float32 output."""
    lib = _load()
    assert lib is not None
    data = np.ascontiguousarray(raw, np.float32)
    lo, hi = minmax_native(data)
    shift = (-lo + 1e-8) if lo <= 0 else 0.0
    max_val = hi + shift
    out = np.empty_like(data)
    lib.camels_normalize(_ptr(data), _ptr(out), data.size, shift, max_val)
    return out


def resize_maps_native(maps: np.ndarray, size: int) -> np.ndarray:
    """Bilinear (torch align_corners=False) resize of a (B, H, W) stack."""
    lib = _load()
    assert lib is not None
    maps = np.ascontiguousarray(maps, np.float32)
    b, h, w = maps.shape
    out = np.empty((b, size, size), np.float32)
    lib.camels_resize_bilinear(_ptr(maps), _ptr(out), b, h, w, size, size)
    return out
