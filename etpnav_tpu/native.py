"""ctypes loader for the native host-side core (native/topo_core.cpp).

Builds lazily with make/g++ on first use and caches the .so; every entry
point has a numpy fallback so the framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtopo_core.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native build failed (%s); using numpy fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_SO_PATH)
        c_d = ctypes.POINTER(ctypes.c_double)
        c_i32 = ctypes.POINTER(ctypes.c_int32)
        c_i64 = ctypes.POINTER(ctypes.c_int64)
        lib.apsp_relax_edge.argtypes = [c_d, c_i32, c_i32, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_double]
        lib.apsp_relax_edge.restype = None
        lib.pairwise_assemble.argtypes = [c_d, ctypes.c_int64, c_i64, c_d,
                                          ctypes.c_int64, ctypes.c_double,
                                          c_d]
        lib.pairwise_assemble.restype = None
        lib.dtw.argtypes = [c_d, ctypes.c_int64, c_d, ctypes.c_int64]
        lib.dtw.restype = ctypes.c_double
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def apsp_relax_edge(D: np.ndarray, H: np.ndarray, Nx: np.ndarray,
                    u: int, v: int, w: float) -> bool:
    """Native in-place edge relax; returns False if native lib missing."""
    lib = get_lib()
    if lib is None:
        return False
    assert D.flags.c_contiguous and H.flags.c_contiguous \
        and Nx.flags.c_contiguous
    lib.apsp_relax_edge(_ptr(D, ctypes.c_double), _ptr(H, ctypes.c_int32),
                        _ptr(Nx, ctypes.c_int32), D.shape[0], u, v, w)
    return True


def pairwise_assemble(D: np.ndarray, anchors: np.ndarray,
                      offsets: np.ndarray, scale: float
                      ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    m = len(anchors)
    out = np.zeros((m, m), np.float64)
    anchors = np.ascontiguousarray(anchors, np.int64)
    offsets = np.ascontiguousarray(offsets, np.float64)
    lib.pairwise_assemble(_ptr(D, ctypes.c_double), D.shape[0],
                          _ptr(anchors, ctypes.c_int64),
                          _ptr(offsets, ctypes.c_double), m, scale,
                          _ptr(out, ctypes.c_double))
    return out


def dtw(a: np.ndarray, b: np.ndarray) -> Optional[float]:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    assert a.shape[1] == 3 and b.shape[1] == 3
    return float(lib.dtw(_ptr(a, ctypes.c_double), a.shape[0],
                         _ptr(b, ctypes.c_double), b.shape[0]))
