"""ctypes loaders for the native host-side cores (native/*.cpp).

- topo_core: topological-map / metrics hot paths (APSP relax, pairwise
  assembly, exact DTW).
- io_core: observation-feed hot paths (parallel shared-memory gather).

Both build lazily with make/g++ on first use and cache the .so; every
entry point has a numpy fallback so the framework runs without a
toolchain.
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


_IO_SO_PATH = os.path.join(_NATIVE_DIR, "libio_core.so")
_io_lib = None
_io_tried = False


def get_io_lib() -> Optional[ctypes.CDLL]:
    global _io_lib, _io_tried
    with _lock:
        if _io_lib is not None or _io_tried:
            return _io_lib
        _io_tried = True
        if not os.path.exists(_IO_SO_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_IO_SO_PATH)
        lib.gather_copy.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32]
        lib.gather_copy.restype = None
        _io_lib = lib
        return _io_lib


def gather_copy(srcs, out: np.ndarray, nthreads: int = 0) -> bool:
    """Parallel memcpy of `srcs` into consecutive segments of `out`.

    The sources' total nbytes must equal out.nbytes (out is treated as a
    flat byte buffer; the caller owns the layout contract, e.g.
    out (N, *s) filled from N sources of shape (*s)). Returns False when
    the native lib is unavailable — caller falls back to numpy."""
    lib = get_io_lib()
    if lib is None:
        return False
    n = len(srcs)
    ptrs = (ctypes.c_void_p * n)()
    sizes = np.empty(n, np.int64)
    total = 0
    for i, a in enumerate(srcs):
        assert a.flags.c_contiguous, "gather_copy sources must be C-contig"
        ptrs[i] = a.ctypes.data
        sizes[i] = a.nbytes
        total += a.nbytes
    assert out.flags.c_contiguous and out.nbytes == total, \
        f"gather_copy layout mismatch: {out.nbytes} != {total}"
    lib.gather_copy(ptrs, _ptr(sizes, ctypes.c_int64),
                    out.ctypes.data_as(ctypes.c_void_p), n, nthreads)
    return True


def stack_arrays(arrays, out: Optional[np.ndarray] = None) -> np.ndarray:
    """np.stack with the native parallel gather when available — the
    parent-side batch assembly for shm observation views
    (etpnav_tpu/env/shm_transport.py)."""
    a0 = arrays[0]
    if out is None:
        out = np.empty((len(arrays),) + a0.shape, a0.dtype)
    srcs = [np.ascontiguousarray(a, out.dtype) for a in arrays]
    if not gather_copy(srcs, out):
        for i, a in enumerate(srcs):
            out[i] = a
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
