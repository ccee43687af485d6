"""ctypes bindings for the native IO runtime (native/dynoio.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the
source) and exposes the fast parsers + the prefetcher. Every entry point has
a pure-Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "dynoio.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libdynoio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.dynoio_read_flo.restype = ctypes.c_int
        lib.dynoio_read_txt_mask.restype = ctypes.c_int
        lib.dynoio_prefetcher_create.restype = ctypes.c_void_p
        lib.dynoio_prefetcher_create.argtypes = [ctypes.c_int]
        lib.dynoio_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        lib.dynoio_prefetcher_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.dynoio_prefetcher_collect.restype = ctypes.c_int
        lib.dynoio_prefetcher_collect.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# Parsers (native with Python fallback)
# ---------------------------------------------------------------------------

def read_flo(path: str, h: int, w: int) -> np.ndarray:
    lib = get_lib()
    if lib is not None:
        out = np.empty((h, w, 2), np.float32)
        rc = lib.dynoio_read_flo(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w,
        )
        if rc == 0:
            return out
        raise ValueError(f"dynoio_read_flo({path}) failed: {rc}")
    from dynosam_tpu.dataproviders.kitti import read_flo as py_read_flo

    return py_read_flo(path)


def read_txt_mask(path: str, h: int, w: int) -> np.ndarray:
    lib = get_lib()
    if lib is not None:
        out = np.empty((h, w), np.int32)
        rc = lib.dynoio_read_txt_mask(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            h, w,
        )
        if rc == 0:
            return out
        raise ValueError(f"dynoio_read_txt_mask({path}) failed: {rc}")
    return np.loadtxt(path, dtype=np.int32)


def disparity_to_depth(raw: np.ndarray, base_line: float, scale: float) -> np.ndarray:
    lib = get_lib()
    raw = np.ascontiguousarray(raw, np.uint16)
    if lib is not None:
        out = np.empty(raw.shape, np.float32)
        lib.dynoio_disparity_to_depth(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(raw.size), ctypes.c_float(base_line), ctypes.c_float(scale),
        )
        return out
    with np.errstate(divide="ignore"):
        return np.where(raw > 0, base_line / (raw / scale), 0.0).astype(np.float32)


class Prefetcher:
    """Native worker-pool prefetcher for (flow, mask) frame pairs."""

    def __init__(self, n_workers: int = 2):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native dynoio unavailable")
        self._lib = lib
        self._handle = lib.dynoio_prefetcher_create(n_workers)

    def submit(self, frame: int, flo_path: Optional[str], mask_path: Optional[str],
               h: int, w: int):
        self._lib.dynoio_prefetcher_submit(
            self._handle, frame,
            flo_path.encode() if flo_path else None,
            mask_path.encode() if mask_path else None,
            h, w,
        )

    def collect(self, frame: int, h: int, w: int, want_flow=True, want_mask=True):
        flow = np.empty((h, w, 2), np.float32) if want_flow else None
        mask = np.empty((h, w), np.int32) if want_mask else None
        rc = self._lib.dynoio_prefetcher_collect(
            self._handle, frame,
            flow.ctypes.data_as(ctypes.c_void_p) if flow is not None else None,
            mask.ctypes.data_as(ctypes.c_void_p) if mask is not None else None,
        )
        if rc != 0:
            raise ValueError(f"prefetcher job for frame {frame} failed: {rc}")
        return flow, mask

    def close(self):
        if self._handle:
            self._lib.dynoio_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
