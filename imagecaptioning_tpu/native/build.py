"""Build + ctypes bindings for the native fastloader library.

No pybind11 in the image, so the binding layer is plain ctypes over an
`extern "C"` surface; the .so is compiled on first use with g++ -O3 and
cached next to the source (or $IMAGECAPTIONING_TPU_CACHE). All entry
points degrade to numpy fallbacks when the toolchain or build fails —
the native path is a performance feature, not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "fastloader.cpp")


def _cache_dir() -> str:
    d = os.environ.get("IMAGECAPTIONING_TPU_CACHE") or os.path.dirname(__file__)
    os.makedirs(d, exist_ok=True)
    return d


def ensure_built(verbose: bool = False) -> Optional[ctypes.CDLL]:
    """Compile (once) and dlopen the fastloader; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so_path = os.path.join(_cache_dir(), "libfastloader.so")
        try:
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
                cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                       "-pthread", "-std=c++17", _SRC, "-o", so_path]
                subprocess.run(cmd, check=True, capture_output=not verbose)
            lib = ctypes.CDLL(so_path)
            lib.gather_records.restype = ctypes.c_int
            lib.gather_records.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int]
            lib.gather_images_cropped.restype = ctypes.c_int
            lib.gather_images_cropped.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int]
            _LIB = lib
        except (OSError, subprocess.CalledProcessError) as e:  # no toolchain
            if verbose:
                print(f"fastloader build failed ({e}); using numpy fallback")
            _LIB = None
        return _LIB


def is_available() -> bool:
    return ensure_built() is not None


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def gather_records(src: np.ndarray, indices: np.ndarray,
                   out: Optional[np.ndarray] = None,
                   num_threads: int = 8) -> np.ndarray:
    """out[b] = src[indices[b]] over the leading axis, multi-threaded.
    src must be C-contiguous; falls back to numpy fancy indexing."""
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    lib = ensure_built()
    if lib is None or src.dtype != np.uint8:
        res = src[idx]
        if out is not None:
            out[...] = res
            return out
        return res
    b = idx.shape[0]
    if out is None:
        out = np.empty((b,) + src.shape[1:], dtype=src.dtype)
    record_bytes = int(np.prod(src.shape[1:])) * src.itemsize
    rc = lib.gather_records(_as_c(src), src.shape[0], record_bytes,
                            _as_c(idx), b, _as_c(out), num_threads)
    if rc != 0:
        raise ValueError("gather_records: bad arguments")
    return out


def gather_images_cropped(src: np.ndarray, indices: np.ndarray,
                          crop_h: np.ndarray, crop_w: np.ndarray,
                          out: Optional[np.ndarray] = None,
                          num_threads: int = 8) -> np.ndarray:
    """Gather uint8 (N, H, W, C) images, keeping only each record's
    (crop_h, crop_w) window and zeroing the padding."""
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    ch = np.ascontiguousarray(crop_h, dtype=np.int64)
    cw = np.ascontiguousarray(crop_w, dtype=np.int64)
    b = idx.shape[0]
    n, h, w, c = src.shape
    lib = ensure_built()
    if lib is None or src.dtype != np.uint8:
        res = np.zeros((b, h, w, c), dtype=src.dtype)
        for i, j in enumerate(idx):
            res[i, :ch[i], :cw[i]] = src[j, :ch[i], :cw[i]]
        if out is not None:
            out[...] = res
            return out
        return res
    if out is None:
        out = np.empty((b, h, w, c), dtype=np.uint8)
    rc = lib.gather_images_cropped(_as_c(src), n, h, w, c, _as_c(idx),
                                   _as_c(ch), _as_c(cw), b, _as_c(out),
                                   num_threads)
    if rc != 0:
        raise ValueError("gather_images_cropped: bad arguments")
    return out
