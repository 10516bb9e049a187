"""ctypes bindings for the native HDR codec (native/src/hdr_codec.cc).

Builds libdrtpu.so on first use (g++, cached next to the source); io.py falls
back to imageio/OpenCV when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "hdr_codec.cc")
_SRC_EXR = os.path.join(_HERE, "src", "exr_codec.cc")
_LIB = os.path.join(_HERE, "libdrtpu.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _LIB,
         _SRC, _SRC_EXR, "-lz"],
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_EXR))
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < src_mtime:
            _build()
        lib = ctypes.CDLL(_LIB)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.rgbe_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(fp),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        lib.rgbe_read.restype = ctypes.c_int
        lib.rgbe_write.argtypes = [ctypes.c_char_p, fp, ctypes.c_int,
                                   ctypes.c_int]
        lib.rgbe_write.restype = ctypes.c_int
        lib.pfm_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(fp),
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
        lib.pfm_read.restype = ctypes.c_int
        lib.exr_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(fp),
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
        lib.exr_read.restype = ctypes.c_int
        lib.exr_write.argtypes = [ctypes.c_char_p, fp, ctypes.c_int,
                                  ctypes.c_int]
        lib.exr_write.restype = ctypes.c_int
        lib.drtpu_free.argtypes = [fp]
        _lib = lib
        return lib


def load(path: str) -> np.ndarray:
    """Load .hdr (RGBE), .exr (scanline OpenEXR) or .pfm to float32 (H, W, 3)."""
    lib = _load()
    fp = ctypes.POINTER(ctypes.c_float)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if path.lower().endswith(".exr"):
        rc = lib.exr_read(path.encode(), ctypes.byref(fp), ctypes.byref(w),
                          ctypes.byref(h))
        if rc != 0:
            raise ValueError(f"exr_read failed (code {rc}) for {path}")
        arr = np.ctypeslib.as_array(fp, shape=(h.value * w.value * 3,)).copy()
        lib.drtpu_free(fp)
        return arr.reshape(h.value, w.value, 3)
    if path.lower().endswith(".pfm"):
        c = ctypes.c_int()
        rc = lib.pfm_read(path.encode(), ctypes.byref(fp), ctypes.byref(w),
                          ctypes.byref(h), ctypes.byref(c))
        if rc != 0:
            raise ValueError(f"pfm_read failed (code {rc}) for {path}")
        n = w.value * h.value * c.value
        arr = np.ctypeslib.as_array(fp, shape=(n,)).copy()
        lib.drtpu_free(fp)
        arr = arr.reshape(h.value, w.value, c.value)
        if c.value == 1:
            arr = np.repeat(arr, 3, axis=-1)
        return arr
    rc = lib.rgbe_read(path.encode(), ctypes.byref(fp), ctypes.byref(w),
                       ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"rgbe_read failed (code {rc}) for {path}")
    arr = np.ctypeslib.as_array(fp, shape=(h.value * w.value * 3,)).copy()
    lib.drtpu_free(fp)
    return arr.reshape(h.value, w.value, 3)


def save_hdr(path: str, img: np.ndarray) -> None:
    """Write float32 (H, W, 3) as a Radiance .hdr file."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    assert c == 3, "RGBE writer expects 3 channels"
    rc = lib.rgbe_write(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w, h,
    )
    if rc != 0:
        raise ValueError(f"rgbe_write failed (code {rc}) for {path}")


def save_exr(path: str, img: np.ndarray) -> None:
    """Write float32 (H, W, 3) as a ZIP-compressed half-float OpenEXR file."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    assert c == 3, "EXR writer expects 3 channels"
    rc = lib.exr_write(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w, h,
    )
    if rc != 0:
        raise ValueError(f"exr_write failed (code {rc}) for {path}")


def load_batch(paths, num_threads: int = 4):
    """Decode many .hdr files concurrently on a native thread pool.

    Returns a list of (H, W, 3) float32 arrays; raises listing any file that
    failed.  Used for frame-sequence HDRI environments.
    """
    lib = _load()
    n = len(paths)
    if n == 0:
        return []
    fp = ctypes.POINTER(ctypes.c_float)
    lib.rgbe_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(fp), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.rgbe_read_batch.restype = ctypes.c_int

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (fp * n)()
    ws = (ctypes.c_int * n)()
    hs = (ctypes.c_int * n)()
    status = (ctypes.c_int * n)()
    lib.rgbe_read_batch(c_paths, n, num_threads, outs, ws, hs, status)

    results, failures = [], []
    for i in range(n):
        if status[i] != 0 or not outs[i]:
            failures.append((paths[i], status[i]))
            results.append(None)
            continue
        m = ws[i] * hs[i] * 3
        arr = np.ctypeslib.as_array(outs[i], shape=(m,)).copy()
        lib.drtpu_free(outs[i])
        results.append(arr.reshape(hs[i], ws[i], 3))
    if failures:
        raise ValueError(f"batch HDR load failures: {failures}")
    return results
