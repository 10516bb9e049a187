"""Host-side image I/O: HDR/EXR loading with a native fast path.

Mirrors the reference's loader capabilities (LoadHDRImage node, nodes.py:312-332
and the imageio->cv2 fallback chain, preprocess_envmap.py:208-245):

1. our native C++ Radiance RGBE (.hdr) / PFM decoder (native/libdrtpu) when
   built — no Python in the inner pixel loop;
2. imageio;
3. OpenCV (notably for .exr).

Returns float32 numpy (H, W, 3); uint8/uint16 inputs are normalized to [0,1]
like the reference loader (preprocess_envmap.py:231-237).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")


def _native_load(path: str) -> Optional[np.ndarray]:
    try:
        from .native import rgbe

        return rgbe.load(path)
    except Exception:
        return None


def _imageio_load(path: str) -> Optional[np.ndarray]:
    try:
        import imageio.v3 as iio

        return np.asarray(iio.imread(path))
    except Exception:
        return None


def _cv2_load(path: str) -> Optional[np.ndarray]:
    try:
        import cv2

        img = cv2.imread(
            path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR
        )
        if img is None:
            return None
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except Exception:
        return None


def load_hdr_file(path: str) -> np.ndarray:
    """Load .hdr/.exr/.pfm/common formats to float32 (H, W, 3)."""
    img = None
    if path.lower().endswith((".hdr", ".pfm", ".exr")):
        img = _native_load(path)
    if img is None:
        img = _imageio_load(path)
    if img is None:
        img = _cv2_load(path)
    if img is None:
        raise ValueError(f"All loading methods failed for {path}")

    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)

    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    elif img.shape[-1] == 4:
        img = img[..., :3]
    elif img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img


def load_hdr_image(path: str) -> np.ndarray:
    """LoadHDRImage node equivalent (ref: nodes.py:312-332): returns a
    (1, H, W, 3) float32 array whose values may exceed 1."""
    return load_hdr_file(path)[None]
