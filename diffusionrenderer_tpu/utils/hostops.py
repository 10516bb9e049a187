"""Host-side bulk tensor conversions, routed through torch.

This environment's numpy executes elementwise kernels essentially scalar
(measured on a 57f x 704x1280 video, single core: uint8->fp32 astype 115 s,
fp32 `*2-1` 86 s, strided transpose+copy 63 s).  torch's CPU kernels are
vectorized and do the same work in well under a second, so every full-res
host conversion goes through torch; numpy stays the interchange type at the
API boundary.  (The reference also uses torch for host-side tensor prep —
nodes.py:154-186.)
"""

from __future__ import annotations

import warnings

import numpy as np
import torch

# Non-writable inputs (e.g. broadcast views) are safe here: every function's
# first torch op copies (dtype-changing .to / out-of-place mul) before any
# in-place op runs — suppress torch's blanket warning.
warnings.filterwarnings(
    "ignore", message="The given NumPy array is not writable"
)


def u8_to_unit_float(arr: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [0, 1]."""
    return torch.from_numpy(np.ascontiguousarray(arr)).to(
        torch.float32).div_(255.0).numpy()


def to_signed_range(arr: np.ndarray) -> np.ndarray:
    """[0, 1] float -> [-1, 1] float32 (ref: nodes.py:183)."""
    t = torch.from_numpy(np.ascontiguousarray(arr))
    if t.dtype != torch.float32:
        t = t.to(torch.float32)
    return t.mul(2.0).sub_(1.0).numpy()


def to_float32(arr) -> np.ndarray:
    """Any dtype -> contiguous float32 (vectorized cast)."""
    arr = np.asarray(arr)
    if arr.dtype == np.float32 and arr.flags.c_contiguous:
        return arr
    return torch.from_numpy(np.ascontiguousarray(arr)).to(
        torch.float32).numpy()


def to_bfloat16(arr: np.ndarray) -> np.ndarray:
    """float -> ml_dtypes.bfloat16 numpy array, cast by torch.

    numpy's own bfloat16 cast (ml_dtypes) is software-emulated and ~40 s
    for a flagship video; torch's vectorized cast is < 1 s.  numpy cannot
    hold torch bf16 directly, so the bits round-trip through int16."""
    import ml_dtypes

    t = torch.from_numpy(np.ascontiguousarray(np.asarray(arr)))
    if t.dtype != torch.float32:
        t = t.to(torch.float32)
    return t.to(torch.bfloat16).view(torch.int16).numpy().view(
        ml_dtypes.bfloat16)
