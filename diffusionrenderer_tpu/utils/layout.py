"""Layout helpers between the reference's torch NCTHW and our NTHWC.

The framework's canonical video tensor layout is channels-last
(B, T, H, W, C): C maps onto TPU lanes, T/H/W tile onto sublanes, and XLA's
convolution + reshape handling strongly prefers it.  The reference uses torch
(B, C, T, H, W) everywhere (e.g. /root/reference/nodes.py:182,
diffusion_renderer_pipeline.py:274).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ncthw_to_nthwc(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def nthwc_to_ncthw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def to_5d_video(x: np.ndarray | jax.Array) -> np.ndarray | jax.Array:
    """Normalize 3D/4D/5D image input to (B, T, H, W, C).

    Mirrors the node-side input coercion (ref: nodes.py:154-179):
      (H, W, C)       -> (1, 1, H, W, C)
      (B, H, W, C)    -> (B, 1, H, W, C)
      (B, T, H, W, C) -> unchanged

    Host arrays stay on the host (a full-res channels-last video must not be
    materialized as a device buffer — the TPU runtime lane-pads the minor
    dimension 3 -> 128; the pipeline uploads NCTHW instead).
    """
    if not isinstance(x, jax.Array):
        x = np.asarray(x)
    if x.ndim == 3:
        return x[None, None]
    if x.ndim == 4:
        return x[:, None]
    if x.ndim == 5:
        return x
    raise ValueError(f"Unsupported tensor rank {x.ndim}; expected 3, 4 or 5.")
