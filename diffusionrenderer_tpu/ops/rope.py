"""3D rotary position embeddings for video token grids.

Reproduces the frequency-table construction of the reference's CleanRoPE3D
(/root/reference/CleanGeneralDIT.py:86-159), which itself mirrors the official
VideoRopePosition3DEmb:

* head_dim split h/w/t = (dim//6*2, dim//6*2, remainder) -> 42/42/44 for 128
* theta = 10000 * ntk_factor per axis (temporal ntk = 2.0)
* per-axis frequencies 1/theta**(arange(0, d, 2)[:d//2] / d)
* per-position angle tables via outer(pos, freq)
* concatenated in the pattern [t, h, w, t, h, w] to fill head_dim — the
  duplication matches transformer_engine's rotate-half convention where the
  first half of the lane dim pairs with the second half.

The table is a pure function of (T, H, W, head_dim, ntk factors); it is built
once per compiled shape and constant-folded by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _rope_dims(head_dim: int) -> tuple[int, int, int]:
    dim_h = head_dim // 6 * 2
    dim_w = dim_h
    dim_t = head_dim - 2 * dim_h
    assert dim_h + dim_w + dim_t == head_dim
    return dim_t, dim_h, dim_w


def rope_3d_angles(
    t: int,
    h: int,
    w: int,
    head_dim: int,
    *,
    h_ntk_factor: float = 1.0,
    w_ntk_factor: float = 1.0,
    t_ntk_factor: float = 2.0,
) -> jax.Array:
    """Build the (T*H*W, head_dim) fp32 angle table.

    Returns raw angles (not sin/cos), matching the reference which passes raw
    frequencies into apply_rotary_pos_emb (ref: CleanGeneralDIT.py:118-159).
    """
    dim_t, dim_h, dim_w = _rope_dims(head_dim)

    h_theta = 10000.0 * h_ntk_factor
    w_theta = 10000.0 * w_ntk_factor
    t_theta = 10000.0 * t_ntk_factor

    spatial_range = jnp.arange(0, dim_h, 2, dtype=jnp.float32)[: dim_h // 2] / dim_h
    temporal_range = jnp.arange(0, dim_t, 2, dtype=jnp.float32)[: dim_t // 2] / dim_t

    h_freqs = 1.0 / (h_theta**spatial_range)
    w_freqs = 1.0 / (w_theta**spatial_range)
    t_freqs = 1.0 / (t_theta**temporal_range)

    pos_t = jnp.arange(t, dtype=jnp.float32)
    pos_h = jnp.arange(h, dtype=jnp.float32)
    pos_w = jnp.arange(w, dtype=jnp.float32)

    ang_t = jnp.outer(pos_t, t_freqs)  # (T, dim_t//2)
    ang_h = jnp.outer(pos_h, h_freqs)  # (H, dim_h//2)
    ang_w = jnp.outer(pos_w, w_freqs)  # (W, dim_w//2)

    # Broadcast each axis table over the full (T, H, W) grid and concatenate
    # the [t, h, w] half-tables twice along the channel dim.
    bt = jnp.broadcast_to(ang_t[:, None, None, :], (t, h, w, ang_t.shape[-1]))
    bh = jnp.broadcast_to(ang_h[None, :, None, :], (t, h, w, ang_h.shape[-1]))
    bw = jnp.broadcast_to(ang_w[None, None, :, :], (t, h, w, ang_w.shape[-1]))
    half = jnp.concatenate([bt, bh, bw], axis=-1)  # (T, H, W, head_dim//2)
    full = jnp.concatenate([half, half], axis=-1)  # (T, H, W, head_dim)
    return full.reshape(t * h * w, head_dim)


def apply_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Apply rotary embedding with the rotate-half convention.

    x: (B, L, n_heads, head_dim); angles: (L, head_dim) fp32.
    y = x * cos(a) + rotate_half(x) * sin(a), where rotate_half maps the two
    halves (x1, x2) of the lane dim to (-x2, x1)
    (ref: CleanGeneralDIT.py:45-82).

    cos/sin are cast to x.dtype before the multiply, matching the reference's
    `.to(t.dtype)` so bf16 parity holds.
    """
    cos = jnp.cos(angles).astype(x.dtype)[None, :, None, :]
    sin = jnp.sin(angles).astype(x.dtype)[None, :, None, :]
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin
