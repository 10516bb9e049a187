"""Patchify / unpatchify for the DiT, as pure reshapes + one matmul.

The framework's canonical video layout is channels-last (B, T, H, W, C) —
the natural TPU layout (C maps to lanes).  The reference works in
(B, C, T, H, W) (torch NCDHW); converters live in utils.layout.

Flattening orders are checkpoint-critical and match the reference exactly:

* patchify flattens each (pt, ph, pw) patch in (C, pt, ph, pw) order —
  rearrange 'b c (t r) (h m) (w n) -> b t h w (c r m n)'
  (ref: CleanGeneralDIT.py:406-417);
* unpatchify expects the final-layer output channel ordered (ph, pw, pt, C) —
  rearrange '(B T) (H W) (ph pw pt C) -> B C (T pt) (H ph) (W pw)'
  (ref: CleanGeneralDIT.py:709-717).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def patchify(
    x: jax.Array, patch_spatial: int, patch_temporal: int
) -> jax.Array:
    """(B, T, H, W, C) -> (B, T/pt, H/ps, W/ps, C*pt*ps*ps).

    Patch vector ordering is (C, pt, ph, pw), C slowest.
    """
    b, t, h, w, c = x.shape
    ps, pt = patch_spatial, patch_temporal
    assert t % pt == 0, f"T={t} not divisible by patch_temporal={pt}"
    assert h % ps == 0 and w % ps == 0, (
        f"H={h}, W={w} not divisible by patch_spatial={ps}"
    )
    tp, hp, wp = t // pt, h // ps, w // ps
    x = x.reshape(b, tp, pt, hp, ps, wp, ps, c)
    # -> (B, Tp, Hp, Wp, C, pt, ph, pw)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, tp, hp, wp, c * pt * ps * ps)


def unpatchify(
    x: jax.Array,
    tp: int,
    hp: int,
    wp: int,
    patch_spatial: int,
    patch_temporal: int,
    out_channels: int,
) -> jax.Array:
    """(B, Tp*Hp*Wp, ph*pw*pt*C) -> (B, T, H, W, C).

    Input channel ordering is (ph, pw, pt, C), ph slowest — matching the
    final-layer projection weight layout of the checkpoint.
    """
    b = x.shape[0]
    ps, pt, c = patch_spatial, patch_temporal, out_channels
    x = x.reshape(b, tp, hp, wp, ps, ps, pt, c)
    # -> (B, Tp, pt, Hp, ph, Wp, pw, C)
    x = x.transpose(0, 1, 6, 2, 4, 3, 5, 7)
    return x.reshape(b, tp * pt, hp * ps, wp * ps, c)


def patch_embed(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None,
    patch_spatial: int,
    patch_temporal: int,
) -> jax.Array:
    """Patchify + linear projection: (B,T,H,W,C) -> (B,Tp,Hp,Wp,D).

    weight: (patch_dim, D) applied as patches @ W; the renderer checkpoint has
    no patch-embed bias (ref: CleanGeneralDIT.py:724).
    """
    patches = patchify(x, patch_spatial, patch_temporal)
    out = jnp.einsum(
        "bthwp,pd->bthwd", patches, weight,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
