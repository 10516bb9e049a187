"""Normalization and AdaLN modulation primitives.

fp32 islands are deliberate: the reference computes RMSNorm
(/root/reference/CleanGeneralDIT.py:23-33) and LayerNorm statistics in fp32
and casts back, and the PSNR parity target depends on reproducing that.
XLA fuses these elementwise chains into surrounding ops, so there is no need
for a hand-written kernel here; the Pallas budget goes to attention instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm over the last axis, computed in fp32 and cast back.

    Matches /root/reference/CleanGeneralDIT.py:23-33:
      y = x * rsqrt(mean(x^2) + eps) * w
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(orig_dtype)


def layer_norm_no_affine(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm without learnable affine, fp32 statistics.

    Matches nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6) used as the
    AdaLN pre-norm (ref: CleanGeneralDIT.py:481) and in the final layer
    (ref: CleanGeneralDIT.py:554).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(orig_dtype)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """AdaLN modulation x * (1 + scale) + shift.

    x: (B, L, D); shift/scale: (B, D), broadcast over the token axis
    (ref: CleanGeneralDIT.py:7-11 — the reference uses (L, B, D); we use
    batch-first, which XLA lays out better for sharding on the batch axis).
    """
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def adaln_modulation(
    emb: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    lora: jax.Array | None = None,
) -> jax.Array:
    """Shared AdaLN-LoRA MLP: SiLU -> Linear(D->r) -> Linear(r->k*D), plus the
    per-step shared lora vector (ref: CleanGeneralDIT.py:483-505).

    emb: (B, D) affine embedding; w1: (D, r); w2: (r, k*D); lora: (B, k*D) or a
    slice of it.  Computed in fp32: these are tiny matmuls feeding fp32
    modulation, and the reference's block math around them is fp32.
    """
    h = jax.nn.silu(emb.astype(jnp.float32))
    h = h @ w1.astype(jnp.float32)
    h = h @ w2.astype(jnp.float32)
    if lora is not None:
        h = h + lora.astype(jnp.float32)
    return h
