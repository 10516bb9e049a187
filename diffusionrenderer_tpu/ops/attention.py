"""Attention ops: XLA reference path + dispatch to the Pallas flash kernel.

Replaces torch F.scaled_dot_product_attention (ref: CleanGeneralDIT.py:192-197)
with TPU-native implementations:

* `attention_xla` — einsum attention with fp32 softmax; the numerics oracle
  and the fallback for shapes the Pallas kernel does not cover (CPU tests,
  tiny sequences).
* `attention` — dispatcher: uses the Pallas flash-attention kernel
  (ops/flash_attention.py) on TPU for long sequences, XLA otherwise.

Layout is batch-first (B, L, H, Dh) throughout — maps heads*Dh onto lanes and
keeps the batch axis leading for data-parallel sharding.  Non-causal, no mask:
the DiT attends densely over the full 3D token grid.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v with fp32 logits/softmax.

    q: (B, Lq, H, Dh); k, v: (B, Lk, H, Dh) -> (B, Lq, H, Dh).
    """
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


@functools.partial(jax.jit, static_argnames=("backend",))
def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    backend: str = "auto",
) -> jax.Array:
    """Dispatching attention entry point.

    backend: 'auto' | 'xla' | 'pallas' | 'pallas_onlinemax' |
    'pallas_pv_int8'.  'auto' picks the Pallas flash kernel on TPU when Lq
    is large enough to benefit, XLA otherwise.  'pallas' (and 'auto') run
    the bounded-softmax variant — the per-tile running max replaced by a
    precomputed Cauchy-Schwarz row bound, exact to fp32 rounding for
    normalized q/k (this DiT RMS-norms q and k per head; measured ~14%
    faster at the flagship shape).  'pallas_onlinemax' keeps the classic
    online-softmax kernel.  'pallas_pv_int8' is the int8 QK^T + int8 PV
    online-softmax kernel (SageAttention-style rank-1 dequant + the
    exact-cancelling 127-fold P quantization; measured +3% at the flagship
    shape — int8 P needs the tight per-tile max, so it does NOT compose
    with the bounded kernel) — its accuracy rung on the quantization
    ladder decides whether it is promoted (BASELINE.md).
    """
    if backend == "xla":
        return attention_xla(q, k, v)
    if backend in ("pallas", "pallas_onlinemax", "pallas_pv_int8") or (
        backend == "auto" and _use_pallas(q, k)
    ):
        from .flash_attention import flash_attention

        pv8 = backend == "pallas_pv_int8"
        return flash_attention(
            q, k, v,
            bounded=backend != "pallas_onlinemax" and not pv8,
            pv_int8=pv8)
    return attention_xla(q, k, v)


def _use_pallas(q: jax.Array, k: jax.Array) -> bool:
    if not _on_tpu():
        return False
    # Tiny KV (e.g. the 1-token cross-attention) or tiny queries gain nothing.
    return (
        q.shape[1] >= 256
        and k.shape[1] >= 256
        and q.shape[-1] in (64, 128, 256, 512)
    )


def cross_attention_single_kv(
    context: jax.Array,
    wk_unused: jax.Array | None,
    wv: jax.Array,
    num_heads: int,
) -> jax.Array:
    """Exact fast path for cross-attention with a single KV token.

    With one key, softmax over the key axis is identically 1 regardless of
    q/k values, so attention output == v for every query position.  The whole
    cross-attention therefore collapses to broadcasting W_v @ context — q and
    k projections and the (L x 1) softmax are dead computation.  This is an
    algebraic identity, not an approximation; per DiT block it removes two
    D x D matmuls over all 28k tokens (ref behavior: CleanGeneralDIT.py:192-197
    with kv length 1 from the (B, 1, 1024) context, CleanGeneralDIT.py:731-742).

    context: (B, 1, C_ctx); wv: (C_ctx, D).  Returns v: (B, 1, H, Dh) — the
    per-query attention output before the output projection (identical for
    every query, so callers broadcast after projecting).
    """
    b = context.shape[0]
    v = jnp.einsum("bmc,cd->bmd", context, wv,
                   preferred_element_type=jnp.float32).astype(context.dtype)
    return v.reshape(b, 1, num_heads, v.shape[-1] // num_heads)
