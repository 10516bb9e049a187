"""Ring attention: sequence-parallel exact attention over a mesh axis.

The DiT's 28,160-token self-attention sharded over the `seq` axis: each
device holds a token shard of q/k/v, computes flash-style partial attention
against the KV shard it currently holds, and rotates KV around the ring with
`ppermute` — n_seq steps overlap compute with ICI transfers, and no device
ever materializes the full KV (or any L x L block).

This is exact (online-softmax merged across ring steps), non-causal, and
runs under shard_map.  It replaces the all-gather-KV strategy when KV no
longer fits per-device — the long-context scaling path the reference lacks
entirely (SURVEY.md section 5: the reference scales by compression only).

The inner per-shard block runs through the Pallas flash kernel
(ops.flash_attention.flash_attention_partial — the long-context path IS the
fast path); impl='xla' falls back to einsum attention pieces.  All softmax
statistics live in the log2 domain (exp2 is the native VPU op; the kernel
pre-scales q by softmax_scale*log2e), and the cross-step merge uses exp2 to
match.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_LOG2E = math.log2(math.e)


def _partial_attn_xla(q, k, v, scale2):
    """Unnormalized attention stats for one KV block (XLA fallback).

    q: (B, Lq, H, D); k, v: (B, Lk, H, D).
    Returns (m, l, o): running max (B, H, Lq), normalizer (B, H, Lq),
    unnormalized output (B, Lq, H, D) — all fp32, log2-domain stats
    (scores pre-multiplied by log2e so exp2 replaces exp).
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale2
    m = jnp.max(s, axis=-1)
    p = jnp.exp2(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return m, l, o


def _partial_attn_flash(q, k, v, interpret):
    """Pallas flash inner block: locally-normalized output + (m, l) stats,
    un-normalized for merging (o_unnorm = out * l)."""
    from ..ops.flash_attention import flash_attention_partial

    out, m, l = flash_attention_partial(q, k, v, interpret=interpret)
    o = out.astype(jnp.float32) * l.transpose(0, 2, 1)[..., None]
    return m, l, o


def _merge(state, update):
    """Online-softmax merge of two partial states (log2 domain)."""
    m_a, l_a, o_a = state
    m_b, l_b, o_b = update
    m = jnp.maximum(m_a, m_b)
    a = jnp.exp2(m_a - m)
    b = jnp.exp2(m_b - m)
    l = l_a * a + l_b * b
    o = o_a * a.transpose(0, 2, 1)[..., None] + o_b * b.transpose(0, 2, 1)[..., None]
    return m, l, o


def ring_attention_local(q, k, v, axis_name: str, impl: str = "auto",
                         interpret: bool | None = None):
    """Per-shard body (call under shard_map with q/k/v sharded on L).

    q, k, v: (B, L_local, H, D) local shards -> (B, L_local, H, D).
    impl: 'flash' (Pallas inner block), 'xla', or 'auto' (flash on TPU).
    """
    if impl == "auto":
        impl = "flash" if jax.devices()[0].platform == "tpu" else "xla"
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    scale2 = _LOG2E / math.sqrt(q.shape[-1])

    if impl == "flash":
        partial_fn = lambda qq, kk, vv: _partial_attn_flash(
            qq, kk, vv, interpret)
    else:
        partial_fn = lambda qq, kk, vv: _partial_attn_xla(qq, kk, vv, scale2)

    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    state = partial_fn(q, k, v)
    kv = (k, v)

    def body(i, carry):
        state, (k_cur, v_cur) = carry
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        state = _merge(state, partial_fn(q, k_nxt, v_nxt))
        return state, (k_nxt, v_nxt)

    (m, l, o), _ = jax.lax.fori_loop(0, n - 1, body, (state, kv))
    out = o / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def make_ring_attention(mesh: Mesh, axis_name: str = "seq",
                        impl: str = "auto"):
    """shard_map-wrapped ring attention: (B, L, H, D) global arrays sharded
    (data, seq, tensor-on-heads) -> same sharding out."""
    shard_map = jax.shard_map

    spec = P("data", axis_name, "tensor", None)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation (same as flash_sp.py).
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def ring(q, k, v):
        return ring_attention_local(q, k, v, axis_name, impl=impl)

    return ring
