"""Pallas flash-attention (TPU) for the DiT's dense self-attention.

Replaces torch F.scaled_dot_product_attention (ref: CleanGeneralDIT.py:192-197)
with a block-wise online-softmax kernel:

* grid (B*H, Lq/BLK_Q, Lk/BLK_K); Q/output tiles revisit VMEM once per KV
  block; the KV axis is the sequential online-softmax reduction
  ("arbitrary"), batch-head and Q blocks are "parallel" (megacore);
* fp32 running max / normalizer / accumulator in VMEM scratch, bf16 tile
  matmuls on the MXU with fp32 accumulation;
* non-causal, no mask — the DiT attends densely over the full 3D token grid;
  ragged tails are zero-padded and masked with -inf inside the kernel;
* numerics match the XLA softmax-attention oracle to bf16 tolerance
  (tests/test_flash_attention.py).

Flagship shape: L = 28,160 tokens, 32 heads x 128 head_dim.  28160 = 55*512,
so BLK 512 tiles evenly; VMEM per program ~ 0.8 MB, far under budget.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on v5e at the flagship shape (L=28160, 32h x 128d) with the
# pre-scaled-q exp2 kernel: (1408, 1408) tiles divide 28160 exactly, so the
# padded-key bias pass compiles out -> 105 TFLOP/s (53% MFU); (1024, 1024)
# 104; old (2048, 1024) default 103; (1024, 512) 76; bf16 exp2 output
# measured ~2% slower than fp32; (2048+, 1408+) tiles fail to compile
# (VMEM).  Remaining gap to peak is the fp32 softmax VPU passes (max,
# exp2, sum) over the L x L tiles.
DEFAULT_BLOCK_Q = 1408
DEFAULT_BLOCK_K = 1408
_NEG_INF = -1e30


_LOG2E = math.log2(math.e)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref,
                  acc_ref, *, has_bias: bool, m_out_ref=None, l_out_ref=None):
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (BLK_Q, D), pre-scaled by scale*log2(e) outside the kernel
    k = k_ref[0]  # (BLK_K, D)
    # The softmax scale and the log2(e) factor (exp2 is the native VPU op;
    # exp lowers to exp2+mul) are folded into q BEFORE the kernel — an O(L*D)
    # multiply instead of an O(L^2) per-tile pass.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_bias:
        # Padded-key masking as a precomputed additive bias row (0 for valid,
        # -1e30 for pad): one VPU add per tile — measured far cheaper than
        # per-tile iota+select or a lax.cond on the tail block.  Compiled out
        # entirely when KV tiles evenly.
        s = s + bias_ref[0][None, :]

    m_prev = m_ref[...]  # (BLK_Q, 128) row-replicated
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (BLK_Q, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))

    p = jnp.exp2(s - m_new[:, :1])  # (BLK_Q, BLK_K)
    alpha = jnp.exp2(m_prev - m_new)  # (BLK_Q, 128)

    l_ref[...] = l_prev * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
    )
    m_ref[...] = m_new

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # alpha's lanes are row-replicated; broadcast one lane over head_dim
    # (head_dim may exceed the 128-lane scratch width, e.g. the VAE's 512).
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    @pl.when(kv_idx == num_kv - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)
        if m_out_ref is not None:
            # Partial-stats outputs for cross-shard online-softmax merging
            # (ring attention): running max (log2 domain, q pre-scaled by
            # scale*log2e) and normalizer, one lane per query row.
            m_out_ref[0, 0] = m_ref[:, 0]
            l_out_ref[0, 0] = l_ref[:, 0]


def _flash_kernel_nobias(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, m_ref, l_ref, acc_ref,
                  has_bias=False)


def _flash_kernel_partial(q_ref, k_ref, v_ref, o_ref, m_out_ref, l_out_ref,
                          m_ref, l_ref, acc_ref):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, m_ref, l_ref, acc_ref,
                  has_bias=False, m_out_ref=m_out_ref, l_out_ref=l_out_ref)


def _flash_kernel_partial_bias(q_ref, k_ref, v_ref, bias_ref, o_ref,
                               m_out_ref, l_out_ref, m_ref, l_ref, acc_ref):
    _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref,
                  has_bias=True, m_out_ref=m_out_ref, l_out_ref=l_out_ref)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_call(q, k, v, block_q, block_k, interpret, partial_stats):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    if d > 128:
        # Wide single-head attention (e.g. the VAE's C=512): shrink blocks to
        # keep the fp32 accumulator + p tile inside the ~16 MB VMEM budget.
        block_q = min(block_q, 1024)
        block_k = min(block_k, 512)

    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)
    has_bias = lk_pad != lk

    # Fold the softmax scale and the exp2 conversion factor into q: one
    # O(L*D) multiply here replaces an O(L^2) per-tile VPU pass in the kernel.
    q = (q * (scale * _LOG2E)).astype(q.dtype)

    def flat(x, l, l_pad):
        x = x.reshape(b, l, h * d)  # heads onto the lane axis — free reshape
        if l_pad != l:
            x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        return x

    qb = flat(q, lq, lq_pad)
    kb = flat(k, lk, lk_pad)
    vb = flat(v, lk, lk_pad)

    inputs = [qb, kb, vb]
    if has_bias:
        # Additive key-mask row: 0 on valid keys, -inf-like on the padded tail.
        bias = jnp.zeros((1, lk_pad), jnp.float32).at[:, lk:].set(_NEG_INF)
        inputs.append(bias)

    # Grid walks (batch, head, q-block) in parallel and the kv axis
    # sequentially; each head is a d-wide slice of the lane axis — no
    # transposed copies of q/k/v.
    grid = (b, h, lq_pad // block_q, lk_pad // block_k)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bi, hi, i, j: (bi, i, hi)),
        pl.BlockSpec((1, block_k, d), lambda bi, hi, i, j: (bi, j, hi)),
        pl.BlockSpec((1, block_k, d), lambda bi, hi, i, j: (bi, j, hi)),
    ]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, block_k), lambda bi, hi, i, j: (0, j))
        )
        kernel = (_flash_kernel_partial_bias if partial_stats
                  else functools.partial(_flash_kernel, has_bias=True))
    else:
        kernel = _flash_kernel_partial if partial_stats else _flash_kernel_nobias

    out_shape = [jax.ShapeDtypeStruct((b, lq_pad, h * d), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda bi, hi, i, j: (bi, i, hi))
    ]
    if partial_stats:
        stat_spec = pl.BlockSpec((1, 1, block_q), lambda bi, hi, i, j: (bi, hi, i))
        out_shape += [jax.ShapeDtypeStruct((b, h, lq_pad), jnp.float32)] * 2
        out_specs += [stat_spec, stat_spec]

    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),  # running max
                pltpu.VMEM((block_q, 128), jnp.float32),  # running normalizer
                pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * lq_pad * lk_pad * d * b * h,
            bytes_accessed=(lq_pad + 2 * lk_pad) * d * b * h * q.dtype.itemsize,
            transcendentals=lq_pad * lk_pad * b * h,
        ),
        interpret=interpret,
    )(*inputs)

    out = res[0][:, :lq].reshape(b, lq, h, d)
    if partial_stats:
        m = res[1][..., :lq]
        l = res[2][..., :lq]
        return out, m, l
    return out


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v, non-causal.

    q: (B, Lq, H, D); k, v: (B, Lk, H, D) -> (B, Lq, H, D).
    On non-TPU backends runs in Pallas interpret mode (for tests).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _flash_call(q, k, v, block_q, block_k, interpret,
                       partial_stats=False)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention_partial(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
):
    """Flash attention returning per-shard softmax statistics.

    Returns (out, m, l): out (B, Lq, H, D) is the locally-normalized
    attention over THIS kv shard; m (B, H, Lq) is the running max in the
    log2 domain (q pre-scaled by softmax_scale*log2e — exp2 is the native
    VPU op); l (B, H, Lq) the local normalizer.  Cross-shard exact merging
    (ring attention): o_unnorm = out * l, then the standard online-softmax
    combine with exp2 (parallel/ring_attention.py)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _flash_call(q, k, v, block_q, block_k, interpret,
                       partial_stats=True)
