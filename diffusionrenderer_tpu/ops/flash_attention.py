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
# Tall-KV tiles + query chunking measured fastest at the flagship shape
# (L=28160, H=32, D=128), same-day sweep: (1408,1408) 120.2 ms ->
# chunks=4 113.5 -> (704,2816)+chunks=4 109.0 ms (60% MFU; neighbors
# (352,2816) 129.6, (704,3520) 115.9, (704,2560) 115.7, chunks 2/8 at
# this shape 117.5/121.1).  The score tile stays 7.9 MB fp32 either way;
# the win is fewer grid steps on the KV axis (10 vs 20) amortizing each
# tile's prologue over more MXU work.
DEFAULT_BLOCK_Q = 704
DEFAULT_BLOCK_K = 2816
# In-body exp2->PV interleave factor for the no-shift kernel (see
# _flash_kernel_noshift): >1 splits each score tile's query axis into that
# many independent VPU->MXU chains so the scheduler can overlap chunk c's
# PV matmul with chunk c+1's exp2.  Bench-tunable via scripts/bench_attn.py
# --chunks; numerics are identical for any value.
NOSHIFT_VPU_CHUNKS = 4
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
            m_out_ref[0, 0, 0] = m_ref[:, 0]
            l_out_ref[0, 0, 0] = l_ref[:, 0]


def _flash_kernel_nobias(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, m_ref, l_ref, acc_ref,
                  has_bias=False)


def _flash_kernel_partial(q_ref, k_ref, v_ref, o_ref, m_out_ref, l_out_ref,
                          m_ref, l_ref, acc_ref):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, m_ref, l_ref, acc_ref,
                  has_bias=False, m_out_ref=m_out_ref, l_out_ref=l_out_ref)


_LOG2_127 = math.log2(127.0)


def _flash_kernel_bounded(*refs, has_bias: bool):
    """Flash attention WITHOUT the running max: the caller supplies a
    per-row upper bound m_i >= max_j s_ij (Cauchy-Schwarz:
    ||q_i||_2 * max_j ||k_j||_2, computed in O(L*D) outside).

    exp2(s - m_i) then never overflows, and because fp32 is floating point
    the uniform 2^-(m_i - true_max) scale-down of p and l cancels exactly in
    acc/l — same numerics as the online-softmax kernel to fp32 rounding,
    PROVIDED the bound overshoot stays under ~100 log2 units (p underflows
    beyond that; the finalize clamps l so the failure mode is zeros, not
    NaN).  With per-head RMS-normalized q/k (this DiT: CleanGeneralDIT.py
    qkv_norm 'RRI') the overshoot is log2(1/max-cosine) — single digits.
    Drops per tile: the max lane-reduction, the running-max maximum, the
    alpha rescale of acc and l.
    """
    it = iter(refs)
    q_ref, k_ref, v_ref, mb_ref = (next(it) for _ in range(4))
    bias_ref = next(it) if has_bias else None
    o_ref = next(it)
    l_ref, acc_ref = (next(it) for _ in range(2))

    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_bias:
        s = s + bias_ref[0][None, :]

    shift = mb_ref[0, 0, 0][:, None]  # (BLK_Q, 1) fixed per row
    p = jnp.exp2(s - shift)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    l_ref[...] = l_ref[...] + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
    )
    acc_ref[...] = acc_ref[...] + pv

    @pl.when(kv_idx == num_kv - 1)
    def _finalize():
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-37)
        ).astype(o_ref.dtype)


def _flash_kernel_noshift(*refs, has_bias: bool, n_chunks: int = 1):
    """Flash attention with NO exponent shift at all: p = exp2(s).

    Valid whenever the precomputed global score bound guarantees exp2(s),
    the normalizer sum and the p*V accumulator all stay inside fp32 range
    (checked OUTSIDE the kernel; the shifted bounded kernel is the lax.cond
    fallback).  Because acc/l cancels any uniform per-row factor, skipping
    the shift changes nothing to fp32 rounding — it just deletes one full
    VPU subtract pass over the L x L score tiles (and the per-row bound
    operand).  Within the DiT's RMS-normed q/k envelope the bound is
    ~16 log2 units, far under the fp32 limit, so this is the branch that
    actually runs.

    n_chunks > 1 splits the score tile's QUERY axis into independent
    exp2 -> PV chains inside one grid step, so the scheduler can overlap
    chunk c's PV matmul (MXU) with chunk c+1's exp2 (VPU) without any
    persistent scratch (the cross-grid-step scratch pipeline is a measured
    dead end — NOTES.md item 2).  Row chunks keep the PV contraction dim
    full (block_k), slice on the sublane axis (8-aligned, vs the lane
    axis's 128 constraint), and write disjoint accumulator rows — the
    chains share nothing.  Numerics identical to n_chunks=1.
    """
    it = iter(refs)
    q_ref, k_ref, v_ref = (next(it) for _ in range(3))
    bias_ref = next(it) if has_bias else None
    o_ref = next(it)
    l_ref, acc_ref = (next(it) for _ in range(2))

    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_bias:
        s = s + bias_ref[0][None, :]

    block_q = s.shape[0]
    v_all = v_ref[0]
    cq = block_q // n_chunks if n_chunks > 1 else block_q
    if n_chunks > 1 and block_q % n_chunks == 0 and cq % 8 == 0:
        for c in range(n_chunks):
            r0, r1 = c * cq, (c + 1) * cq
            p_c = jnp.exp2(s[r0:r1, :])
            pv_c = jax.lax.dot_general(
                p_c.astype(v_all.dtype), v_all, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_c = jnp.sum(p_c, axis=-1, keepdims=True)
            l_ref[r0:r1, :] = l_ref[r0:r1, :] + jnp.broadcast_to(
                l_c, (cq, l_ref.shape[1])
            )
            acc_ref[r0:r1, :] = acc_ref[r0:r1, :] + pv_c
    else:
        p = jnp.exp2(s)
        pv = jax.lax.dot_general(
            p.astype(v_all.dtype), v_all, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l_ref[...] = l_ref[...] + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
        )
        acc_ref[...] = acc_ref[...] + pv

    @pl.when(kv_idx == num_kv - 1)
    def _finalize():
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-37)
        ).astype(o_ref.dtype)


def _flash_kernel_bounded_pipe(*refs, has_bias: bool, num_kv: int):
    """Software-pipelined bounded kernel: tile j's QK^T (MXU) is independent
    of tile j-1's exp2/sum (VPU), so the scheduler can overlap them.

    The score tile lives in a VMEM scratch across grid steps: step j computes
    s_j = q k_j^T and *consumes* s_{j-1} (exp2 -> PV -> acc/l).  The grid runs
    num_kv+1 steps; step 0's consume eats a -inf-initialized scratch (p = 0,
    exact no-op) and the last step skips the produce.  v's index map lags k's
    by one tile.  Numerics identical to _flash_kernel_bounded (same ops, same
    order per tile)."""
    it = iter(refs)
    q_ref, k_ref, v_ref, mb_ref = (next(it) for _ in range(4))
    bias_ref = next(it) if has_bias else None
    o_ref = next(it)
    s_scr, l_ref, acc_ref = (next(it) for _ in range(3))

    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        s_scr[...] = jnp.full_like(s_scr, _NEG_INF)  # exp2 -> exactly 0

    shift = mb_ref[0, 0, 0][:, None]  # (BLK_Q, 1) fixed per row

    # Consume tile j-1 (VPU exp2 + MXU PV) ...
    p = jnp.exp2(s_scr[...] - shift)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_ref[...] = l_ref[...] + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
    )
    acc_ref[...] = acc_ref[...] + pv

    # ... while producing tile j's scores (MXU, independent of the exp2).
    @pl.when(j < num_kv)
    def _produce():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bias:
            s = s + bias_ref[0][None, :]
        s_scr[...] = s

    @pl.when(j == num_kv)
    def _finalize():
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-37)
        ).astype(o_ref.dtype)


def _flash_kernel_int8(*refs, pv8: bool, has_bias: bool):
    """SageAttention-style int8 flash attention.

    QK^T runs on the MXU's 2x-throughput int8 path; scores are dequantized
    with the rank-1 per-row scale product sq_i * sk_j (q was pre-scaled by
    softmax_scale*log2e BEFORE quantization, so the exp2 softmax is
    unchanged).  With pv8, P is quantized to int8 by folding *127 into the
    exp2 shift (p' = exp2(s - m + log2 127) <= 127); the 127 cancels exactly
    in the final acc/l normalization, and V is int8 with per-channel scales.
    """
    it = iter(refs)
    q_ref, k_ref, v_ref, sq_ref, sk_ref = (next(it) for _ in range(5))
    sv_ref = next(it) if pv8 else None
    bias_ref = next(it) if has_bias else None
    o_ref = next(it)
    m_ref, l_ref, acc_ref = (next(it) for _ in range(3))

    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s_i32 = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = (s_i32.astype(jnp.float32)
         * sq_ref[0, 0, 0][:, None] * sk_ref[0, 0, 0][None, :])
    if has_bias:
        s = s + bias_ref[0][None, :]

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp2(m_prev - m_new)

    if pv8:
        p = jnp.exp2(s - m_new[:, :1] + _LOG2_127)  # <= 127
        p_i8 = jnp.round(p).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p_i8, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sv_ref[0, 0, 0][None, :]
    else:
        p = jnp.exp2(s - m_new[:, :1])
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    l_ref[...] = l_prev * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
    )
    m_ref[...] = m_new
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    @pl.when(kv_idx == num_kv - 1)
    def _finalize():
        # With pv8 both acc and l carry the 127 factor — it cancels here.
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_kernel_partial_bias(q_ref, k_ref, v_ref, bias_ref, o_ref,
                               m_out_ref, l_out_ref, m_ref, l_ref, acc_ref):
    _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref,
                  has_bias=True, m_out_ref=m_out_ref, l_out_ref=l_out_ref)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _quant_rows_int8(x):
    """Per-(b, token, head) symmetric int8 quantization over head_dim.

    x: (B, L, H, D) -> (int8 same shape, scales (B, H, L) fp32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)  # (B, L, H)
    s = jnp.maximum(amax, 1e-6) / 127.0
    xi = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return xi, s.transpose(0, 2, 1)


def _quant_channels_int8(v):
    """Per-(b, head, channel) int8 quantization over tokens.

    v: (B, L, H, D) -> (int8 same shape, scales (B, H, D) fp32)."""
    vf = v.astype(jnp.float32)
    amax = jnp.max(jnp.abs(vf), axis=1)  # (B, H, D)
    s = jnp.maximum(amax, 1e-6) / 127.0
    vi = jnp.round(vf / s[:, None]).astype(jnp.int8)
    return vi, s


def _bounded_cond_call(q, inputs, in_specs, b, h, lq, lq_pad, lk_pad,
                       block_q, block_k, d, mb, has_bias, out_dtype,
                       interpret):
    """Bounded-softmax flash attention, runtime-dispatched between the
    no-shift kernel (p = exp2(s), one fewer VPU pass per score tile) and
    the per-row-shifted kernel via lax.cond on a global fp32-range check:

        max_i bound_i + log2(L_k) + log2(max|v|) < 120

    guarantees exp2(s), the normalizer sum (<= L_k * 2^bound) and the p*V
    accumulator (<= L_k * 2^bound * max|v|) all stay finite in fp32 with no
    shift at all; the acc/l division cancels the uniform per-row factor
    exactly, so both branches agree to fp32 rounding.  Within the DiT's
    RMS-normed q/k envelope the bound is ~16 + ~15 + O(1) — the no-shift
    branch is the one that runs; out-of-envelope inputs take the shifted
    kernel and remain exact."""
    grid = (b, h, lq_pad // block_q, lk_pad // block_k)
    out_shape = [jax.ShapeDtypeStruct((b, lq_pad, h * d), out_dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda bi, hi, i, j: (bi, i, hi))
    ]
    common = dict(
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * lq_pad * lk_pad * d * b * h,
            bytes_accessed=(lq_pad + 2 * lk_pad) * d * b * h
            * q.dtype.itemsize,
            transcendentals=lq_pad * lk_pad * b * h,
        ),
        interpret=interpret,
    )

    def scratch():
        return [
            pltpu.VMEM((block_q, 128), jnp.float32),  # running normalizer
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ]

    # Both branches take the same operands: the per-row bound (index 3) is
    # only needed by the no-longer-used shifted kernel; the fallback here is
    # the EXACT online-softmax kernel, so bounded mode never degrades — the
    # envelope check only selects speed.
    ns_inputs = inputs[:3] + inputs[4:]
    ns_specs = in_specs[:3] + in_specs[4:]

    def noshift():
        return pl.pallas_call(
            functools.partial(_flash_kernel_noshift, has_bias=has_bias,
                              n_chunks=NOSHIFT_VPU_CHUNKS),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=grid, in_specs=ns_specs,
                out_specs=out_specs, scratch_shapes=scratch()),
            **common,
        )(*ns_inputs)[0]

    def online():
        kernel = (functools.partial(_flash_kernel, has_bias=True)
                  if has_bias else _flash_kernel_nobias)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=grid, in_specs=ns_specs,
                out_specs=out_specs,
                scratch_shapes=[pltpu.VMEM((block_q, 128), jnp.float32)]
                + scratch()),
            **common,
        )(*ns_inputs)[0]

    vmax = jnp.max(jnp.abs(inputs[2].astype(jnp.float32)))
    headroom = (jnp.max(mb) + math.log2(float(max(lk_pad, 1)))
                + jnp.log2(jnp.maximum(vmax, 1e-30)))
    out = jax.lax.cond(headroom < 120.0, noshift, online)
    return out[:, :lq].reshape(b, lq, h, d)


def _flash_call(q, k, v, block_q, block_k, interpret, partial_stats,
                qk_int8=False, pv_int8=False, bounded=False,
                pipelined=False):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    # None = "use the tuned default and auto-rebalance".  Caller-provided
    # sizes are honored as-is (block sweeps must measure the tiles they
    # report) apart from the mandatory validity clamps below.
    explicit_q, explicit_k = block_q is not None, block_k is not None
    block_q = block_q if explicit_q else DEFAULT_BLOCK_Q
    block_k = block_k if explicit_k else DEFAULT_BLOCK_K

    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    if d > 128:
        # Wide single-head attention (e.g. the VAE's C=512): shrink blocks to
        # keep the fp32 accumulator + p tile inside the ~16 MB VMEM budget.
        block_q = min(block_q, 1024)
        block_k = min(block_k, 512)

    def _balance(block: int, l: int) -> int:
        # Rebalance so the tile count stays the same but padding waste goes
        # away: e.g. lq=1024 with block 704 would pad to 2x704 (37% dead
        # rows); two 512 tiles cover it exactly.  Exact divisors (the
        # flagship 28160 = 40x704) are returned unchanged.
        ntiles = -(-l // block)
        return min(block, _round_up(-(-l // ntiles), 128))

    if not explicit_q:
        block_q = _balance(block_q, lq)
    if not explicit_k:
        block_k = _balance(block_k, lk)

    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)
    has_bias = lk_pad != lk
    out_dtype = q.dtype

    # Fold the softmax scale and the exp2 conversion factor into q: one
    # O(L*D) multiply here replaces an O(L^2) per-tile VPU pass in the kernel.
    q = (q * (scale * _LOG2E)).astype(q.dtype)

    def flat(x, l, l_pad):
        x = x.reshape(b, l, h * d)  # heads onto the lane axis — free reshape
        if l_pad != l:
            x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        return x

    def flat_stats(s, l, l_pad):
        # (B, H, L) -> (B, H, 1, L_pad): the dummy axis keeps the block's
        # second-to-last dim equal to the array's (Mosaic tiling rule).
        if l_pad != l:
            s = jnp.pad(s, ((0, 0), (0, 0), (0, l_pad - l)))
        return s[:, :, None, :]

    q_spec = pl.BlockSpec((1, block_q, d), lambda bi, hi, i, j: (bi, i, hi))
    k_spec = pl.BlockSpec((1, block_k, d), lambda bi, hi, i, j: (bi, j, hi))

    if bounded:
        assert not partial_stats and not qk_int8 and not pv_int8, \
            "bounded mode does not compose with int8 (int8 P needs a tight max)"
        # Per-row score upper bound (log2 domain, q carries scale*log2e):
        # m_i = ||q_i||_2 * max_j ||k_j||_2 >= max_j q_i . k_j.
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1))  # (B, L, H)
        kn = jnp.sqrt(jnp.sum(kf * kf, axis=-1))
        mb = (qn * jnp.max(kn, axis=1, keepdims=True)).transpose(0, 2, 1)
        nkv = lk_pad // block_k
        if pipelined:
            # Grid runs nkv+1 steps; k's index is clamped at the end (dummy
            # fetch, produce skipped) and v lags k by one tile.
            k_spec_b = pl.BlockSpec(
                (1, block_k, d),
                lambda bi, hi, i, j: (bi, jnp.minimum(j, nkv - 1), hi))
            v_spec_b = pl.BlockSpec(
                (1, block_k, d),
                lambda bi, hi, i, j: (bi, jnp.maximum(j - 1, 0), hi))
            bias_spec = pl.BlockSpec(
                (1, block_k), lambda bi, hi, i, j: (0, jnp.minimum(j, nkv - 1)))
        else:
            k_spec_b, v_spec_b = k_spec, k_spec
            bias_spec = pl.BlockSpec((1, block_k),
                                     lambda bi, hi, i, j: (0, j))
        inputs = [
            flat(q, lq, lq_pad), flat(k, lk, lk_pad), flat(v, lk, lk_pad),
            flat_stats(mb, lq, lq_pad),
        ]
        in_specs = [
            q_spec, k_spec_b, v_spec_b,
            pl.BlockSpec((1, 1, 1, block_q),
                         lambda bi, hi, i, j: (bi, hi, 0, i)),
        ]
        if has_bias:
            bias = jnp.zeros((1, lk_pad), jnp.float32).at[:, lk:].set(_NEG_INF)
            inputs.append(bias)
            in_specs.append(bias_spec)
        if pipelined:
            kernel = functools.partial(_flash_kernel_bounded_pipe,
                                       has_bias=has_bias, num_kv=nkv)
        else:
            return _bounded_cond_call(
                q, inputs, in_specs, b, h, lq, lq_pad, lk_pad, block_q,
                block_k, d, mb, has_bias, out_dtype, interpret)
    elif qk_int8:
        assert not partial_stats, "partial stats + int8 not supported"
        qi, sq = _quant_rows_int8(q)  # q already carries scale*log2e
        ki, sk = _quant_rows_int8(k)
        if pv_int8:
            vi, sv = _quant_channels_int8(v)
            vb = flat(vi, lk, lk_pad)
        else:
            vb = flat(v, lk, lk_pad)
        inputs = [
            flat(qi, lq, lq_pad), flat(ki, lk, lk_pad), vb,
            flat_stats(sq, lq, lq_pad), flat_stats(sk, lk, lk_pad),
        ]
        in_specs = [
            q_spec, k_spec, k_spec,
            pl.BlockSpec((1, 1, 1, block_q),
                         lambda bi, hi, i, j: (bi, hi, 0, i)),
            pl.BlockSpec((1, 1, 1, block_k),
                         lambda bi, hi, i, j: (bi, hi, 0, j)),
        ]
        if pv_int8:
            inputs.append(sv[:, :, None, :])  # (B, H, 1, D)
            in_specs.append(
                pl.BlockSpec((1, 1, 1, d), lambda bi, hi, i, j: (bi, hi, 0, 0))
            )
        if has_bias:
            bias = jnp.zeros((1, lk_pad), jnp.float32).at[:, lk:].set(_NEG_INF)
            inputs.append(bias)
            in_specs.append(
                pl.BlockSpec((1, block_k), lambda bi, hi, i, j: (0, j))
            )
        kernel = functools.partial(
            _flash_kernel_int8, pv8=pv_int8, has_bias=has_bias
        )
    else:
        qb = flat(q, lq, lq_pad)
        kb = flat(k, lk, lk_pad)
        vb = flat(v, lk, lk_pad)

        inputs = [qb, kb, vb]
        in_specs = [q_spec, k_spec, k_spec]
        if has_bias:
            # Additive key-mask row: 0 on valid keys, -inf-like on the
            # padded tail.
            bias = jnp.zeros((1, lk_pad), jnp.float32).at[:, lk:].set(_NEG_INF)
            inputs.append(bias)
            in_specs.append(
                pl.BlockSpec((1, block_k), lambda bi, hi, i, j: (0, j))
            )
            kernel = (_flash_kernel_partial_bias if partial_stats
                      else functools.partial(_flash_kernel, has_bias=True))
        else:
            kernel = (_flash_kernel_partial if partial_stats
                      else _flash_kernel_nobias)

    # Grid walks (batch, head, q-block) in parallel and the kv axis
    # sequentially; each head is a d-wide slice of the lane axis — no
    # transposed copies of q/k/v.  The pipelined variant adds one drain step.
    grid = (b, h, lq_pad // block_q,
            lk_pad // block_k + (1 if (bounded and pipelined) else 0))

    out_shape = [jax.ShapeDtypeStruct((b, lq_pad, h * d), out_dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda bi, hi, i, j: (bi, i, hi))
    ]
    if partial_stats:
        # Dummy second-to-last axis: Mosaic requires the block's trailing two
        # dims to divide (8, 128) or equal the array's.
        stat_spec = pl.BlockSpec(
            (1, 1, 1, block_q), lambda bi, hi, i, j: (bi, hi, 0, i)
        )
        out_shape += [jax.ShapeDtypeStruct((b, h, 1, lq_pad), jnp.float32)] * 2
        out_specs += [stat_spec, stat_spec]

    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=(
                # pipelined: cross-step score tile; plain bounded: nothing;
                # online-softmax: the running max.
                [pltpu.VMEM((block_q, block_k), jnp.float32)]
                if (bounded and pipelined) else
                [] if bounded else
                [pltpu.VMEM((block_q, 128), jnp.float32)]  # running max
            ) + [
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
        m = res[1][:, :, 0, :lq]
        l = res[2][:, :, 0, :lq]
        return out, m, l
    return out


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "qk_int8", "pv_int8",
                     "bounded", "pipelined"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
    qk_int8: bool = False,
    pv_int8: bool = False,
    bounded: bool = False,
    pipelined: bool = False,
) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v, non-causal.

    q: (B, Lq, H, D); k, v: (B, Lk, H, D) -> (B, Lq, H, D).
    On non-TPU backends runs in Pallas interpret mode (for tests).

    bounded: drop the per-tile running max entirely.  A precomputed
    Cauchy-Schwarz row bound proves (outside the kernel) that exp2(s), the
    normalizer and the p*V accumulator fit fp32 unshifted; within that
    envelope the no-shift kernel runs (p = exp2(s) — the acc/l division
    cancels any uniform factor, same numerics to fp32 rounding, fewer VPU
    passes per tile), and out-of-envelope inputs take the exact
    online-softmax kernel via lax.cond — bounded mode never degrades.
    qk_int8: SageAttention-style per-token int8
    quantization of q and k — QK^T on the MXU int8 path, scores dequantized
    per tile with the rank-1 scale product.  pv_int8 additionally quantizes
    P (exact-cancelling 127 fold) and V (per-channel) so PV is int8 too.
    Accuracy bounds in tests/test_flash_attention.py.

    pipelined (bounded only): carry the score tile in VMEM scratch so tile
    j's QK^T (MXU) overlaps tile j-1's exp2/sum (VPU); numerically identical
    to bounded.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _flash_call(q, k, v, block_q, block_k, interpret,
                       partial_stats=False,
                       qk_int8=(qk_int8 or pv_int8) and not bounded,
                       pv_int8=pv_int8, bounded=bounded,
                       pipelined=pipelined and bounded)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention_partial(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int | None = None,
    block_k: int | None = None,
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
