"""Fused W8A8 matmul Pallas kernel (per-channel or per-group scales).

Motivation (NOTES.md item 7 / VERDICT r3 items 1-2): the XLA W8A8 path
materializes the int32 matmul result as an L-sized HBM buffer before the
rescale — at 56k tokens the MLP-up int32 output alone is 3.4 GiB of program
temp, which is what pushed long-video W8A8 out of memory.  Here the dequant
rescale (and the per-group scale folds) live INSIDE the matmul tile loop:
the matmul's HBM traffic is xq (int8), wq (int8), the (M, 1) per-token
scale, and the bf16 output — no int32 L-buffer ever exists.

Activation quantization runs OUTSIDE the kernel as a plain XLA pre-pass
(abs-max reduce + scale + round + cast, fused by XLA into ~2 bandwidth-bound
sweeps over x producing an int8 copy: M*K bytes, e.g. 220 MiB at 56k tokens
— trivial next to the int32 buffer the kernel avoids).  Round 3 ran the
quantize inside the kernel body instead; with grid (m, n, k) that re-does
the upcast+mul+round+clip over the same x tile for EVERY n tile — 8x
redundant VPU work at N=4096 and 32x at N=16384 — which measured ~28%
slower end-to-end than the XLA path it replaced (BENCH_r03 5001 ms vs r02
3918 ms).  Hoisting the quantize out also halves the kernel's x-tile HBM
reads (int8 vs bf16).

Also the vehicle for per-GROUP weight scales (the accuracy lever for the
40 dB deployment bar): with per-channel scales an int32 accumulator runs the
whole K axis and one fp32 rescale happens in the epilogue; with group scales
the int32 accumulator folds into the fp32 accumulator once per group
boundary — amortized VPU cost `3 ops / (2 * gsz) MXU-int-ops` per output
element, i.e. ~5% of MXU time at gsz=512 if nothing overlaps (Mosaic's
scheduler overlaps most of it with the next tile's dot in practice).

int32 safety: |x_q|, |w_q| <= 127 so a K-length int32 dot is bounded by
K * 127^2 = 2.6e8 < 2^31 even at K=16384 — accumulation never overflows.

Numerics: the per-token scale is the same bf16-rounded 127/amax as
models/quant._quantize_activation and the dequant divides by exactly that
scale (fp32 reciprocal), so the scale rounding cancels identically.  One
deliberate difference: the quantize multiply x*inv runs in fp32 here (the
int8 copy is the only materialized artifact — no 2x-sized bf16 transient),
while the XLA fallback in models/quant rounds the product to bf16.  fp32 is
the more accurate quantize; for bf16 inputs the two paths may differ by
+-1 int8 code on entries whose bf16-rounded product sits on the other side
of a .5 boundary (~9% of entries, bounded by one activation quantization
step).  For fp32 inputs the integer cores are bit-identical
(tests/test_quant_matmul.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Defaults from the round-4 on-chip sweep (scripts/bench_quant_matmul.py
# --sweep 28160, 9 configs x 3 flagship shapes, table in BASELINE.md):
# (512, 1024, 512) is best at both MLP shapes (94.7 / 92.7 TF/s vs 87.4 /
# 87.2 at the old (256,512,512)-clamped-to-512 default) and within noise of
# best at the d x d projection.
DEFAULT_BLOCK_M = 512
DEFAULT_BLOCK_N = 1024
DEFAULT_BLOCK_K = 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(xq_ref, inv_ref, w_ref, s_ref, o_ref, *accs,
            k_tiles: int, folds_per_tile: int, fold_every: int, out_dtype):
    """One (m, n) output tile; grid k axis is innermost ('arbitrary').

    folds_per_tile > 0: `folds_per_tile` groups per k tile (gsz <= block_k);
    fold_every > 0: one group spans `fold_every` k tiles (gsz >= block_k);
    both 0: per-channel scales — single int32 run over all of K, one rescale
    in the epilogue (s_ref then holds the (1, block_n) channel scales).
    Scratch accumulators are allocated per mode: fp32 only / int32+fp32 /
    int32 only respectively.
    """
    if folds_per_tile > 0:
        (acc_f32,) = accs
        acc_i32 = None
    elif fold_every > 0:
        acc_i32, acc_f32 = accs
    else:
        (acc_i32,) = accs
        acc_f32 = None

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        for acc in accs:
            acc[:] = jnp.zeros_like(acc)

    if folds_per_tile > 0:
        # Several groups inside one k tile: one dot + one fold per group.
        # s_ref block is (1, folds_per_tile, block_n) — 3D so the Mosaic
        # last-two-dims tiling rule is satisfied (see quant_matmul_w8a8).
        gsz = xq_ref.shape[-1] // folds_per_tile
        for g in range(folds_per_tile):
            part = jax.lax.dot_general(
                xq_ref[:, g * gsz:(g + 1) * gsz],
                w_ref[g * gsz:(g + 1) * gsz, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc_f32[:] += part.astype(jnp.float32) * s_ref[0, g, :][None, :]
    else:
        acc_i32[:] += jax.lax.dot_general(
            xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if fold_every > 0:
            # Group boundary: rescale the int32 run into fp32 and reset.
            @pl.when((k + 1) % fold_every == 0)
            def _fold():
                acc_f32[:] += (acc_i32[:].astype(jnp.float32)
                               * s_ref[0, 0, :][None, :])
                acc_i32[:] = jnp.zeros_like(acc_i32)

    @pl.when(k == k_tiles - 1)
    def _epilogue():
        dequant = 1.0 / inv_ref[:].astype(jnp.float32)  # exact bf16-scale inverse
        if folds_per_tile > 0 or fold_every > 0:
            total = acc_f32[:]
        else:
            total = acc_i32[:].astype(jnp.float32) * s_ref[0, 0, :][None, :]
        o_ref[:] = (total * dequant).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret"),
)
def quant_matmul_w8a8(
    x: jax.Array,
    wq: jax.Array,
    scale: jax.Array,
    block_m: int = DEFAULT_BLOCK_M,
    block_n: int = DEFAULT_BLOCK_N,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused per-token-int8-activation x int8-weight matmul.

    x: (..., K) activations (bf16/fp32); wq: (K, N) int8 weights;
    scale: (N,) per-channel or (G, N) per-group fp32 weight scales
    (G must divide K; group size K/G a multiple of 128).
    Returns (..., N) in x.dtype.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    *lead, k_dim = x.shape
    n_dim = wq.shape[-1]
    m_dim = 1
    for s_ in lead:
        m_dim *= s_
    x2 = x.reshape(m_dim, k_dim)

    # Activation quantize as an XLA pre-pass (see module docstring): the
    # per-token scale plus the fp32-product round to an int8 copy.  XLA
    # fuses the chain into bandwidth-bound sweeps; only the int8 copy is
    # materialized.
    amax = jnp.max(jnp.abs(x2).astype(jnp.float32), axis=-1, keepdims=True)
    inv = (127.0 / jnp.maximum(amax, 1e-12)).astype(x.dtype)  # (M, 1)
    xq = jnp.clip(
        jnp.round(x2.astype(jnp.float32) * inv.astype(jnp.float32)),
        -127, 127,
    ).astype(jnp.int8)

    # int8 native tile is (32, 128): keep block_m 32-aligned.
    block_m = min(block_m, _round_up(m_dim, 32))
    block_k = min(block_k, k_dim)
    block_n = min(block_n, n_dim)
    assert k_dim % block_k == 0, (k_dim, block_k)
    assert n_dim % block_n == 0, (n_dim, block_n)

    m_pad = _round_up(m_dim, block_m)
    if m_pad != m_dim:
        xq = jnp.pad(xq, ((0, m_pad - m_dim), (0, 0)))
        inv = jnp.pad(inv, ((0, m_pad - m_dim), (0, 0)),
                      constant_values=jnp.asarray(1.0, inv.dtype))

    # The scale operand is reshaped to 3D with the group structure in the
    # LEADING axis: Mosaic constrains only the last two block dims (must be
    # divisible by (8, 128) or equal to the array dims), and a per-k-tile
    # group-row block like (folds_per_tile, block_n) violates that whenever
    # folds_per_tile isn't 8-aligned.  With shapes (k_tiles, fpt, N) /
    # (G, 1, N) / (1, 1, N) the last-two block dims always equal the array
    # dims or are 128-aligned, and in-kernel indexing stays static.
    grouped = scale.ndim == 2
    k_tiles = k_dim // block_k
    if grouped:
        g = scale.shape[0]
        gsz = k_dim // g
        assert k_dim % g == 0, (k_dim, g)
        if gsz >= block_k:
            assert gsz % block_k == 0, (gsz, block_k)
            folds_per_tile, fold_every = 0, gsz // block_k
            scale = scale.reshape(g, 1, n_dim)
            # k tile -> its group row.
            s_spec = pl.BlockSpec(
                (1, 1, block_n),
                lambda m, n, kk, fe=fold_every: (kk // fe, 0, n),
            )
        else:
            assert block_k % gsz == 0 and gsz % 128 == 0, (block_k, gsz)
            folds_per_tile, fold_every = block_k // gsz, 0
            scale = scale.reshape(k_tiles, folds_per_tile, n_dim)
            s_spec = pl.BlockSpec(
                (1, folds_per_tile, block_n),
                lambda m, n, kk: (kk, 0, n),
            )
    else:
        folds_per_tile, fold_every = 0, 0
        scale = scale.reshape(1, 1, n_dim)
        s_spec = pl.BlockSpec((1, 1, block_n), lambda m, n, kk: (0, 0, n))

    if folds_per_tile > 0:
        scratch = [pltpu.VMEM((block_m, block_n), jnp.float32)]
    elif fold_every > 0:
        scratch = [pltpu.VMEM((block_m, block_n), jnp.int32),
                   pltpu.VMEM((block_m, block_n), jnp.float32)]
    else:
        scratch = [pltpu.VMEM((block_m, block_n), jnp.int32)]

    grid = (m_pad // block_m, n_dim // block_n, k_tiles)
    out = pl.pallas_call(
        functools.partial(
            _kernel, k_tiles=k_tiles, folds_per_tile=folds_per_tile,
            fold_every=fold_every, out_dtype=x.dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda m, n, kk: (m, kk)),
            pl.BlockSpec((block_m, 1), lambda m, n, kk: (m, 0)),
            pl.BlockSpec((block_k, block_n), lambda m, n, kk: (kk, n)),
            s_spec,
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, n, kk: (m, n)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_dim), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_dim * k_dim,
            bytes_accessed=(m_pad * k_dim                 # xq int8
                            + k_dim * n_dim               # wq int8
                            + m_pad * n_dim * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, inv, wq, scale.astype(jnp.float32))
    return out[:m_dim].reshape(*lead, n_dim)
