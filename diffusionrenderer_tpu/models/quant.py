"""int8 quantization for the DiT: weight-only (W8) and weight+activation (W8A8).

Purpose: the flagship 7.23B model is 13.48 GiB in bf16 — over the ~14.5 GiB
usable HBM of a single v5e once flagship-shape activations are added.
Per-output-channel symmetric int8 halves the weights to 6.74 GiB, making
single-chip flagship inference possible (the deployment alternative is
tensor-parallel >= 2 chips via parallel/sharding.py).

Weight-only scheme ({'q','s'} leaves): for each big matmul weight W (in, out):
    scale[out] = max(|W[:, out]|) / 127
    W_q = round(W / scale)  (int8)
    dense(x) = (x @ W_q) * scale        — the dequant rides the matmul output
XLA fuses the int8->bf16 convert into the matmul read, so the bf16
dequantized copy exists only tile-by-tile, never materialized per block.

Per-GROUP scales (group_size=g): scale[in_group, out] over g input rows
instead of the whole column — max|N(0,s)| over 128 samples is ~3.3 vs ~4.25
sigma over 4096, cutting quantization error ~22% (more on real checkpoints,
whose outlier rows inflate whole-column scales).  Grouped leaves carry a
rank+1 scale (..., G, out).  The weight-only grouped dequant multiplies the
group scale into the int8 read (still fused); the grouped W8A8 matmul runs
per-group int8 dots with int32 accumulation inside each group and an fp32
scale-fold at group boundaries (see ops/quant_matmul.py for the Pallas
kernel that does this without materializing L-sized temporaries).

W8A8 scheme ({'q','sa'} leaves; the KEY NAME carries the mode so the pytree
stays scannable — a bool marker leaf would need a stacked num_blocks axis):
activations are additionally quantized per token at runtime
    ax[tok] = max(|x[tok, :]|) / 127;  x_q = round(x / ax)  (int8)
and the matmul runs int8 x int8 -> int32 on the MXU's 394 TOPS int8 path
(2x the 197 TFLOP/s bf16 peak on v5e); the output is rescaled by the
per-token x per-channel outer product ax * s.  Measured at the flagship MLP
shape (28160x4096 @ 4096x16384): 35.9 ms vs 44.3 ms weight-only (1.23x),
with mean relative error 4.1% vs 3.3% weight-only against an fp32 oracle —
an opt-in speed/accuracy trade (CLI --w8a8).

Only the stacked per-block matmuls (wq/wk/wv/wo, mlp w1/w2) are quantized —
they are 97% of the parameters; AdaLN, norms, embedders and the final
projection stay bf16 (they are tiny and modulation is precision-sensitive).
`keep_bf16` exempts named matmuls (e.g. {"wo", "w2"} — the residual-stream
projections) for mixed-precision deployment modes.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp

QUANTIZED_BLOCK_WEIGHTS = {
    "fa": ("wq", "wk", "wv", "wo"),
    "ca": ("wq", "wk", "wv", "wo"),
    "mlp": ("w1", "w2"),
}


def quantize_tensor(w: jax.Array, act_quant: bool = False,
                    group_size: Optional[int] = None) -> Dict[str, jax.Array]:
    """(..., in, out) -> {'q': int8, 's'|'sa': fp32 scales}.

    group_size=None: per-output-channel scales, shape (..., out).
    group_size=g:    per-(input-group, output-channel), shape (..., G, out)
                     with G = in/g (in must divide evenly).
    act_quant=True stores the scale under 'sa', marking the leaf for runtime
    int8 activation quantization (W8A8) in dense_maybe_quantized."""
    wf = w.astype(jnp.float32)
    if group_size is not None and wf.shape[-2] % group_size != 0:
        # Inputs narrower than (or not divisible by) the group — e.g. the
        # 16-row cross-attention wk/wv — keep per-channel scales (a 16-row
        # column IS one group).
        group_size = None
    if group_size is not None:
        *lead, k, n = wf.shape
        wg = wf.reshape(*lead, k // group_size, group_size, n)
        amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
        scale = jnp.maximum(amax / 127.0, 1e-12)  # (..., G, 1, out)
        q = jnp.clip(jnp.round(wg / scale), -127, 127).astype(jnp.int8)
        return {"q": q.reshape(*lead, k, n),
                ("sa" if act_quant else "s"): scale.squeeze(-2)}
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., 1, out)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, ("sa" if act_quant else "s"): scale.squeeze(-2)}


def _wscale(wq: Dict[str, jax.Array]) -> jax.Array:
    return wq["sa"] if "sa" in wq else wq["s"]


def _is_grouped(wq: Dict[str, jax.Array]) -> bool:
    # Grouped scales have one more axis than per-channel: q (..., in, out)
    # with scale (..., G, out) vs per-channel (..., out).
    return _wscale(wq).ndim == wq["q"].ndim


def dequantize_tensor(wq: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    q, s = wq["q"], _wscale(wq)
    if _is_grouped(wq):
        *lead, k, n = q.shape
        g = s.shape[-2]
        wf = q.astype(jnp.float32).reshape(*lead, g, k // g, n) * s[..., :, None, :]
        return wf.reshape(*lead, k, n).astype(dtype)
    return (q.astype(jnp.float32) * s[..., None, :]).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and ("s" in w or "sa" in w)


def quantize_dit_params(params: Dict[str, Any],
                        act_quant: bool = False,
                        group_size: Optional[int] = None,
                        keep_bf16: Iterable[str] = ()) -> Dict[str, Any]:
    """Return a new params pytree with the stacked block matmuls int8.

    keep_bf16: matmul names ("wo", "w2", ...) or dotted "sub.name" forms
    ("mlp.w2") left in bf16 — mixed-precision modes."""
    keep = set(keep_bf16)
    out = dict(params)
    blocks = {}
    for sub, names in QUANTIZED_BLOCK_WEIGHTS.items():
        bp = dict(params["blocks"][sub])
        for name in names:
            if name in keep or f"{sub}.{name}" in keep:
                continue
            bp[name] = quantize_tensor(bp[name], act_quant=act_quant,
                                       group_size=group_size)
        blocks[sub] = bp
    out["blocks"] = blocks
    return out


def parse_quant_mode(mode: str):
    """Parse a deployment quant-mode string into quantize_dit_params kwargs:
    'w8a8_g128_keepres' -> (act_quant=True, group_size=128, keep=('w2','wo')).

    Grammar: base 'w8' (weight-only) or 'w8a8' (+ runtime int8 activations),
    then any of: '_gN' per-group scales of N input rows; '_keepres' keeps the
    residual-stream projections (wo, w2) bf16; '_keepattn' keeps all four
    attention projections bf16 (MLP-only int8).  Shared by bench.py, the CLI
    and the measurement scripts so every surface names modes identically
    (the accuracy ladder for these modes is in BASELINE.md)."""
    parts = mode.split("_")
    if parts[0] not in ("w8", "w8a8"):
        raise ValueError(f"unknown quant mode {mode!r} (base must be "
                         "w8 or w8a8)")
    act_quant = parts[0] == "w8a8"
    group_size = None
    keep = set()
    for p in parts[1:]:
        if p.startswith("g") and p[1:].isdigit():
            group_size = int(p[1:])
        elif p == "keepres":
            keep |= {"wo", "w2"}
        elif p == "keepattn":
            # All attention projections bf16, MLP w1/w2 int8: bf16 ~5.6 GiB
            # + int8 ~3.5 GiB of block weights — still a single-chip
            # flagship fit (vs 13.5 GiB all-bf16, which is not).
            keep |= {"wq", "wk", "wv", "wo"}
        else:
            raise ValueError(f"unknown mode suffix {p!r} in {mode}")
    return act_quant, group_size, tuple(sorted(keep))


def quantize_tensor_host(w, act_quant: bool = False,
                         group_size: Optional[int] = None) -> Dict[str, Any]:
    """Host-side variant of quantize_tensor — used during checkpoint
    conversion so no fp32 device temporaries are created while the bf16
    weights are resident (that transient OOMs a 16 GB chip).

    The math runs through torch, not numpy: per-channel quantization of the
    7B weight set touches ~6.7G elements, and this class of host runs
    numpy's elementwise kernels orders of magnitude slower than torch's
    vectorized path (see utils/hostops.py).  numpy cannot hold bf16, so
    bf16 inputs round-trip bit-wise through int16."""
    import ml_dtypes
    import numpy as np
    import torch

    from ..utils import hostops  # noqa: F401  (non-writable-input warning filter)

    arr = np.ascontiguousarray(np.asarray(w))
    if arr.dtype == ml_dtypes.bfloat16:
        t = torch.from_numpy(arr.view(np.int16)).view(torch.bfloat16)
        t = t.to(torch.float32)
    else:
        t = torch.from_numpy(arr)
        if t.dtype != torch.float32:
            t = t.to(torch.float32)
    skey = "sa" if act_quant else "s"
    if group_size is not None and t.shape[-2] % group_size != 0:
        group_size = None  # narrow inputs: per-channel (see quantize_tensor)
    if group_size is not None:
        *lead, k, n = t.shape
        tg = t.reshape(*lead, k // group_size, group_size, n)
        amax = tg.abs().amax(dim=-2, keepdim=True)
        scale = torch.clamp(amax / 127.0, min=1e-12)
        q = torch.round(tg / scale).clamp_(-127.0, 127.0).to(torch.int8)
        return {"q": jnp.asarray(q.reshape(*lead, k, n).numpy()),
                skey: jnp.asarray(scale.squeeze(-2).numpy())}
    amax = t.abs().amax(dim=-2, keepdim=True)
    scale = torch.clamp(amax / 127.0, min=1e-12)
    q = torch.round(t / scale).clamp_(-127.0, 127.0).to(torch.int8)
    return {"q": jnp.asarray(q.numpy()),
            skey: jnp.asarray(scale.squeeze(-2).numpy())}


# Above this many tokens the XLA per-channel W8A8 path's L-sized int8/int32
# temporaries become the single-chip OOM risk (measured round 2: +2.06 GiB
# program temp at 56,320 tokens, which tipped the 121-frame job over HBM) —
# the fused kernel keeps the int32 result in VMEM scratch.  Below it, XLA
# per-channel measured FASTER than the kernel on-chip (round 4
# scripts/bench_quant_matmul.py at M=28160: XLA 35.4 ms vs kernel-best
# 39.9 ms at the MLP-up shape), so flagship per-channel stays on XLA.
_KERNEL_MIN_TOKENS_PER_CHANNEL = 45_000


def _use_fused_kernel(x: jax.Array, w: Dict[str, jax.Array]) -> bool:
    """Route W8A8 matmuls through the fused Pallas kernel on TPU when
    measurement says it wins (table in BASELINE.md, round 4):

    * GROUPED scales: always (when the shape is kernel-legal).  The XLA
      grouped path materializes an fp32 (G, N, L) partial — 59 GB at the
      flagship MLP-up shape, a compile-time OOM — and even where it fits it
      measured 2.4x slower.  The kernel is the only viable grouped path.
    * PER-CHANNEL scales: only in the long-video memory regime
      (>= _KERNEL_MIN_TOKENS_PER_CHANNEL tokens); at flagship token counts
      XLA per-channel measured ~13% faster at the MLP shapes.

    Tiny matmuls (the B-sized CA projections), CPU tests, and active-mesh
    (multi-chip) calls keep the XLA path."""
    if jax.devices()[0].platform != "tpu":
        return False
    try:
        from jax.interpreters import pxla

        if not pxla.thread_resources.env.physical_mesh.empty:
            # Under an active mesh (multi-chip generate): a pallas_call is
            # not auto-partitionable by SPMD — keep the XLA path, which
            # partitions cleanly under the Megatron shardings.
            return False
    except Exception:
        pass
    k, n = w["q"].shape[-2], w["q"].shape[-1]
    m = 1
    for s in x.shape[:-1]:
        m *= s
    if m < 512 or k % 512 != 0 or n % 512 != 0:
        return False
    if _is_grouped(w):
        gsz = k // _wscale(w).shape[-2]
        # Kernel group constraints: gsz multiple of 128, and either a
        # multiple or a divisor of the k tile (512).
        return gsz % 128 == 0 and (gsz % 512 == 0 or 512 % gsz == 0)
    return m >= _KERNEL_MIN_TOKENS_PER_CHANNEL


def _quantize_activation(x: jax.Array):
    """Per-token symmetric int8: returns (x_q int8, dequant fp32 per token).

    The quantize multiply runs in x.dtype (bf16) — an fp32 quotient would
    materialize a 2x-sized transient at flagship activation shapes — and the
    dequant uses the EXACT inverse of the bf16 scale actually applied, so
    the rounding of the scale itself cancels."""
    amax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True)
    inv = (127.0 / jnp.maximum(amax, 1e-12)).astype(x.dtype)
    xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return xq, 1.0 / inv.astype(jnp.float32)


def dense_maybe_quantized(x: jax.Array, w: Any) -> jax.Array:
    """x @ w supporting bf16, {'q','s'} weight-only int8, or {'q','sa'} W8A8
    weights (each per-channel or per-group scaled); fp32 (or int32)
    accumulation.

    Routing-dependent numerics (ADVICE r3): the fused kernel path quantizes
    the fp32 activation product while this module's XLA fallback rounds the
    product to bf16 first, so single-chip flagship shapes (kernel) and
    multi-chip / small shapes (XLA) may differ by +-1 int8 activation code on
    ~9% of entries.  Multi-chip-vs-single-chip parity checks must therefore
    compare with activation-quantization-noise tolerance, not exactly
    (see ops/quant_matmul.py docstring for the bound)."""
    if not is_quantized(w):
        return jnp.einsum(
            "...i,io->...o", x, w, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    grouped = _is_grouped(w)
    if "sa" in w:
        if _use_fused_kernel(x, w):
            # Fused Pallas path (TPU, big shapes): activation quantize +
            # int8 dot + group-scale folds inside the tile loop — no
            # L-sized int8/int32 temporaries in HBM (NOTES item 7), and
            # the only per-group-scale implementation that doesn't
            # materialize a (..., G, out) partial.
            from ..ops.quant_matmul import quant_matmul_w8a8

            return quant_matmul_w8a8(x, w["q"], w["sa"])
        xq, dequant = _quantize_activation(x)
        if grouped:
            # Per-group int8 dots, int32-accumulated within each group (max
            # |sum| <= 127*127*g << 2^31), fp32 scale-fold across groups.
            # XLA path: scans over groups with one (..., out) fp32
            # accumulator — an einsum producing the (..., G, out) partial is
            # 59 GB at the flagship MLP-up shape (measured compile-time OOM,
            # round 4), and this fallback must stay viable under multi-chip
            # meshes where the Pallas kernel doesn't route.
            #
            # On single-chip TPU this branch only fires when the group size
            # is kernel-illegal (gsz below the 128-lane alignment minimum,
            # e.g. g32): measured round 4 at the flagship shape, the scan is
            # ~10x slower than per-channel (39.1 s/step w8a8_g32_keepres)
            # and one attempt crashed the tunnel TPU worker.  g32 is a
            # weight-only deployment mode (fused dequant); warn loudly at
            # trace time so a misconfigured job is diagnosable.
            import math as _math
            import warnings

            _m = _math.prod(x.shape[:-1])
            if _m >= 8192 and jax.devices()[0].platform == "tpu":
                warnings.warn(
                    f"grouped W8A8 matmul ({x.shape} @ {w['q'].shape}, "
                    f"group size {w['q'].shape[-2] // w['sa'].shape[-2]}) is "
                    "taking the XLA group-scan fallback on TPU — measured "
                    "~10x slower than per-channel at flagship scale. Use a "
                    "group size >= 128 (fused kernel) or weight-only int8 "
                    "for small groups (see BASELINE.md rung step times).",
                    stacklevel=2,
                )
            k = xq.shape[-1]
            n = w["q"].shape[-1]
            g = w["sa"].shape[-2]
            xg = jnp.moveaxis(xq.reshape(*xq.shape[:-1], g, k // g), -2, 0)
            wg = w["q"].reshape(g, k // g, n)
            sg = jnp.moveaxis(w["sa"], -2, 0)

            def _fold(acc, gi):
                xq_i, wq_i, s_i = gi
                part = jnp.einsum("...k,ko->...o", xq_i, wq_i,
                                  preferred_element_type=jnp.int32)
                return acc + part.astype(jnp.float32) * s_i, None

            acc0 = jnp.zeros((*xq.shape[:-1], n), jnp.float32)
            y, _ = jax.lax.scan(_fold, acc0, (xg, wg, sg))
            return (y * dequant).astype(x.dtype)
        y = jnp.einsum("...i,io->...o", xq, w["q"],
                       preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * dequant * w["sa"]).astype(x.dtype)
    if grouped:
        # Weight-only grouped: dequant rides the matmul operand read (the
        # group-scale multiply fuses into the int8->bf16 convert).  Verified
        # by memory_analysis round 4 (scripts/mem_w8a8_longvideo.py w8_g128
        # at 56,320 tokens): program temp 6.06 GiB grouped vs 6.13 GiB
        # per-channel — no materialized full-size bf16 weight copy.
        y = jnp.einsum(
            "...i,io->...o", x, dequantize_tensor(w, x.dtype),
            preferred_element_type=jnp.float32,
        )
        return y.astype(x.dtype)
    y = jnp.einsum(
        "...i,io->...o", x, w["q"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return (y * w["s"]).astype(x.dtype)
