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
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANTIZED_BLOCK_WEIGHTS = {
    "fa": ("wq", "wk", "wv", "wo"),
    "ca": ("wq", "wk", "wv", "wo"),
    "mlp": ("w1", "w2"),
}


def quantize_tensor(w: jax.Array, act_quant: bool = False) -> Dict[str, jax.Array]:
    """(..., in, out) -> {'q': int8, 's'|'sa': fp32 per-(block, out) scales}.

    act_quant=True stores the scale under 'sa', marking the leaf for runtime
    int8 activation quantization (W8A8) in dense_maybe_quantized."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., 1, out)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, ("sa" if act_quant else "s"): scale.squeeze(-2)}


def _wscale(wq: Dict[str, jax.Array]) -> jax.Array:
    return wq["sa"] if "sa" in wq else wq["s"]


def dequantize_tensor(wq: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (wq["q"].astype(jnp.float32) * _wscale(wq)[..., None, :]).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and ("s" in w or "sa" in w)


def quantize_dit_params(params: Dict[str, Any],
                        act_quant: bool = False) -> Dict[str, Any]:
    """Return a new params pytree with the stacked block matmuls int8."""
    out = dict(params)
    blocks = {}
    for sub, names in QUANTIZED_BLOCK_WEIGHTS.items():
        bp = dict(params["blocks"][sub])
        for name in names:
            bp[name] = quantize_tensor(bp[name], act_quant=act_quant)
        blocks[sub] = bp
    out["blocks"] = blocks
    return out


def quantize_tensor_host(w, act_quant: bool = False) -> Dict[str, Any]:
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
    amax = t.abs().amax(dim=-2, keepdim=True)
    scale = torch.clamp(amax / 127.0, min=1e-12)
    q = torch.round(t / scale).clamp_(-127.0, 127.0).to(torch.int8)
    return {"q": jnp.asarray(q.numpy()),
            ("sa" if act_quant else "s"): jnp.asarray(scale.squeeze(-2).numpy())}


def dense_maybe_quantized(x: jax.Array, w: Any) -> jax.Array:
    """x @ w supporting bf16, {'q','s'} weight-only int8, or {'q','sa'} W8A8
    weights; fp32 (or int32) accumulation."""
    if not is_quantized(w):
        return jnp.einsum(
            "...i,io->...o", x, w, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    if "sa" in w:
        # W8A8: per-token dynamic activation scale, int8 MXU matmul.  The
        # quantize multiply runs in x.dtype (bf16) — an fp32 quotient would
        # materialize a 2x-sized transient at flagship activation shapes —
        # and the dequant uses the EXACT inverse of the bf16 scale actually
        # applied, so the rounding of the scale itself cancels.
        amax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True)
        inv = (127.0 / jnp.maximum(amax, 1e-12)).astype(x.dtype)
        xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
        y = jnp.einsum("...i,io->...o", xq, w["q"],
                       preferred_element_type=jnp.int32)
        dequant = 1.0 / inv.astype(jnp.float32)
        return (y.astype(jnp.float32) * dequant * w["sa"]).astype(x.dtype)
    y = jnp.einsum(
        "...i,io->...o", x, w["q"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return (y * w["s"]).astype(x.dtype)
