"""Weight-only int8 quantization for the DiT.

Purpose: the flagship 7.23B model is 13.48 GiB in bf16 — over the ~14.5 GiB
usable HBM of a single v5e once flagship-shape activations are added.
Per-output-channel symmetric int8 halves the weights to 6.74 GiB, making
single-chip flagship inference possible (the deployment alternative is
tensor-parallel >= 2 chips via parallel/sharding.py).

Scheme: for each big matmul weight W (in, out):
    scale[out] = max(|W[:, out]|) / 127
    W_q = round(W / scale)  (int8)
    dense(x) = (x @ W_q) * scale        — the dequant rides the matmul output

Only the stacked per-block matmuls (wq/wk/wv/wo, mlp w1/w2) are quantized —
they are 97% of the parameters; AdaLN, norms, embedders and the final
projection stay bf16 (they are tiny and modulation is precision-sensitive).

XLA fuses the int8->bf16 convert into the matmul read, so the bf16
dequantized copy exists only tile-by-tile, never materialized per block.
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


def quantize_tensor(w: jax.Array) -> Dict[str, jax.Array]:
    """(..., in, out) -> {'q': int8, 's': fp32 per-(block, out) scales}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., 1, out)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.squeeze(-2)}


def dequantize_tensor(wq: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (wq["q"].astype(jnp.float32) * wq["s"][..., None, :]).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def quantize_dit_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return a new params pytree with the stacked block matmuls int8."""
    out = dict(params)
    blocks = {}
    for sub, names in QUANTIZED_BLOCK_WEIGHTS.items():
        bp = dict(params["blocks"][sub])
        for name in names:
            bp[name] = quantize_tensor(bp[name])
        blocks[sub] = bp
    out["blocks"] = blocks
    return out


def quantize_tensor_host(w) -> Dict[str, Any]:
    """Numpy (host-side) variant of quantize_tensor — used during checkpoint
    conversion so no fp32 device temporaries are created while the bf16
    weights are resident (that transient OOMs a 16 GB chip)."""
    import numpy as np

    wf = np.asarray(w, np.float32)
    amax = np.max(np.abs(wf), axis=-2, keepdims=True)
    scale = np.maximum(amax / 127.0, 1e-12)
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return {"q": jnp.asarray(q), "s": jnp.asarray(scale.squeeze(-2))}


def dense_maybe_quantized(x: jax.Array, w: Any) -> jax.Array:
    """x @ w supporting bf16 or {'q','s'} int8 weights, fp32 accumulation."""
    if is_quantized(w):
        y = jnp.einsum(
            "...i,io->...o", x, w["q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        return (y * w["s"]).astype(x.dtype)
    return jnp.einsum(
        "...i,io->...o", x, w, preferred_element_type=jnp.float32
    ).astype(x.dtype)
