"""Decompose the flagship W8A8 DiT step (28,160 tokens) into its two
compute phases, measured IN-PROGRAM (inside one jit each, `lax.scan` over
the 28 blocks) so per-dispatch tunnel overhead cancels — unlike the
single-matmul microbench (scripts/bench_quant_matmul.py), whose absolute
numbers carry a ~few-ms dispatch cost each.

Three programs, same methodology as bench.py (distinct inputs, forced
fetch, min over iters):
  1. full `dit_forward` step               (the BENCH_r04 headline)
  2. attention-only: scan of 28 chained flash_attention calls
  3. matmul-only:    scan of 28 blocks' W8A8 qkv/wo/mlp chains

(1) - (2) - (3) = norms + RoPE + AdaLN + patchify + scan plumbing.

Why it matters: docs/KERNELS.md's speed-of-light analysis says the flash
kernel has ~0 algorithmic headroom left; whether the *matmul* side has
headroom depends on its in-program TFLOP/s, which the dispatch-dominated
microbench cannot resolve.  This script produces that number.

Usage: python scripts/profile_step.py [w8a8|w8a8_g128|w8]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.quant import dense_maybe_quantized
from diffusionrenderer_tpu.ops.flash_attention import flash_attention

QUANT = sys.argv[1] if len(sys.argv) > 1 else "w8a8"
cfg = DiTConfig()
T, H, W = 8, 88, 160
L = (T // cfg.patch_temporal) * (H // cfg.patch_spatial) * (W // cfg.patch_spatial)
D, NH, DH, HID, NB = (cfg.model_channels, cfg.num_heads, cfg.head_dim,
                      cfg.hidden_dim, cfg.num_blocks)
print(f"flagship decomposition: L={L} D={D} blocks={NB} quant={QUANT}",
      flush=True)

params = bench._init_bf16(cfg, jax.random.key(0), jnp.bfloat16, quant=QUANT)
blocks = params["blocks"]


def timeit(name, fn, inputs, tflop, iters=3):
    out = fn(inputs[0])
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[-1])  # compile + run
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(jax.tree.leaves(fn(inputs[1 + i]))[0].ravel()[-1])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s} {best*1e3:9.1f} ms   {tflop/best/1e12:7.1f} TFLOP/s "
          f"({tflop/1e12:.1f} TFLOP)", flush=True)
    return best


def make_inputs(shape, dtype=jnp.bfloat16, n=4):
    return [jax.random.normal(jax.random.key(10 + i), shape, dtype)
            for i in range(n)]


# ---- 1. full step --------------------------------------------------------
from diffusionrenderer_tpu.models.dit import dit_forward

cond = jax.random.normal(jax.random.key(2), (1, T, H, W,
                                             cfg.additional_concat_ch),
                         jnp.bfloat16)
sig = jnp.full((1,), 7.5, jnp.bfloat16)
ci = jnp.zeros((1,), jnp.int32)
full = jax.jit(lambda x: dit_forward(params, x, sig, cond, ci, cfg))
flops_exec, _ = bench.dit_step_flops(cfg, L)
t_full = timeit("full dit step", full,
                make_inputs((1, T, H, W, cfg.in_channels)), flops_exec)

# ---- 2. attention-only scan ----------------------------------------------
attn_tflop = 4.0 * L * L * D * NB


@jax.jit
def attn_only(x):  # x: (1, L, NH, DH); chain output->query so steps serialize
    def body(q, _):
        o = flash_attention(q, x, x)
        return o.astype(jnp.bfloat16), None
    out, _ = jax.lax.scan(body, x, None, length=NB)
    return out


t_attn = timeit("attention-only x28", attn_only,
                make_inputs((1, L, NH, DH)), attn_tflop)

# ---- 3. matmul-only scan --------------------------------------------------
mm_tflop = 2.0 * (4 * D * D + 2 * D * HID) * L * NB
mm_weights = {
    "fa": {k: blocks["fa"][k] for k in ("wq", "wk", "wv", "wo")},
    "mlp": {k: blocks["mlp"][k] for k in ("w1", "w2")},
}


@jax.jit
def mm_only(x):  # x: (1, L, D); every matmul feeds the next (serialized)
    def body(h, wb):
        q = dense_maybe_quantized(h, wb["fa"]["wq"])
        k = dense_maybe_quantized(h, wb["fa"]["wk"])
        v = dense_maybe_quantized(h, wb["fa"]["wv"])
        h = dense_maybe_quantized(q + k + v, wb["fa"]["wo"])
        h = dense_maybe_quantized(h, wb["mlp"]["w1"])
        h = dense_maybe_quantized(h, wb["mlp"]["w2"])
        return (h * 0.01).astype(jnp.bfloat16), None
    out, _ = jax.lax.scan(body, x, mm_weights, length=NB)
    return out


t_mm = timeit("matmul-only x28", mm_only, make_inputs((1, L, D)), mm_tflop)

rest = t_full - t_attn - t_mm
print(f"{'rest (norms/rope/adaln)':24s} {rest*1e3:9.1f} ms   "
      f"({100*rest/t_full:.0f}% of step)", flush=True)
print(f"attention {100*t_attn/t_full:.0f}%  matmuls {100*t_mm/t_full:.0f}%  "
      f"rest {100*rest/t_full:.0f}%", flush=True)
