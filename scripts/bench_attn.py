"""Flash-attention kernel micro-benchmark at the flagship shape.

Methodology per BASELINE.md: distinct inputs per timed call + forced
device->host fetch (the axon tunnel neither blocks on block_until_ready nor
re-executes value-identical computations).

Usage: python scripts/bench_attn.py [--l 28160] [--heads 32] [--d 128]
       [--iters 4] [--blocks 1408,1408] [--mode bf16|qk8|qk8pv8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=28160)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--blocks", type=str, default="1408,1408")
    ap.add_argument("--mode", type=str, default="bf16")
    ap.add_argument("--chunks", type=int, default=1,
                    help="no-shift kernel in-body exp2->PV interleave factor")
    args = ap.parse_args()

    from diffusionrenderer_tpu.ops import flash_attention as fa_mod
    from diffusionrenderer_tpu.ops.flash_attention import flash_attention

    fa_mod.NOSHIFT_VPU_CHUNKS = args.chunks

    bq, bk = (int(x) for x in args.blocks.split(","))
    l, h, d = args.l, args.heads, args.d
    kw = {}
    if args.mode in ("qk8", "qk8pv8"):
        kw["qk_int8"] = True
    if args.mode in ("qk8pv8", "boundedpv8"):
        kw["pv_int8"] = True
    if args.mode in ("bounded", "boundedpv8", "boundedpipe"):
        kw["bounded"] = True
    if args.mode == "boundedpipe":
        kw["pipelined"] = True

    keys = jax.random.split(jax.random.key(0), 3 * (args.iters + 1))
    flops = 4.0 * l * l * d * h

    def make(i):
        q = jax.random.normal(keys[3 * i], (1, l, h, d), jnp.bfloat16)
        k = jax.random.normal(keys[3 * i + 1], (1, l, h, d), jnp.bfloat16)
        v = jax.random.normal(keys[3 * i + 2], (1, l, h, d), jnp.bfloat16)
        return q, k, v

    # Warmup/compile
    q, k, v = make(0)
    out = flash_attention(q, k, v, block_q=bq, block_k=bk, **kw)
    np.asarray(out[0, -1, -1, -1])

    times = []
    for i in range(1, args.iters + 1):
        q, k, v = make(i)
        t0 = time.perf_counter()
        out = flash_attention(q, k, v, block_q=bq, block_k=bk, **kw)
        np.asarray(out[0, -1, -1, -1])  # force fetch
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"mode={args.mode} blocks=({bq},{bk}) chunks={args.chunks} "
          f"L={l} H={h} D={d}: "
          f"{dt*1e3:.1f} ms, {flops/dt/1e12:.1f} TFLOP/s "
          f"({flops/dt/1e12/197*100:.0f}% of bf16 peak)")

    # Accuracy vs a float reference on a small slice (full L x L fp32 logits
    # would not fit; slice the query axis).
    qs = q[:, :1024].astype(jnp.float32)
    ref = jax.nn.softmax(
        jnp.einsum("bqhd,bkhd->bhqk", qs, k.astype(jnp.float32))
        / np.sqrt(d), axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", ref, v.astype(jnp.float32))
    got = out[:, :1024].astype(jnp.float32)
    err = jnp.abs(got - ref)
    denom = jnp.maximum(jnp.abs(ref), 1e-3)
    print(f"  accuracy vs fp32 oracle (first 1024 q): max abs "
          f"{float(err.max()):.4f}, mean rel {float((err/denom).mean()):.5f}")


if __name__ == "__main__":
    main()
