"""Block-size sweep for the pipelined bounded flash kernel.

The (1408,1408) default OOMs VMEM under pipelining (extra block_q x block_k
fp32 score scratch = 7.9 MB on top of the ~10 MB working set).  Sweep
smaller tiles; 28160 = 2^9 * 55, so even divisors include 1280 (x22),
1760 (x16), 880 (x32), 704 (x40), 2560 (x11).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffusionrenderer_tpu.ops.flash_attention import flash_attention

L, H, D = 28160, 32, 128
FLOPS = 4.0 * L * L * D * H

CONFIGS = [
    ("pipe", 1280, 1280),
    ("pipe", 1408, 1024),
    ("pipe", 1760, 880),
    ("pipe", 1408, 704),
    ("pipe", 2560, 512),
]

keys = jax.random.split(jax.random.key(0), 12)


def make(i):
    q = jax.random.normal(keys[3 * i], (1, L, H, D), jnp.bfloat16)
    k = jax.random.normal(keys[3 * i + 1], (1, L, H, D), jnp.bfloat16)
    v = jax.random.normal(keys[3 * i + 2], (1, L, H, D), jnp.bfloat16)
    return q, k, v


def bench(bq, bk, pipelined):
    q, k, v = make(0)
    out = flash_attention(q, k, v, block_q=bq, block_k=bk,
                          bounded=True, pipelined=pipelined)
    np.asarray(out[0, -1, -1, -1])
    times = []
    for i in range(1, 4):
        q, k, v = make(i)
        t0 = time.perf_counter()
        out = flash_attention(q, k, v, block_q=bq, block_k=bk,
                              bounded=True, pipelined=pipelined)
        np.asarray(out[0, -1, -1, -1])
        times.append(time.perf_counter() - t0)
    return min(times)


for name, bq, bk in CONFIGS:
    try:
        dt = bench(bq, bk, pipelined=True)
        print(f"{name} ({bq},{bk}): {dt*1e3:.1f} ms, "
              f"{FLOPS/dt/1e12:.1f} TFLOP/s ({FLOPS/dt/1e12/197*100:.0f}%)",
              flush=True)
    except Exception as e:
        print(f"{name} ({bq},{bk}): FAIL {str(e)[:160]}", flush=True)
