"""Serving-throughput benchmark: concurrent 512x512 inverse requests.

Measures the batching executor (serving.ServingExecutor) on the interactive
shape at two batching policies:

* max_batch=1 — pure pipelining: each request is its own dispatch; the
  worker thread keeps the device busy while uploads/readbacks of neighboring
  requests overlap.
* max_batch=4 — requests merge into one data-parallel program (amortizes
  per-dispatch cost; on multi-chip meshes the batch rows ride the data axis).

Every request carries a DISTINCT image and seed (the axon tunnel caches
value-identical computations server-side), and the warmup requests differ
from the timed ones.  Methodology per BASELINE.md.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax, jax.numpy as jnp, numpy as np
from bench import _init_bf16
from diffusionrenderer_tpu.config import DiTConfig, VAEConfig
from diffusionrenderer_tpu.models.vae import init_vae_params
from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline
from diffusionrenderer_tpu.serving import ServingExecutor
import logging; logging.basicConfig(level=logging.WARNING)

H, W, N = 512, 512, 8

net = DiTConfig()
dit = _init_bf16(net, jax.random.key(0), jnp.bfloat16, quant="w8a8")
vae = init_vae_params(jax.random.key(1), VAEConfig(), dtype=jnp.bfloat16)
pipe = DiffusionRendererPipeline(dit, vae, model_type="inverse", num_steps=15)

rng = np.random.default_rng(7)
# uint8 images: the raw-upload fast path (what a decoded photo batch is).
images = rng.integers(0, 256, (2 * N + 8, 1, H, W, 3), np.uint8)


def run(max_batch: int, img_offset: int) -> float:
    ex = ServingExecutor(pipe, max_batch=max_batch, max_wait_ms=30.0)
    try:
        # Warmup: compile every bucket size this policy can produce
        # (dispatcher grouping is timing-dependent; sizes 1..max_batch).
        futs = [
            ex.submit({"rgb": images[img_offset + N + j][None],
                       "context_index": np.array([j % 5], np.int32)},
                      seed=1000 + j)
            for j in range(max_batch)
        ]
        # Also a singleton bucket (a late straggler batch of 1).
        futs.append(ex.submit(
            {"rgb": images[img_offset + N + max_batch][None],
             "context_index": np.array([0], np.int32)}, seed=1999))
        for f in futs:
            f.result(timeout=900)

        t0 = time.perf_counter()
        futs = [
            ex.submit({"rgb": images[img_offset + j][None],
                       "context_index": np.array([j % 5], np.int32)},
                      seed=j)
            for j in range(N)
        ]
        outs = [f.result(timeout=900) for f in futs]
        dt = time.perf_counter() - t0
        for o in outs:
            assert o.shape == (1, 1, H, W, 3) and o.dtype == np.uint8
        return dt
    finally:
        ex.shutdown()


for max_batch in (1, 4):
    dt = run(max_batch, img_offset=0 if max_batch == 1 else N)
    print(f"SERVING_512x512_N{N}_MAXBATCH{max_batch}_S {dt:.2f}  "
          f"({N/dt:.2f} req/s, {dt/N*1e3:.0f} ms/req effective)", flush=True)
