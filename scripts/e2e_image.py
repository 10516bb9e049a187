"""Interactive-latency measurement: single-frame 512x512 inverse, all 5
G-buffers (BASELINE config #1 shape on real hardware).

The reference treats single images as 1-frame videos (nodes.py:154-179;
CleanVAE.py:34-42 frame math gives latent_T=1).  This is the interactive
use case — one photograph -> 5 G-buffer maps — where per-dispatch latency,
not throughput, matters.  W8A8 weights (the single-chip deployment mode).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import jax, jax.numpy as jnp, numpy as np
from bench import _init_bf16
from diffusionrenderer_tpu.config import DiTConfig, VAEConfig
from diffusionrenderer_tpu.models.vae import init_vae_params
from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline
from diffusionrenderer_tpu import api
from diffusionrenderer_tpu.utils.profiling import metrics
import logging; logging.basicConfig(level=logging.INFO)

H, W = 512, 512

net = DiTConfig()
dit = _init_bf16(net, jax.random.key(0), jnp.bfloat16, quant="w8a8")
vae = init_vae_params(jax.random.key(1), VAEConfig(), dtype=jnp.bfloat16)
pipe = DiffusionRendererPipeline(dit, vae, model_type="inverse", num_steps=15)

import torch
# Distinct warmup vs steady images: the axon tunnel caches value-identical
# computations server-side, so re-running the warmup's exact (image, seed,
# context_index) would return cached results and flatter the timing.
g = torch.Generator().manual_seed(7)
image = torch.randint(0, 256, (1, 1, H, W, 3), dtype=torch.uint8,
                      generator=g).numpy()
image2 = torch.randint(0, 256, (1, 1, H, W, 3), dtype=torch.uint8,
                       generator=g).numpy()
image3 = torch.randint(0, 256, (1, 1, H, W, 3), dtype=torch.uint8,
                       generator=g).numpy()

# Warm-up compiles; serial mode shares one program across the 5 passes.
t0 = time.perf_counter()
warm = api.inverse_render(pipe, image, passes=("basecolor",), batch_passes=False)
print(f"WARMUP_COMPILE_AND_RUN_S {time.perf_counter()-t0:.1f}", flush=True)
del warm
time.sleep(10)

# Steady: the serial 5-pass job (timed), then the batched-B5 variant —
# at 1024 tokens all five rows fit one chip comfortably, so batching is
# the single-dispatch fast path for images (unlike flagship video).
t0 = time.perf_counter()
out = api.inverse_render(pipe, image2, batch_passes=False)
dt_serial = time.perf_counter() - t0
print(f"E2E_IMAGE_5PASS_SERIAL_S {dt_serial:.2f}", flush=True)

t0 = time.perf_counter()
out_b = api.inverse_render(pipe, image2, batch_passes=True)
dt_batched_compile = time.perf_counter() - t0
t0 = time.perf_counter()
out_b = api.inverse_render(pipe, image3, batch_passes=True)
dt_batched = time.perf_counter() - t0
for k, v in out_b.items():
    print(f"  {k}: {v.shape} {v.dtype} mean={v.mean():.4f}")
print(f"E2E_IMAGE_5PASS_BATCHED_S {dt_batched:.2f} "
      f"(first incl. compile {dt_batched_compile:.1f}); "
      f"serial {dt_serial:.2f}s -> batched speedup "
      f"{dt_serial/dt_batched:.2f}x", flush=True)
print(json.dumps(metrics.summary(), indent=1), flush=True)
