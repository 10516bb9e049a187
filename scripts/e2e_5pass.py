"""Measured full 5-G-buffer flagship inverse job (BASELINE north-star row 3).

Reference workload: nodes.py:187-213 loops the 5 G-buffer passes serially
through run_inverse_pass at 57 frames x 704x1280.  Here: one warm-up pass to
populate the compile cache (all 5 passes share one program -- context_index
and the normal mask are runtime inputs), then the full serial 5-pass job,
timed end to end including host->device upload and uint8 device->host
readback per pass.
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

FRAMES, H, W = 57, 704, 1280

net = DiTConfig()
dit = _init_bf16(net, jax.random.key(0), jnp.bfloat16, quant="w8a8")
vae = init_vae_params(jax.random.key(1), VAEConfig(), dtype=jnp.bfloat16)
pipe = DiffusionRendererPipeline(dit, vae, model_type="inverse", num_steps=15)
pipe.decode_chunk_frames = 4

# uint8 input video: the realistic case (decoded LDR frames) and the
# raw-upload fast path — ~5x faster transfer than bf16 (measured 4.4 s vs
# 23.7 s per flagship video); range map happens on device.
import torch
image = torch.randint(0, 256, (1, FRAMES, H, W, 3), dtype=torch.uint8,
                      generator=torch.Generator().manual_seed(7)).numpy()

# Warm-up: single pass compiles every program the 5-pass job will use.
t0 = time.perf_counter()
warm = api.inverse_render(pipe, image, passes=("basecolor",), batch_passes=False)
print(f"WARMUP_COMPILE_AND_RUN_S {time.perf_counter()-t0:.1f}", flush=True)
del warm
import gc; gc.collect()
time.sleep(30)  # axon runtime reclaims buffers asynchronously

t0 = time.perf_counter()
out = api.inverse_render(pipe, image, batch_passes=False)
dt = time.perf_counter() - t0
for k, v in out.items():
    print(f"  {k}: {v.shape} {v.dtype} mean={v.mean():.4f}")
print(f"E2E_5PASS_S {dt:.1f}  ({FRAMES} frames x 5 buffers; "
      f"{FRAMES/dt:.3f} input-frames/s/chip; {5*FRAMES/dt:.3f} output-frames/s/chip)",
      flush=True)
print(json.dumps(metrics.summary(), indent=1), flush=True)
