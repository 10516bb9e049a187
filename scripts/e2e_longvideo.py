"""End-to-end long-video inverse pass: 121 frames @ 704x1280, one chip.

The reference implicitly caps at 57 frames (single-GPU memory for the
28,160-token attention); this framework's flash kernel + staged pipeline
run 2x that sequence (latent T=16 -> 56,320 tokens) on one v5e under W8A8.
The DiT step alone measures 11.66 s at 179.3 TFLOP/s (BASELINE.md); this
script proves the FULL pipeline — 121-frame causal VAE encode, 15-step
denoise, chunked decode, host readback — fits and measures the wall.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import gc
import json
import time

import jax, jax.numpy as jnp, numpy as np
import torch

from bench import _init_bf16
from diffusionrenderer_tpu.config import DiTConfig, VAEConfig
from diffusionrenderer_tpu.models.vae import init_vae_params
from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline
from diffusionrenderer_tpu.utils.profiling import metrics
import logging; logging.basicConfig(level=logging.INFO)

T = 121
QUANT = sys.argv[1] if len(sys.argv) > 1 else "w8"
try:
    from diffusionrenderer_tpu.models.quant import parse_quant_mode
    parse_quant_mode(QUANT)  # validate: a typo must not silently run w8
except ValueError as e:
    sys.exit(f"usage: {sys.argv[0]} [w8|w8a8|w8a8_g128|...]: {e}")

net = DiTConfig()
# w8 default — the measured fastest long-video mode (round 4, both run
# end-to-end on the chip): weight-only int8 249.3 s steady vs W8A8 332.6 s.
# W8A8 at this length routes through the fused Pallas matmul kernel
# (models/quant._use_fused_kernel), which FIXED round 2's OOM — the int32
# matmul result stays in VMEM scratch (memory_analysis, scripts/
# mem_w8a8_longvideo.py: denoise temp 6.67 GiB vs the XLA path's 8.19 GiB;
# peak(temp+args) 13.28 GiB < ~14.5 usable) — but the kernel's ~95 TFLOP/s
# int8 rate loses to XLA's bf16 matmuls (~160 TFLOP/s) at 56,320 tokens,
# so fitting != winning.  Pass 'w8a8' to reproduce the 332.6 s run.
dit = _init_bf16(net, jax.random.key(0), jnp.bfloat16, quant=QUANT)
vae = init_vae_params(jax.random.key(1), VAEConfig(), dtype=jnp.bfloat16)
pipe = DiffusionRendererPipeline(dit, vae, model_type="inverse", num_steps=15)
pipe.decode_chunk_frames = 2  # latent frames per decode dispatch at T_lat=16

video = torch.randint(0, 256, (1, T, 704, 1280, 3), dtype=torch.uint8,
                      generator=torch.Generator().manual_seed(2)).numpy()
t0 = time.perf_counter()
out = pipe.generate({"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)},
                    seed=42)
print(f"E2E_LONGVIDEO_COMPILE_AND_RUN_S {time.perf_counter()-t0:.1f} "
      f"out={out.shape} {out.dtype}", flush=True)
del out
gc.collect()
time.sleep(30)
t0 = time.perf_counter()
out = pipe.generate({"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)},
                    seed=43)
dt = time.perf_counter() - t0
print(f"E2E_LONGVIDEO_STEADY_S {dt:.1f}  [{QUANT}] ({T} frames @ 704x1280, "
      f"{T/dt:.3f} frames/s/chip, 56,320-token denoise)", flush=True)
print(json.dumps(metrics.summary(), indent=1), flush=True)
