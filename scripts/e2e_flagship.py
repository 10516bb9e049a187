import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from bench import _init_bf16
from diffusionrenderer_tpu.config import DiTConfig, VAEConfig
from diffusionrenderer_tpu.models.vae import init_vae_params
from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline
from diffusionrenderer_tpu.utils.profiling import metrics
import logging; logging.basicConfig(level=logging.INFO)

net = DiTConfig()
dit = _init_bf16(net, jax.random.key(0), jnp.bfloat16, quant="w8a8")
vae = init_vae_params(jax.random.key(1), VAEConfig(), dtype=jnp.bfloat16)
pipe = DiffusionRendererPipeline(dit, vae, model_type="inverse", num_steps=15)
pipe.decode_chunk_frames = 4
# Host video: the runtime lane-pads device channels-last buffers ~42x, so the
# pipeline ingests host arrays and uploads merged (see pipeline._generate_inner).
# uint8 = the realistic decoded-frames input and the raw-upload fast path
# (~5x faster transfer than bf16; range map [0,255]->[-1,1] on device).
import torch
video = torch.randint(0, 256, (1, 57, 704, 1280, 3), dtype=torch.uint8,
                      generator=torch.Generator().manual_seed(2)).numpy()
batch = {"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)}
t0 = time.perf_counter()
out = pipe.generate(batch, seed=42)
print(f"E2E_COMPILE_AND_RUN_S {time.perf_counter()-t0:.1f} out={out.shape} {out.dtype}", flush=True)
del out
import gc; gc.collect()
time.sleep(30)  # axon runtime reclaims asynchronously; let gen-1 buffers drain
t0 = time.perf_counter()
out = pipe.generate({"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)}, seed=43)
print(f"E2E_STEADY_S {time.perf_counter()-t0:.1f}", flush=True)
import json
print(json.dumps(metrics.summary(), indent=1), flush=True)
