"""Flagship inverse pass WITH classifier-free guidance (guidance=2.0).

The reference's *node* defaults guidance to 0.0 but its *config* default is
2.0 (diffusion_renderer_config.py:181; nodes.py:123) — with guidance > 0
the model wrapper runs a (condition, uncondition) pair per step
(model_diffusion_renderer.py:230-232).  This framework batches the CFG pair
into the batch axis (one forward of B=2, not two forwards; pipeline.py) —
this script measures whether that doubled-activation flagship program still
fits one v5e under W8A8 and what it costs end to end.
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

net = DiTConfig()
dit = _init_bf16(net, jax.random.key(0), jnp.bfloat16, quant="w8a8")
vae = init_vae_params(jax.random.key(1), VAEConfig(), dtype=jnp.bfloat16)
pipe = DiffusionRendererPipeline(dit, vae, model_type="inverse",
                                 guidance=2.0, num_steps=15)
pipe.decode_chunk_frames = 4

video = torch.randint(0, 256, (1, 57, 704, 1280, 3), dtype=torch.uint8,
                      generator=torch.Generator().manual_seed(2)).numpy()
t0 = time.perf_counter()
out = pipe.generate({"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)},
                    seed=42)
print(f"E2E_CFG_COMPILE_AND_RUN_S {time.perf_counter()-t0:.1f} "
      f"out={out.shape} {out.dtype}", flush=True)
del out
gc.collect()
time.sleep(30)  # axon frees buffers asynchronously
t0 = time.perf_counter()
out = pipe.generate({"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)},
                    seed=43)
print(f"E2E_CFG_STEADY_S {time.perf_counter()-t0:.1f}  (guidance=2.0, "
      f"CFG pair batched into one B=2 forward/step)", flush=True)
print(json.dumps(metrics.summary(), indent=1), flush=True)
