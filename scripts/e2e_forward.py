"""Measured flagship forward (relighting) pass (BASELINE north-star row 4).

Reference workload: nodes.py:245-310 -- 5 G-buffer videos + an HDR panorama
-> envmap preprocessing (panorama -> cubemap -> per-frame projection,
tonemapped LDR + log encodings) -> 136-channel latent conditioning -> one
diffusion pass at 57 frames x 704x1280.  Timed end to end: envmap
preprocessing, 8 VAE condition encodes, 15-step denoise, decode, readback.
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

net = DiTConfig(additional_concat_ch=17 * 8, use_context_embedding=False)
dit = _init_bf16(net, jax.random.key(0), jnp.bfloat16, quant="w8a8")
vae = init_vae_params(jax.random.key(1), VAEConfig(), dtype=jnp.bfloat16)
pipe = DiffusionRendererPipeline(dit, vae, model_type="forward", num_steps=15)
pipe.decode_chunk_frames = 4

import torch
# uint8 G-buffers: the realistic input (LDR frames / inverse-pass outputs)
# and the raw-upload fast path — uint8 transfers ~5x faster than bf16 over
# the tunnel (measured 4.4 s vs 23.7 s per flagship video) and range-maps
# [0,255]->[-1,1] on device (pipeline._cond_to_ncdhw).
gb = {k: torch.randint(0, 256, (1, FRAMES, H, W, 3), dtype=torch.uint8,
                       generator=torch.Generator().manual_seed(i)).numpy()
      for i, k in enumerate(("depth", "normal", "roughness", "metallic",
                             "base_color"))}
# Synthetic HDR panorama (equirect 512x1024), values above 1 as real HDRs have.
rng = np.random.default_rng(11)
env = (rng.random((512, 1024, 3), np.float32) ** 2) * 8.0

def run(seed):
    return api.forward_render(
        pipe, gb["depth"], gb["normal"], gb["roughness"], gb["metallic"],
        gb["base_color"], env, seed=seed)

t0 = time.perf_counter()
out = run(seed=42)
print(f"WARMUP_COMPILE_AND_RUN_S {time.perf_counter()-t0:.1f} out={out.shape}",
      flush=True)
del out
import gc; gc.collect()
time.sleep(30)  # axon runtime reclaims buffers asynchronously

t0 = time.perf_counter()
out = run(seed=43)
dt = time.perf_counter() - t0
print(f"E2E_FORWARD_S {dt:.1f}  ({FRAMES} frames relit; "
      f"{FRAMES/dt:.3f} frames/s/chip)  out={out.shape} mean={out.mean():.4f}",
      flush=True)
print(json.dumps(metrics.summary(), indent=1), flush=True)
