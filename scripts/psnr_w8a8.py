"""W8A8 quantization accuracy at full 7B scale (NOTES.md item 3).

Runs BASELINE config #1 (single-frame 512x512 inverse, 15 EDM steps) through
the FULL 7B pipeline twice on the chip — bf16 weights, then the same weights
quantized to W8A8 (per-channel int8 weights + runtime per-token int8
activations) — identical noise, and reports PSNR between the two uint8
outputs.  Random-init weights (no real checkpoint in this environment), so
this bounds the numeric damage of the int8 path through 15 steps x 28 blocks
of accumulated quantization error, not task quality.

bf16 7B (13.5 GiB) fits the chip at 1,024 tokens; the two variants run
sequentially and weights are dropped in between to stay under the HBM
ceiling.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import gc
import time

import jax, jax.numpy as jnp, numpy as np
from diffusionrenderer_tpu.config import DiTConfig, VAEConfig
from diffusionrenderer_tpu.models.dit import init_dit_params
from diffusionrenderer_tpu.models.quant import (
    QUANTIZED_BLOCK_WEIGHTS, quantize_tensor_host,
)
from diffusionrenderer_tpu.models.vae import init_vae_params
from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline
from diffusionrenderer_tpu.utils.metrics import psnr
import logging; logging.basicConfig(level=logging.INFO)

net = DiTConfig()
vae = init_vae_params(jax.random.key(1), VAEConfig(), dtype=jnp.bfloat16)
rng = np.random.default_rng(3)
image = rng.random((1, 1, 512, 512, 3), np.float32)
batch = lambda: {"rgb": image * 2 - 1,
                 "context_index": jnp.zeros((1,), jnp.int32)}

# Init the 7B weights ON HOST (CPU backend): quantizing on device would hold
# bf16 (13.5 GiB) + int8 (6.7 GiB) simultaneously — over the ~14.5 GiB HBM.
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    host_params = init_dit_params(jax.random.key(0), net, dtype=jnp.bfloat16)
host_params = jax.tree.map(np.asarray, host_params)
print("host init done", flush=True)


def _quantize_host(params):
    out = dict(params)
    blocks = {}
    for sub, names in QUANTIZED_BLOCK_WEIGHTS.items():
        bp = {k: jnp.asarray(v) for k, v in params["blocks"][sub].items()
              if k not in names}
        for name in names:
            bp[name] = quantize_tensor_host(params["blocks"][sub][name],
                                            act_quant=True)
        blocks[sub] = bp
    out["blocks"] = blocks
    return {k: (v if k == "blocks" else jax.tree.map(jnp.asarray, v))
            for k, v in out.items()}


outs = {}
for mode in ("bf16", "w8a8"):
    if mode == "w8a8":
        params = _quantize_host(host_params)
    else:
        params = jax.tree.map(jnp.asarray, host_params)
    pipe = DiffusionRendererPipeline(params, vae, model_type="inverse",
                                     num_steps=15)
    t0 = time.perf_counter()
    out = np.asarray(pipe.generate(batch(), seed=42))
    print(f"{mode}: {time.perf_counter()-t0:.1f}s out={out.shape}", flush=True)
    outs[mode] = out.astype(np.float32)
    del params, pipe, out
    gc.collect()
    time.sleep(20)  # axon frees buffers asynchronously

p = psnr(outs["bf16"], outs["w8a8"], peak=255.0)
print(f"PSNR_W8A8_VS_BF16_dB {p:.2f}  (full 7B, 512x512, 15 steps, "
      f"identical noise)", flush=True)
