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

# Init the 7B weights ON HOST: quantizing on device would hold bf16
# (13.5 GiB) + int8 (6.7 GiB) simultaneously — over the ~14.5 GiB HBM.
# Per-element RNG is unusable on this one-core host for 7.2e9 elements
# (jax threefry killed at 40 min; torch.randn ~1-2 M elems/s would be
# ~an hour) — so draw ONE 4M-element normal base buffer and fill each
# leaf by tiling it with a per-leaf roll offset.  The distribution only
# needs to be representative (normal*0.02 matmuls, ones for 1-D
# norm/scale leaves): this probe measures quantization damage, not a
# checkpoint, and per-channel quant scales see 4M distinct values.
import zlib

import ml_dtypes
import torch

shapes = jax.eval_shape(
    lambda k: init_dit_params(k, net, dtype=jnp.bfloat16), jax.random.key(0)
)
_BASE = (
    (torch.randn(1 << 22, generator=torch.Generator().manual_seed(0)) * 0.02)
    .to(torch.bfloat16).view(torch.int16).numpy()
)  # int16 view of bf16 bits; tiling/rolling int16 is a plain memcpy


def _host_leaf(path, sd):
    names = "/".join(str(p) for p in path)
    if len(sd.shape) <= 1 or "norm" in names:
        return np.ones(sd.shape, ml_dtypes.bfloat16)
    off = zlib.crc32(names.encode()) % _BASE.size
    flat = np.resize(np.roll(_BASE, -off), int(np.prod(sd.shape)))
    return flat.reshape(sd.shape).view(ml_dtypes.bfloat16)


host_params = jax.tree_util.tree_map_with_path(_host_leaf, shapes)
print("host init done", flush=True)


def _quantize_host(params, act_quant):
    out = dict(params)
    blocks = {}
    for sub, names in QUANTIZED_BLOCK_WEIGHTS.items():
        bp = {k: jnp.asarray(v) for k, v in params["blocks"][sub].items()
              if k not in names}
        for name in names:
            bp[name] = quantize_tensor_host(params["blocks"][sub][name],
                                            act_quant=act_quant)
        blocks[sub] = bp
    out["blocks"] = blocks
    return {k: (v if k == "blocks" else jax.tree.map(jnp.asarray, v))
            for k, v in out.items()}


outs = {}
for mode in ("bf16", "w8", "w8a8"):
    if mode in ("w8", "w8a8"):
        params = _quantize_host(host_params, act_quant=mode == "w8a8")
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

for mode in ("w8", "w8a8"):
    p = psnr(outs["bf16"], outs[mode], peak=255.0)
    print(f"PSNR_{mode.upper()}_VS_BF16_dB {p:.2f}  (full 7B, 512x512, "
          f"15 steps, identical noise)", flush=True)
