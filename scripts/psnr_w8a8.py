"""int8 quantization accuracy at full 7B scale (NOTES.md item 3 /
VERDICT r3 item 1).

Runs BASELINE config #1 (single-frame 512x512 inverse, 15 EDM steps) through
the FULL 7B pipeline on the chip — bf16 weights first, then each requested
quantized variant of the same weights — identical noise, and reports PSNR of
each variant's uint8 output vs the bf16 run.  Random-init weights (no real
checkpoint in this environment), so this bounds the numeric damage of the
int8 path through 15 steps x 28 blocks of accumulated quantization error,
not task quality.

Usage: python scripts/psnr_w8a8.py [mode ...]
Modes: w8, w8a8 (per-output-channel scales), a _gN suffix selects per-group
scales of N input rows (w8a8_g128, w8_g512, ...), a _keepres suffix keeps
the residual-stream projections (wo, w2) bf16, a _keepattn suffix keeps all
four attention projections bf16 (MLP-only int8).  Default: w8 w8a8.

bf16 7B (13.5 GiB) fits the chip at 1,024 tokens; variants run sequentially
and weights are dropped in between to stay under the HBM ceiling.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import gc
import time

import jax, jax.numpy as jnp, numpy as np
from diffusionrenderer_tpu.config import DiTConfig, VAEConfig
from diffusionrenderer_tpu.models.dit import init_dit_params
from diffusionrenderer_tpu.models.quant import (
    QUANTIZED_BLOCK_WEIGHTS, parse_quant_mode, quantize_tensor_host,
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


def _quantize_host(params, act_quant, group_size=None, keep=()):
    out = dict(params)
    blocks = {}
    for sub, names in QUANTIZED_BLOCK_WEIGHTS.items():
        bp = {k: jnp.asarray(v) for k, v in params["blocks"][sub].items()
              if k not in names}
        for name in names:
            src = params["blocks"][sub][name]
            if name in keep or f"{sub}.{name}" in keep:
                bp[name] = jnp.asarray(src)
            else:
                bp[name] = quantize_tensor_host(
                    src, act_quant=act_quant, group_size=group_size)
        blocks[sub] = bp
    out["blocks"] = blocks
    return {k: (v if k == "blocks" else jax.tree.map(jnp.asarray, v))
            for k, v in out.items()}


modes = sys.argv[1:] or ["w8", "w8a8"]
# uint8 outputs are tiny (786 KB) — cache per-mode results on disk so an
# interrupted sweep never re-runs finished modes (a bf16 run alone is ~9
# minutes of upload+compile through the tunnel).
CACHE = os.environ.get("PSNR_CACHE", "/tmp/psnr_quant_cache")
os.makedirs(CACHE, exist_ok=True)


def _run_mode(mode):
    path = os.path.join(CACHE, f"{mode}.npy")
    if os.path.exists(path):
        print(f"{mode}: cached", flush=True)
        return np.load(path).astype(np.float32)
    if mode == "bf16":
        params = jax.tree.map(jnp.asarray, host_params)
    else:
        params = _quantize_host(host_params, *parse_quant_mode(mode))
    pipe = DiffusionRendererPipeline(params, vae, model_type="inverse",
                                     num_steps=15)
    t0 = time.perf_counter()
    out = np.asarray(pipe.generate(batch(), seed=42))
    print(f"{mode}: {time.perf_counter()-t0:.1f}s out={out.shape}", flush=True)
    np.save(path, out)
    del params, pipe
    gc.collect()
    time.sleep(20)  # axon frees buffers asynchronously
    return out.astype(np.float32)


ref = _run_mode("bf16")
for mode in modes:
    out = _run_mode(mode)
    p = psnr(ref, out, peak=255.0)
    print(f"PSNR_{mode.upper()}_VS_BF16_dB {p:.2f}  (full 7B, 512x512, "
          f"15 steps, identical noise)", flush=True)
