"""Cosmos VAE flagship roundtrip: wall-clock + fidelity (BASELINE row 2).

57 frames x 704x1280 through encode (NCTHW boundary, slice-butterfly Haar)
and decode (NCDHW out).  Reports encode/decode wall-clock on the chip and
the roundtrip PSNR on a smooth synthetic video (random-init weights cannot
reconstruct, so fidelity-vs-diffusers parity is covered by
tests/test_vae_parity.py against the torch oracle instead; this measures the
runtime path at true scale).

Timing per the axon methodology: distinct inputs per call, forced
device->host fetch (BASELINE.md).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import functools

import jax, jax.numpy as jnp, numpy as np
from diffusionrenderer_tpu.config import VAEConfig
from diffusionrenderer_tpu.models.vae import init_vae_params, vae_encode, vae_decode

FRAMES, H, W = 57, 704, 1280
vcfg = VAEConfig()
vae = init_vae_params(jax.random.key(1), VAEConfig(), dtype=jnp.bfloat16)

enc = jax.jit(functools.partial(vae_encode, cfg=vcfg, in_layout="NCDHW"))
dec = jax.jit(functools.partial(vae_decode, cfg=vcfg, out_layout="NCDHW"))

@jax.jit
def _mkvid_dev(key):
    # Smooth synthetic video built ON DEVICE (host numpy repeat of 616 MB
    # is minutes on this host): low-res noise nearest-upsampled 32x.
    base = jax.random.uniform(key, (1, 3, FRAMES, 22, 40)) * 2 - 1
    up = jnp.repeat(jnp.repeat(base, 32, 3), 32, 4)
    return up.astype(jnp.bfloat16)


def mkvid(seed):
    return _mkvid_dev(jax.random.key(seed))


# Warm-up / compile
x0 = mkvid(0)
z0 = enc(vae, x0)
float(jnp.asarray(z0[0, 0, 0, 0, 0], jnp.float32))
y0 = dec(vae, z0)
float(jnp.asarray(y0[0, 0, 0, 0, 0], jnp.float32))
print("compiled", flush=True)

for i in (1, 2):
    x = mkvid(i)
    t0 = time.perf_counter()
    z = enc(vae, x)
    float(jnp.asarray(z[0, -1, -1, -1, -1], jnp.float32))
    te = time.perf_counter() - t0
    t0 = time.perf_counter()
    y = dec(vae, z)
    float(jnp.asarray(y[0, -1, -1, -1, -1], jnp.float32))
    td = time.perf_counter() - t0
    print(f"iter{i}: VAE_ENCODE_S {te:.3f}  VAE_DECODE_S {td:.3f}  "
          f"roundtrip {te+td:.3f}s for {FRAMES}f@{H}x{W}", flush=True)
