import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from bench import _init_bf16
from diffusionrenderer_tpu.config import DiTConfig, VAEConfig, get_inverse_renderer_config
from diffusionrenderer_tpu.models.vae import init_vae_params
from diffusionrenderer_tpu import pipeline as P

net_cfg = DiTConfig()
dit = _init_bf16(net_cfg, jax.random.key(0), jnp.bfloat16, quant="w8")
vae = init_vae_params(jax.random.key(1), VAEConfig(), dtype=jnp.bfloat16)
cfg = get_inverse_renderer_config(704, 1280, 57)
video = jax.random.uniform(jax.random.key(2), (1, 57, 704, 1280, 3), jnp.bfloat16) * 2 - 1
t0=time.perf_counter()
lc = P._encode_conditions_jit(vae, (video,), cfg=cfg, present=(True,))
print("ENCODE_OK", lc.shape, (np.asarray(lc[0,-1,-1,-1,-1]), round(time.perf_counter()-t0,1)), flush=True)
t0=time.perf_counter()
sample = P._sample_jit(dit, lc, jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(42),
                       jnp.asarray(0.0), cfg=cfg, num_steps=2, use_cfg=False)
_=np.asarray(sample[0,-1,-1,-1,-1])
print("SAMPLE_OK", sample.shape, round(time.perf_counter()-t0,1), flush=True)
del lc
t0=time.perf_counter()
u8 = P._decode_jit(vae, sample, jnp.zeros((1,)), cfg=cfg)
_=np.asarray(u8[0,-1,-1,-1,-1])
print("DECODE_OK", u8.shape, round(time.perf_counter()-t0,1), flush=True)
