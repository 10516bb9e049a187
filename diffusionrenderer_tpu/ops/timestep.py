"""Sinusoidal timestep (sigma) embedding + AdaLN-LoRA projection.

Reproduces CleanTimesteps / CleanTimestepEmbedding semantics
(/root/reference/CleanGeneralDIT.py:316-372):

* sinusoid computed in fp32, concatenated in [cos, sin] order, cast back to
  the input dtype;
* the shared AdaLN-LoRA vector is Linear(D->D, no bias) -> SiLU ->
  Linear(D->3D, no bias) applied to the sinusoid;
* critically, the *main* embedding handed to the AdaLN blocks is the RAW
  sinusoid, not the MLP output (ref: CleanGeneralDIT.py:362-370).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sinusoidal_embedding(timesteps: jax.Array, dim: int) -> jax.Array:
    """(B,) -> (B, dim) sinusoidal embedding, [cos, sin] concat order.

    The EDM sampler feeds raw sigma values (80 .. 0.02) here — the DiT is
    conditioned on sigma directly (ref: model_diffusion_renderer.py:227).
    """
    in_dtype = timesteps.dtype
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    freqs = jnp.exp(exponent)
    angles = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1)
    return emb.astype(in_dtype)


def timestep_embedding(
    timesteps: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    dim: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (main_emb (B, D), adaln_lora (B, 3D)).

    main_emb is the raw sinusoid; adaln_lora = W2 @ silu(W1 @ sinusoid).
    Weight layout: w1 (D, D), w2 (D, 3D), both applied as x @ W.
    """
    sinusoid = sinusoidal_embedding(timesteps, dim)
    h = sinusoid @ w1
    h = jax.nn.silu(h)
    lora = h @ w2
    return sinusoid, lora
