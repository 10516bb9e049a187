"""EDM Euler scheduler — pure fp32 functions + a jitted lax.scan sampler.

Numerics match CleanEDMEulerScheduler
(/root/reference/model_diffusion_renderer.py:16-82) exactly:

* sigma table: logspace(log10 sigma_max -> log10 sigma_min, N) + terminal 0,
  computed in fp32 (ref :23-28);
* scale_model_input: c_in = 1/sqrt(sigma^2 + sigma_data^2), fp32 math,
  cast back (ref :30-44);
* step: c_skip = sd^2/(s^2+sd^2), c_out = s*sd/sqrt(s^2+sd^2),
  denoised = c_skip*x + c_out*F(x), Euler x += (x - denoised)/s * (s_next - s),
  all fp32, result cast back (ref :46-82).

Instead of the reference's stateful Python loop with a mutable current_step,
the whole denoise trajectory is a single `lax.scan` over the static sigma
table — compiled once, zero host round-trips between steps.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def edm_sigmas(num_steps: int, sigma_max: float = 80.0,
               sigma_min: float = 0.02) -> jax.Array:
    """(num_steps + 1,) fp32 sigma table with terminal zero."""
    sigmas = np.logspace(
        np.log10(sigma_max), np.log10(sigma_min), num_steps, dtype=np.float64
    ).astype(np.float32)
    return jnp.asarray(np.concatenate([sigmas, np.zeros(1, np.float32)]))


def scale_model_input(sample: jax.Array, sigma: jax.Array,
                      sigma_data: float = 0.5) -> jax.Array:
    orig_dtype = sample.dtype
    s = sample.astype(jnp.float32)
    sig = jnp.asarray(sigma, jnp.float32)
    c_in = 1.0 / jnp.sqrt(sig**2 + sigma_data**2)
    return (s * c_in).astype(orig_dtype)


def edm_step(
    model_output: jax.Array,
    sigma: jax.Array,
    sigma_next: jax.Array,
    sample: jax.Array,
    sigma_data: float = 0.5,
) -> jax.Array:
    orig_dtype = sample.dtype
    f = model_output.astype(jnp.float32)
    x = sample.astype(jnp.float32)
    s = jnp.asarray(sigma, jnp.float32)
    s_next = jnp.asarray(sigma_next, jnp.float32)

    c_skip = sigma_data**2 / (s**2 + sigma_data**2)
    c_out = (s * sigma_data) / jnp.sqrt(s**2 + sigma_data**2)
    denoised = c_skip * x + c_out * f
    derivative = (x - denoised) / s
    prev = x + derivative * (s_next - s)
    return prev.astype(orig_dtype)


def sample_edm(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    x_init: jax.Array,
    sigmas: jax.Array,
    sigma_data: float = 0.5,
) -> jax.Array:
    """Run the full Euler trajectory as one scan.

    denoise_fn(x_scaled, sigma_scalar) -> F(x) with the same shape as x;
    x_init must already be scaled by sigmas[0] (ref:
    model_diffusion_renderer.py:222: xt = randn * sigma_max).
    """
    pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)  # (N, 2)

    def step(x, pair):
        sigma, sigma_next = pair[0], pair[1]
        x_scaled = scale_model_input(x, sigma, sigma_data)
        f = denoise_fn(x_scaled, sigma)
        x_next = edm_step(f, sigma, sigma_next, x, sigma_data)
        return x_next, None

    x_final, _ = jax.lax.scan(step, x_init, pairs)
    return x_final
