"""EDM training step for the DiT (framework capability beyond the
inference-only reference; also exercises the full multi-chip sharding stack).

Loss: EDM denoising score matching with the same preconditioning the sampler
uses (c_skip/c_out/c_in from model_diffusion_renderer.py:30-82):

    x_t = x0 + sigma * n,   n ~ N(0, I),   ln(sigma) ~ N(P_mean, P_std^2)
    D(x_t) = c_skip * x_t + c_out * F(c_in * x_t; sigma)
    L = E[ lambda(sigma) * ||D(x_t) - x0||^2 ],  lambda = (sigma^2 + sd^2)
        / (sigma * sd)^2   (the EDM weighting that makes the F-space target
        unit-variance)

Condition dropout zeroes latent_condition and context_index per-sample with
the config's condition_drop_rate (0.1 inverse / 0.05 forward — ref:
diffusion_renderer_config.py:163,227), which is what makes guidance>0 work
at inference.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import DiTConfig
from ..models.dit import dit_forward


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(
    learning_rate: float = 1e-4, weight_decay: float = 0.01
) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, b1=0.9, b2=0.95,
                       weight_decay=weight_decay)


def init_train_state(params: Any, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def edm_loss(
    params: Any,
    x0: jax.Array,
    latent_condition: jax.Array,
    context_index: jax.Array,
    key: jax.Array,
    cfg: DiTConfig,
    sigma_data: float = 0.5,
    p_mean: float = -1.2,
    p_std: float = 1.2,
    condition_drop_rate: float = 0.0,
    seq_sharding_constraint=None,
    block_executor=None,
) -> jax.Array:
    """x0: (B, T, H, W, C) clean latents (already sigma_data-scaled)."""
    b = x0.shape[0]
    k_sigma, k_noise, k_drop = jax.random.split(key, 3)

    log_sigma = p_mean + p_std * jax.random.normal(k_sigma, (b,), jnp.float32)
    sigma = jnp.exp(log_sigma)
    noise = jax.random.normal(k_noise, x0.shape, jnp.float32)

    sig = sigma[:, None, None, None, None]
    x_t = x0.astype(jnp.float32) + sig * noise

    c_in = 1.0 / jnp.sqrt(sig**2 + sigma_data**2)
    c_skip = sigma_data**2 / (sig**2 + sigma_data**2)
    c_out = sig * sigma_data / jnp.sqrt(sig**2 + sigma_data**2)

    if condition_drop_rate > 0:
        keep = (
            jax.random.uniform(k_drop, (b,)) >= condition_drop_rate
        )
        latent_condition = latent_condition * keep[:, None, None, None, None].astype(
            latent_condition.dtype
        )
        context_index = jnp.where(keep, context_index, 0)

    f = dit_forward(
        params,
        (x_t * c_in).astype(x0.dtype),
        sigma,
        latent_condition,
        context_index,
        cfg,
        seq_sharding_constraint=seq_sharding_constraint,
        block_executor=block_executor,
    ).astype(jnp.float32)

    denoised = c_skip * x_t + c_out * f
    weight = (sig**2 + sigma_data**2) / (sig * sigma_data) ** 2
    return jnp.mean(weight * jnp.square(denoised - x0.astype(jnp.float32)))


def make_train_step(
    cfg: DiTConfig,
    optimizer: optax.GradientTransformation,
    sigma_data: float = 0.5,
    condition_drop_rate: float = 0.0,
    seq_sharding_constraint=None,
    donate: bool = True,
    block_executor=None,
    grad_accum: int = 1,
):
    """Build the jitted train step: (state, batch, key) -> (state, loss).

    batch: dict with 'latents' (B,T,H,W,C), 'latent_condition', and
    'context_index'.  Under a mesh, params/opt_state carry their shardings and
    XLA emits the TP/SP/DP collectives.

    block_executor: optional pipeline-parallel scheduler from
    parallel.pipeline_parallel.make_pp_executor — the GPipe scan is
    differentiable, so the same executor serves training; pass remat=True
    there to keep per-stage activation memory at one microbatch.

    grad_accum: split the batch into this many microbatches along the batch
    axis (B must divide evenly) and accumulate gradients in a lax.scan
    before ONE optimizer update — effective batch B at the activation
    memory of B/grad_accum.  Each microbatch folds its index into the step
    key so sigma/noise/dropout draws stay independent.
    """

    def _loss(p, mb, key):
        return edm_loss(
            p,
            mb["latents"],
            mb["latent_condition"],
            mb["context_index"],
            key,
            cfg,
            sigma_data=sigma_data,
            condition_drop_rate=condition_drop_rate,
            seq_sharding_constraint=seq_sharding_constraint,
            block_executor=block_executor,
        )

    def step(state: TrainState, batch: Dict[str, jax.Array], key: jax.Array):
        if grad_accum <= 1:
            loss, grads = jax.value_and_grad(_loss)(state.params, batch, key)
        else:
            def split(x):
                b = x.shape[0]
                assert b % grad_accum == 0, (
                    f"batch {b} not divisible by grad_accum {grad_accum}")
                return x.reshape(grad_accum, b // grad_accum, *x.shape[1:])

            micro = jax.tree.map(split, batch)

            def accum(carry, inp):
                loss_sum, grads_sum = carry
                mb, i = inp
                l, g = jax.value_and_grad(_loss)(
                    state.params, mb, jax.random.fold_in(key, i))
                return (loss_sum + l,
                        jax.tree.map(jnp.add, grads_sum, g)), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                accum, (jnp.zeros((), jnp.float32), zeros),
                (micro, jnp.arange(grad_accum)))
            loss = loss / grad_accum
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())
