"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The invariant that matters: sharded execution (DP x SP x TP) produces the
same numbers as single-device execution — XLA's collectives are an
implementation detail, not a numerics change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.dit import dit_forward, init_dit_params
from diffusionrenderer_tpu.parallel import (
    batch_sharding,
    dit_param_shardings,
    make_mesh,
    shard_params,
    token_sharding_constraint,
)
from diffusionrenderer_tpu.training import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

CFG = DiTConfig(
    model_channels=64,
    num_blocks=2,
    num_heads=4,
    adaln_lora_dim=8,
    crossattn_emb_channels=16,
    additional_concat_ch=16,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
    b, t, h, w = 4, 2, 8, 8
    x = jax.random.normal(jax.random.key(1), (b, t, h, w, 16))
    cond = jax.random.normal(jax.random.key(2), (b, t, h, w, 16))
    sigma = jnp.full((b,), 7.5)
    ctx = jnp.array([0, 1, 2, 3], jnp.int32)
    return params, x, sigma, cond, ctx


class TestShardedForward:
    def test_matches_single_device(self, setup):
        params, x, sigma, cond, ctx = setup
        expected = np.asarray(dit_forward(params, x, sigma, cond, ctx, CFG))

        mesh = make_mesh(8)  # data=2, seq=2, tensor=2
        sharded_params = shard_params(params, dit_param_shardings(params, mesh))
        bs = batch_sharding(mesh)
        xs = jax.device_put(x, bs)
        conds = jax.device_put(cond, bs)
        constraint = token_sharding_constraint(mesh)

        @jax.jit
        def fwd(p, x, s, c, ci):
            return dit_forward(
                p, x, s, c, ci, CFG, seq_sharding_constraint=constraint
            )

        with mesh:
            got = np.asarray(fwd(sharded_params, xs, sigma, conds, ctx))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_tensor_only_mesh(self, setup):
        params, x, sigma, cond, ctx = setup
        expected = np.asarray(dit_forward(params, x, sigma, cond, ctx, CFG))
        mesh = make_mesh(8, data=1, seq=1, tensor=8)
        sharded_params = shard_params(params, dit_param_shardings(params, mesh))
        with mesh:
            got = np.asarray(
                jax.jit(
                    lambda p: dit_forward(p, x, sigma, cond, ctx, CFG)
                )(sharded_params)
            )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestShardedTraining:
    def test_train_step_runs_and_descends(self, setup):
        params, x, _, cond, ctx = setup
        mesh = make_mesh(8)
        sharded = shard_params(params, dit_param_shardings(params, mesh))
        opt = make_optimizer(1e-3)
        state = init_train_state(sharded, opt)
        step = make_train_step(
            CFG, opt, condition_drop_rate=0.1,
            seq_sharding_constraint=token_sharding_constraint(mesh),
        )
        bs = batch_sharding(mesh)
        batch = {
            "latents": jax.device_put(x, bs),
            "latent_condition": jax.device_put(cond, bs),
            "context_index": ctx,
        }
        losses = []
        with mesh:
            for _ in range(3):
                # Fixed key -> fixed (sigma, noise) draw: deterministic
                # objective, so loss must strictly descend.
                state, loss = step(state, batch, jax.random.key(0))
                losses.append(float(loss))
        assert all(np.isfinite(l) for l in losses)
        # Same batch, same network: a few steps must reduce the loss.
        assert losses[-1] < losses[0]
