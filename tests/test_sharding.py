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

    def test_hybrid_dcn_mesh(self, setup):
        """make_hybrid_mesh: 2 'slices' x (1,2,2) — the multi-slice layout
        where only the data axis crosses DCN.  On CPU test devices slices
        are stood in by contiguous groups; the invariant is identical
        numerics through the same (data, seq, tensor) sharding helpers."""
        from diffusionrenderer_tpu.parallel import make_hybrid_mesh

        params, x, sigma, cond, ctx = setup
        expected = np.asarray(dit_forward(params, x, sigma, cond, ctx, CFG))
        mesh = make_hybrid_mesh(dcn_data=2, data=1, seq=2, tensor=2)
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
            "data": 2, "seq": 2, "tensor": 2,
        }
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

        with pytest.raises(ValueError, match="devices"):
            make_hybrid_mesh(dcn_data=3, data=1, seq=2, tensor=2)

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
        # Deep-copy before sharding: device_put may alias the source device's
        # shard buffer, and the train step DONATES its state — without the
        # copy, donation deletes the module-scoped fixture params out from
        # under every later test.
        params = jax.tree.map(jnp.copy, params)
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


class TestShardedPipeline:
    def test_sharded_generate_matches_single_device(self):
        """End-to-end pipeline.generate on the mesh == unsharded result."""
        from diffusionrenderer_tpu.config import VAEConfig
        from diffusionrenderer_tpu.models.vae import init_vae_params
        from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline

        tiny_vae = VAEConfig(
            encoder_block_out_channels=(8, 12, 16, 16),
            decode_block_out_channels=(12, 16, 16, 16),
            num_layers=1,
        )
        net = CFG
        dit = init_dit_params(jax.random.key(0), net, dtype=jnp.float32)
        vae = init_vae_params(jax.random.key(1), tiny_vae, dtype=jnp.float32)

        video = jax.random.uniform(jax.random.key(2), (2, 1, 16, 16, 3)) * 2 - 1
        batch = {"rgb": video, "context_index": jnp.zeros((2,), jnp.int32)}

        def make(mesh=None):
            p = DiffusionRendererPipeline(
                dit, vae, model_type="inverse", num_steps=2,
                compute_dtype="float32", net_config=net, vae_config=tiny_vae,
            )
            if mesh is not None:
                p.shard(mesh)
            return p

        expected = make().generate(batch, seed=5)
        got = make(make_mesh(8)).generate(batch, seed=5)
        # uint8 outputs may differ by 1 count from collective reduction order.
        assert np.abs(got.astype(int) - expected.astype(int)).max() <= 1

    def test_batched_5pass_api_on_data_mesh(self):
        """api.inverse_render(batch_passes=True) with the 5 G-buffer rows
        riding the `data` mesh axis == the single-device batched result.

        This is the framework's multi-chip flagship path: the fully-batched
        B=5 job exceeds one chip's HBM at flagship scale (BASELINE.md), so
        batch rows shard over `data` (the reference loops the 5 passes
        serially on one GPU, ref: nodes.py:187-213).
        """
        from diffusionrenderer_tpu.api import inverse_render
        from diffusionrenderer_tpu.config import VAEConfig
        from diffusionrenderer_tpu.models.vae import init_vae_params
        from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline

        tiny_vae = VAEConfig(
            encoder_block_out_channels=(8, 12, 16, 16),
            decode_block_out_channels=(12, 16, 16, 16),
            num_layers=1,
        )
        dit = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        vae = init_vae_params(jax.random.key(1), tiny_vae, dtype=jnp.float32)

        def make(mesh=None):
            p = DiffusionRendererPipeline(
                dit, vae, model_type="inverse", num_steps=2,
                compute_dtype="float32", net_config=CFG, vae_config=tiny_vae,
            )
            if mesh is not None:
                p.shard(mesh)
            return p

        img = np.random.default_rng(9).uniform(size=(1, 16, 16, 3)).astype(
            np.float32)
        expected = inverse_render(make(), img, batch_passes=True)
        mesh = make_mesh(5, data=5, seq=1, tensor=1)
        got = inverse_render(make(mesh), img, batch_passes=True)
        assert set(got) == set(expected)
        for k in expected:
            assert np.abs(
                got[k].astype(np.float64) - expected[k].astype(np.float64)
            ).max() <= 1.5 / 255.0, f"sharded batched pass mismatch for {k}"


class TestSequenceParallelAttention:
    """shard_map'd attention kernels (parallel/flash_sp.py) == XLA oracle."""

    def test_flash_sp_unit_matches_xla(self):
        from diffusionrenderer_tpu.ops.attention import attention_xla
        from diffusionrenderer_tpu.parallel import make_sp_attention

        mesh = make_mesh(8)
        ks = jax.random.split(jax.random.key(5), 3)
        q, k, v = (jax.random.normal(kk, (2, 64, 4, 16)) for kk in ks)
        got = np.asarray(make_sp_attention(mesh, impl="flash")(q, k, v))
        ref = np.asarray(attention_xla(q, k, v))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("impl", ["flash_sp", "ring"])
    def test_dit_forward_matches_single_device(self, setup, impl):
        params, x, sigma, cond, ctx = setup
        expected = np.asarray(dit_forward(params, x, sigma, cond, ctx, CFG))
        mesh = make_mesh(8)
        sharded_params = shard_params(params, dit_param_shardings(params, mesh))
        bs = batch_sharding(mesh)
        xs = jax.device_put(x, bs)
        conds = jax.device_put(cond, bs)
        constraint = token_sharding_constraint(mesh)

        @jax.jit
        def fwd(p, xx, s, c, ci):
            return dit_forward(
                p, xx, s, c, ci, CFG,
                seq_sharding_constraint=constraint,
                attn_backend=impl, mesh=mesh,
            )

        with mesh:
            got = np.asarray(fwd(sharded_params, xs, sigma, conds, ctx))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
