"""Weight-only int8 quantization: error bounds + full-model accuracy."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.dit import dit_forward, init_dit_params
from diffusionrenderer_tpu.models.quant import (
    dequantize_tensor,
    quantize_dit_params,
    quantize_tensor,
)

CFG = DiTConfig(
    model_channels=64,
    num_blocks=2,
    num_heads=4,
    adaln_lora_dim=8,
    crossattn_emb_channels=16,
    additional_concat_ch=16,
)


class TestQuantizeTensor:
    def test_roundtrip_error_bound(self):
        w = jax.random.normal(jax.random.key(0), (3, 32, 64)) * 0.1
        wq = quantize_tensor(w)
        assert wq["q"].dtype == jnp.int8
        assert wq["s"].shape == (3, 64)
        wd = dequantize_tensor(wq, jnp.float32)
        # Symmetric per-channel int8: |err| <= scale/2 per element.
        max_scale = float(jnp.max(wq["s"]))
        assert float(jnp.max(jnp.abs(wd - w))) <= max_scale / 2 + 1e-7

    def test_preserves_zero(self):
        w = jnp.zeros((1, 8, 8))
        wq = quantize_tensor(w)
        np.testing.assert_array_equal(np.asarray(wq["q"]), 0)

    def test_host_matches_device(self):
        """The torch-backed host path (checkpoint conversion) must produce
        the exact same int8 codes and scales as the jax device path, for
        both bf16 and fp32 inputs."""
        from diffusionrenderer_tpu.models.quant import quantize_tensor_host

        w = jax.random.normal(jax.random.key(3), (2, 48, 32)) * 0.3
        for act_quant in (False, True):
            skey = "sa" if act_quant else "s"
            dev = quantize_tensor(w, act_quant=act_quant)
            host_f32 = quantize_tensor_host(np.asarray(w, np.float32),
                                            act_quant=act_quant)
            np.testing.assert_array_equal(
                np.asarray(host_f32["q"]), np.asarray(dev["q"]))
            np.testing.assert_allclose(
                np.asarray(host_f32[skey]), np.asarray(dev[skey]), rtol=1e-6)
            wb = w.astype(jnp.bfloat16)
            host_bf16 = quantize_tensor_host(wb, act_quant=act_quant)
            dev_bf16 = quantize_tensor(wb, act_quant=act_quant)
            np.testing.assert_array_equal(
                np.asarray(host_bf16["q"]), np.asarray(dev_bf16["q"]))
            np.testing.assert_allclose(
                np.asarray(host_bf16[skey]), np.asarray(dev_bf16[skey]),
                rtol=1e-6)


class TestQuantizedModel:
    def test_memory_halved(self):
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.bfloat16)
        qparams = quantize_dit_params(params)
        size = lambda p: sum(x.nbytes for x in jax.tree.leaves(p["blocks"]))
        assert size(qparams) < 0.6 * size(params)

    def test_forward_close_to_fp(self):
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        qparams = quantize_dit_params(params)
        b, t, h, w = 1, 2, 8, 8
        x = jax.random.normal(jax.random.key(1), (b, t, h, w, 16))
        cond = jax.random.normal(jax.random.key(2), (b, t, h, w, 16))
        sig = jnp.full((b,), 7.5)
        ctx = jnp.zeros((b,), jnp.int32)
        ref = np.asarray(dit_forward(params, x, sig, cond, ctx, CFG))
        got = np.asarray(dit_forward(qparams, x, sig, cond, ctx, CFG))
        # Weight-only int8 with per-channel scales: relative output error
        # should stay well under 2%.
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.02, f"int8 relative error too large: {rel}"


class TestW8A8:
    def test_leaf_layout_and_memory(self):
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.bfloat16)
        qparams = quantize_dit_params(params, act_quant=True)
        leaf = qparams["blocks"]["mlp"]["w1"]
        assert set(leaf) == {"q", "sa"} and leaf["q"].dtype == jnp.int8
        size = lambda p: sum(x.nbytes for x in jax.tree.leaves(p["blocks"]))
        assert size(qparams) < 0.6 * size(params)

    def test_forward_close_to_fp(self):
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        qparams = quantize_dit_params(params, act_quant=True)
        b, t, h, w = 1, 2, 8, 8
        x = jax.random.normal(jax.random.key(1), (b, t, h, w, 16))
        cond = jax.random.normal(jax.random.key(2), (b, t, h, w, 16))
        sig = jnp.full((b,), 7.5)
        ctx = jnp.zeros((b,), jnp.int32)
        ref = np.asarray(dit_forward(params, x, sig, cond, ctx, CFG))
        got = np.asarray(dit_forward(qparams, x, sig, cond, ctx, CFG))
        # W8A8 adds activation-quant noise on top of the weight quant: allow
        # a looser (but still tight) bound than weight-only.
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05, f"w8a8 relative error too large: {rel}"

    def test_a8_closely_tracks_weight_only(self):
        """Activation quantization must cost little extra accuracy."""
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        q_w = quantize_dit_params(params)
        q_a = quantize_dit_params(params, act_quant=True)
        b, t, h, w = 1, 2, 8, 8
        x = jax.random.normal(jax.random.key(1), (b, t, h, w, 16))
        cond = jax.random.normal(jax.random.key(2), (b, t, h, w, 16))
        sig = jnp.full((b,), 7.5)
        ctx = jnp.zeros((b,), jnp.int32)
        out_w = np.asarray(dit_forward(q_w, x, sig, cond, ctx, CFG))
        out_a = np.asarray(dit_forward(q_a, x, sig, cond, ctx, CFG))
        rel = np.abs(out_a - out_w).max() / (np.abs(out_w).max() + 1e-9)
        assert rel < 0.05

    def test_sharded_quantized_forward(self):
        """int8 (both modes) under the Megatron TP layout == unsharded."""
        from diffusionrenderer_tpu.parallel import (
            dit_param_shardings, make_mesh, shard_params,
            token_sharding_constraint,
        )

        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        b, t, h, w = 2, 2, 8, 8
        x = jax.random.normal(jax.random.key(1), (b, t, h, w, 16))
        cond = jax.random.normal(jax.random.key(2), (b, t, h, w, 16))
        sig = jnp.full((b,), 7.5)
        ctx = jnp.zeros((b,), jnp.int32)
        mesh = make_mesh(8)
        for act_quant in (False, True):
            qparams = quantize_dit_params(params, act_quant=act_quant)
            expected = np.asarray(dit_forward(qparams, x, sig, cond, ctx, CFG))
            sharded = shard_params(
                qparams, dit_param_shardings(qparams, mesh))
            constraint = token_sharding_constraint(mesh)
            with mesh:
                got = np.asarray(jax.jit(
                    lambda p: dit_forward(
                        p, x, sig, cond, ctx, CFG,
                        seq_sharding_constraint=constraint)
                )(sharded))
            np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_grouped_scales_reduce_error(self):
        """Per-group scales must (a) dequantize with the documented error
        bound per group, (b) produce strictly finer-grained error than
        per-column on weights with outlier rows."""
        from diffusionrenderer_tpu.models.quant import quantize_tensor_host

        key = jax.random.key(7)
        w = jax.random.normal(key, (2, 128, 64)) * 0.1
        # Outlier rows: the per-column scale inflates, per-group contains it.
        w = w.at[:, 3, :].mul(30.0)
        for act_quant in (False, True):
            skey = "sa" if act_quant else "s"
            wq_col = quantize_tensor(w, act_quant=act_quant)
            wq_grp = quantize_tensor(w, act_quant=act_quant, group_size=32)
            assert wq_grp[skey].shape == (2, 4, 64)
            err_col = float(jnp.mean(jnp.abs(
                dequantize_tensor(wq_col, jnp.float32) - w)))
            err_grp = float(jnp.mean(jnp.abs(
                dequantize_tensor(wq_grp, jnp.float32) - w)))
            assert err_grp < 0.35 * err_col, (err_grp, err_col)
            # Host path must produce identical codes + scales.
            host = quantize_tensor_host(np.asarray(w, np.float32),
                                        act_quant=act_quant, group_size=32)
            np.testing.assert_array_equal(np.asarray(host["q"]),
                                          np.asarray(wq_grp["q"]))
            np.testing.assert_allclose(np.asarray(host[skey]),
                                       np.asarray(wq_grp[skey]), rtol=1e-6)

    def test_grouped_forward_close_to_fp(self):
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        b, t, h, w = 1, 2, 8, 8
        x = jax.random.normal(jax.random.key(1), (b, t, h, w, 16))
        cond = jax.random.normal(jax.random.key(2), (b, t, h, w, 16))
        sig = jnp.full((b,), 7.5)
        ctx = jnp.zeros((b,), jnp.int32)
        ref = np.asarray(dit_forward(params, x, sig, cond, ctx, CFG))
        for act_quant in (False, True):
            qp = quantize_dit_params(params, act_quant=act_quant,
                                     group_size=32)
            got = np.asarray(dit_forward(qp, x, sig, cond, ctx, CFG))
            rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            assert rel < 0.05, f"grouped act_quant={act_quant} rel={rel}"

    def test_keep_bf16_exempts_residual_projections(self):
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        qp = quantize_dit_params(params, keep_bf16=("wo", "mlp.w2"))
        assert not isinstance(qp["blocks"]["fa"]["wo"], dict)
        assert not isinstance(qp["blocks"]["ca"]["wo"], dict)
        assert not isinstance(qp["blocks"]["mlp"]["w2"], dict)
        assert isinstance(qp["blocks"]["mlp"]["w1"], dict)
        assert isinstance(qp["blocks"]["fa"]["wq"], dict)

    def test_sharded_grouped_quantized_forward(self):
        """Per-group int8 under the Megatron TP layout == unsharded."""
        from diffusionrenderer_tpu.parallel import (
            dit_param_shardings, make_mesh, shard_params,
            token_sharding_constraint,
        )

        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        b, t, h, w = 2, 2, 8, 8
        x = jax.random.normal(jax.random.key(1), (b, t, h, w, 16))
        cond = jax.random.normal(jax.random.key(2), (b, t, h, w, 16))
        sig = jnp.full((b,), 7.5)
        ctx = jnp.zeros((b,), jnp.int32)
        mesh = make_mesh(8)
        qparams = quantize_dit_params(params, act_quant=True, group_size=32)
        expected = np.asarray(dit_forward(qparams, x, sig, cond, ctx, CFG))
        sharded = shard_params(qparams, dit_param_shardings(qparams, mesh))
        constraint = token_sharding_constraint(mesh)
        with mesh:
            got = np.asarray(jax.jit(
                lambda p: dit_forward(
                    p, x, sig, cond, ctx, CFG,
                    seq_sharding_constraint=constraint)
            )(sharded))
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_reset_dtype_keeps_scales_fp32(self):
        from diffusionrenderer_tpu.config import VAEConfig
        from diffusionrenderer_tpu.models.vae import init_vae_params
        from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline

        tiny_vae = VAEConfig(
            encoder_block_out_channels=(8, 12, 16, 16),
            decode_block_out_channels=(12, 16, 16, 16),
            num_layers=1,
        )
        dit = quantize_dit_params(
            init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32),
            act_quant=True,
        )
        vae = init_vae_params(jax.random.key(1), tiny_vae, dtype=jnp.float32)
        pipe = DiffusionRendererPipeline(
            dit, vae, model_type="inverse", net_config=CFG,
            vae_config=tiny_vae, compute_dtype="float32",
        )
        pipe.reset_dtype(jnp.bfloat16)
        blk = pipe.dit_params["blocks"]["mlp"]["w1"]
        assert blk["q"].dtype == jnp.int8
        assert blk["sa"].dtype == jnp.float32
        # non-quantized 2D weights do get cast
        assert pipe.dit_params["x_embedder"]["weight"].dtype == jnp.bfloat16
