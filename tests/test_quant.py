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
