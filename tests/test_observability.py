"""Profiling/metrics subsystem + int8 pipeline integration."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffusionrenderer_tpu.config import DiTConfig, VAEConfig
from diffusionrenderer_tpu.models.dit import init_dit_params
from diffusionrenderer_tpu.models.quant import quantize_dit_params
from diffusionrenderer_tpu.models.vae import init_vae_params
from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline
from diffusionrenderer_tpu.utils.profiling import (
    MetricsRegistry,
    Timer,
    metrics,
    phase_timer,
)


class TestMetrics:
    def test_phase_timer_records(self):
        reg = MetricsRegistry()
        with phase_timer("unit", reg):
            time.sleep(0.01)
        s = reg.summary()
        assert s["unit"]["count"] == 1
        assert s["unit"]["mean_s"] >= 0.01

    def test_timer_context(self):
        with Timer("t1") as t:
            time.sleep(0.005)
        assert t.seconds >= 0.005

    def test_summary_aggregates(self):
        reg = MetricsRegistry()
        for v in (0.0, 0.0):
            reg.record("x", v)
        assert reg.summary()["x"]["count"] == 2
        reg.reset()
        assert reg.summary() == {}


class TestPipelineObservability:
    def test_generate_records_phase(self):
        net = DiTConfig(model_channels=48, num_blocks=1, num_heads=2,
                        adaln_lora_dim=8, crossattn_emb_channels=16)
        vae = VAEConfig(encoder_block_out_channels=(8, 12, 16, 16),
                        decode_block_out_channels=(12, 16, 16, 16),
                        num_layers=1)
        pipe = DiffusionRendererPipeline(
            init_dit_params(jax.random.key(0), net, dtype=jnp.float32),
            init_vae_params(jax.random.key(1), vae, dtype=jnp.float32),
            model_type="inverse", num_steps=1, compute_dtype="float32",
            net_config=net, vae_config=vae,
        )
        metrics.reset()
        pipe.generate({"rgb": jnp.zeros((1, 1, 16, 16, 3)),
                       "context_index": jnp.zeros((1,), jnp.int32)})
        assert "generate/inverse" in metrics.summary()


class TestInt8Pipeline:
    def test_generate_with_quantized_params(self):
        """Full pipeline runs with int8 block weights and stays close to the
        bf16 result."""
        net = DiTConfig(model_channels=48, num_blocks=2, num_heads=2,
                        adaln_lora_dim=8, crossattn_emb_channels=16)
        vae = VAEConfig(encoder_block_out_channels=(8, 12, 16, 16),
                        decode_block_out_channels=(12, 16, 16, 16),
                        num_layers=1)
        dit = init_dit_params(jax.random.key(0), net, dtype=jnp.float32)
        vae_p = init_vae_params(jax.random.key(1), vae, dtype=jnp.float32)
        batch = {
            "rgb": jax.random.uniform(jax.random.key(2), (1, 1, 16, 16, 3)) * 2 - 1,
            "context_index": jnp.zeros((1,), jnp.int32),
        }

        def make(params):
            return DiffusionRendererPipeline(
                params, vae_p, model_type="inverse", num_steps=2,
                compute_dtype="float32", net_config=net, vae_config=vae,
            )

        ref = make(dit).generate(batch, seed=1)
        got = make(quantize_dit_params(dit)).generate(batch, seed=1)
        # int8 weight error propagates through 2 denoise steps + VAE decode;
        # outputs are uint8 in [0,255] — allow small drift.
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 16
        assert np.abs(got.astype(float) - ref.astype(float)).mean() <= 3
