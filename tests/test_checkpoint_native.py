"""Native checkpoint round-trips: orbax DiT save/restore, flat-safetensors
VAE save/load, and temporal-chunked VAE encode/decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionrenderer_tpu.checkpoint import restore_native, save_native
from diffusionrenderer_tpu.checkpoint_vae import (
    load_vae_native,
    save_vae_native,
)
from diffusionrenderer_tpu.config import DiTConfig, VAEConfig
from diffusionrenderer_tpu.models.dit import init_dit_params
from diffusionrenderer_tpu.models.vae import (
    init_vae_params,
    vae_decode_temporal_chunks,
    vae_encode,
    vae_encode_temporal_chunks,
)

TINY_NET = DiTConfig(model_channels=32, num_blocks=2, num_heads=2,
                     adaln_lora_dim=8, crossattn_emb_channels=16)
TINY_VAE = VAEConfig(encoder_block_out_channels=(8, 12, 16, 16),
                     decode_block_out_channels=(12, 16, 16, 16), num_layers=1)


class TestOrbaxDiT:
    def test_save_restore_roundtrip(self, tmp_path):
        params = init_dit_params(jax.random.key(0), TINY_NET, dtype=jnp.float32)
        path = str(tmp_path / "ckpt")
        save_native(path, params)
        restored = restore_native(path)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_native_detection(self, tmp_path):
        """is_native_checkpoint: true only for orbax dirs — a diffusers-style
        weights directory must fall through to the converter path."""
        from diffusionrenderer_tpu.checkpoint import is_native_checkpoint

        params = init_dit_params(jax.random.key(0), TINY_NET, dtype=jnp.float32)
        path = str(tmp_path / "ckpt")
        save_native(path, params)
        assert is_native_checkpoint(path)

        diffusers_dir = tmp_path / "hf"
        diffusers_dir.mkdir()
        (diffusers_dir / "diffusion_pytorch_model.safetensors").write_bytes(b"")
        (diffusers_dir / "config.json").write_text("{}")
        assert not is_native_checkpoint(str(diffusers_dir))
        assert not is_native_checkpoint(str(tmp_path / "missing"))
        assert not is_native_checkpoint(str(diffusers_dir / "config.json"))


class TestNativeVAEFormat:
    def test_flat_safetensors_roundtrip(self, tmp_path):
        params = init_vae_params(jax.random.key(1), TINY_VAE, dtype=jnp.float32)
        path = str(tmp_path / "vae.safetensors")
        save_vae_native(path, params)
        restored = load_vae_native(path, dtype=jnp.float32)
        # Same structure (incl. list levels) and same values.
        assert jax.tree.structure(params) == jax.tree.structure(restored)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestTemporalChunking:
    def test_chunked_shapes(self):
        params = init_vae_params(jax.random.key(2), TINY_VAE, dtype=jnp.float32)
        # two 9-frame chunks -> latent 2 frames each.
        x = jax.random.normal(jax.random.key(3), (1, 18, 16, 16, 3))
        z = vae_encode_temporal_chunks(params, x, TINY_VAE,
                                       pixel_chunk_duration=9)
        assert z.shape == (1, 4, 2, 2, 16)
        y = vae_decode_temporal_chunks(params, z, TINY_VAE,
                                       latent_chunk_duration=2)
        assert y.shape == (1, 18, 16, 16, 3)

    def test_chunked_matches_per_chunk_encode(self):
        params = init_vae_params(jax.random.key(2), TINY_VAE, dtype=jnp.float32)
        x = jax.random.normal(jax.random.key(4), (1, 18, 16, 16, 3))
        z = vae_encode_temporal_chunks(params, x, TINY_VAE,
                                       pixel_chunk_duration=9, max_batch=1)
        z0 = vae_encode(params, x[:, :9], TINY_VAE)
        z1 = vae_encode(params, x[:, 9:], TINY_VAE)
        np.testing.assert_allclose(np.asarray(z[:, :2]), np.asarray(z0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(z[:, 2:]), np.asarray(z1),
                                   rtol=1e-5, atol=1e-5)

    def test_indivisible_raises(self):
        params = init_vae_params(jax.random.key(2), TINY_VAE, dtype=jnp.float32)
        x = jnp.zeros((1, 10, 16, 16, 3))
        with pytest.raises(ValueError, match="divisible"):
            vae_encode_temporal_chunks(params, x, TINY_VAE,
                                       pixel_chunk_duration=9)
