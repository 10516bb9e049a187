"""Cosmos CV8x8x8 JAX VAE: shape math, Haar invertibility, causality.

The reference gets this model from diffusers (ref: CleanVAE.py:18); these
tests pin the properties the rest of the stack depends on:
  * frame math T_latent = (T-1)//8+1 and its inverse (ref: CleanVAE.py:34-42)
  * 8x spatial compression, 16 latent channels (VAE_config.json:542-544)
  * temporal causality: latent frame t is independent of pixel frames > 8t
  * Haar patcher orthonormal round-trip
  * per-(channel, frame) latent statistics application
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionrenderer_tpu.config import VAEConfig
from diffusionrenderer_tpu.models.vae import (
    haar_patch,
    haar_unpatch,
    init_vae_params,
    load_latent_stats,
    vae_decode,
    vae_encode,
    vae_encode_chunked,
)

TINY = VAEConfig(
    encoder_block_out_channels=(8, 12, 16, 16),
    decode_block_out_channels=(12, 16, 16, 16),
    num_layers=1,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_vae_params(jax.random.key(0), TINY, dtype=jnp.float32)


class TestHaar:
    @pytest.mark.parametrize("t", [1, 5, 9, 57])
    def test_roundtrip(self, t):
        x = jax.random.normal(jax.random.key(1), (1, t, 8, 8, 3))
        levels = 2
        patched = haar_patch(x, levels)
        assert patched.shape[-1] == 3 * 64
        restored = haar_unpatch(patched, levels, t)
        np.testing.assert_allclose(
            np.asarray(restored), np.asarray(x), rtol=1e-5, atol=1e-5
        )

    def test_frame_math(self):
        x = jnp.zeros((1, 57, 16, 16, 3))
        assert haar_patch(x, 2).shape == (1, 15, 4, 4, 192)

    def test_unsupported_frame_count_raises(self):
        # The causal patcher supports T == 1 or (T-1) % patch_size == 0 (the
        # reference only feeds T = 8k+1, CleanVAE.py:34-42).
        with pytest.raises(ValueError, match="frame count"):
            haar_patch(jnp.zeros((1, 2, 8, 8, 3)), 2)

    def test_dc_gain_one(self):
        # diffusers rescale convention: constant input -> LLL subband equals
        # the constant, all other subbands zero (DC gain exactly 1).
        x = jnp.full((1, 5, 8, 8, 3), 2.5)
        p = haar_patch(x, 1)
        np.testing.assert_allclose(np.asarray(p[..., :3]), 2.5, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p[..., 3:]), 0.0, atol=1e-6)


class TestShapes:
    @pytest.mark.parametrize("t", [1, 9])
    def test_encode_ncdhw_input_matches(self, tiny_params, t):
        """vae_encode(in_layout='NCDHW') — the lane-pad-safe device boundary
        for full-res video — is numerically identical to channels-last."""
        x = jax.random.normal(jax.random.key(11), (2, t, 32, 32, 3))
        ref = np.asarray(vae_encode(tiny_params, x, TINY))
        got = np.asarray(vae_encode(
            tiny_params, jnp.transpose(x, (0, 4, 1, 2, 3)), TINY,
            in_layout="NCDHW",
        ))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize(
        "t,h,w", [(1, 32, 32), (9, 32, 64), (57, 64, 32)]
    )
    def test_encode_decode_shapes(self, tiny_params, t, h, w):
        x = jax.random.normal(jax.random.key(3), (1, t, h, w, 3))
        z = vae_encode(tiny_params, x, TINY)
        t_lat = TINY.latent_num_frames(t)
        assert z.shape == (1, t_lat, h // 8, w // 8, 16)
        y = vae_decode(tiny_params, z, TINY)
        assert y.shape == (1, t, h, w, 3)

    def test_frame_math_vs_reference(self):
        # ref: CleanVAE.py:34-42
        cfg = VAEConfig()
        assert cfg.latent_num_frames(1) == 1
        assert cfg.latent_num_frames(57) == 8
        assert cfg.latent_num_frames(9) == 2
        assert cfg.pixel_num_frames(8) == 57
        assert cfg.pixel_num_frames(1) == 1


class TestCausality:
    def test_encoder_latents_causal(self, tiny_params):
        """Perturbing pixel frames after 8*t must not change latent frame t."""
        key = jax.random.key(4)
        x1 = jax.random.normal(key, (1, 17, 16, 16, 3))
        x2 = x1.at[:, 9:].set(jax.random.normal(jax.random.key(5), (1, 8, 16, 16, 3)))
        z1 = vae_encode(tiny_params, x1, TINY)  # latent T = 3
        z2 = vae_encode(tiny_params, x2, TINY)
        # Latent frame 0 covers pixel frame 0 only; frame 1 covers 1..8.
        np.testing.assert_allclose(
            np.asarray(z1[:, 0]), np.asarray(z2[:, 0]), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(z1[:, 1]), np.asarray(z2[:, 1]), rtol=1e-4, atol=1e-5
        )
        assert np.abs(np.asarray(z1[:, 2]) - np.asarray(z2[:, 2])).max() > 1e-4

    def test_single_frame_equals_prefix_of_video(self, tiny_params):
        """Causality means encoding frame 0 alone matches latent frame 0 of a
        longer video that starts with the same frame."""
        x = jax.random.normal(jax.random.key(6), (1, 9, 16, 16, 3))
        z_full = vae_encode(tiny_params, x, TINY)
        z_single = vae_encode(tiny_params, x[:, :1], TINY)
        np.testing.assert_allclose(
            np.asarray(z_full[:, 0]), np.asarray(z_single[:, 0]),
            rtol=1e-4, atol=1e-5,
        )


class TestLatentStats:
    def test_stats_applied_per_channel_frame(self, tiny_params):
        mean = np.arange(16 * 16, dtype=np.float32).reshape(16, 16) * 0.01
        std = np.ones((16, 16), np.float32) * 2.0
        p2 = load_latent_stats(tiny_params, mean.reshape(-1), std.reshape(-1), TINY)
        x = jax.random.normal(jax.random.key(7), (1, 9, 16, 16, 3))
        z_id = vae_encode(tiny_params, x, TINY)
        z_st = vae_encode(p2, x, TINY)
        t_lat = z_id.shape[1]
        expected = (np.asarray(z_id) - mean[:, :t_lat].T[None, :, None, None, :]) / 2.0
        np.testing.assert_allclose(np.asarray(z_st), expected, rtol=1e-4, atol=1e-5)

    def test_decode_inverts_stats(self, tiny_params):
        """decode(encode(x)) must be independent of the stats vectors."""
        mean = np.random.default_rng(0).normal(size=(256,)).astype(np.float32) * 0.1
        std = 1.0 + 0.5 * np.abs(
            np.random.default_rng(1).normal(size=(256,))
        ).astype(np.float32)
        p2 = load_latent_stats(tiny_params, mean, std, TINY)
        x = jax.random.normal(jax.random.key(8), (1, 1, 16, 16, 3))
        y1 = vae_decode(tiny_params, vae_encode(tiny_params, x, TINY), TINY)
        y2 = vae_decode(p2, vae_encode(p2, x, TINY), TINY)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=1e-4, atol=1e-4)


class TestChunked:
    def test_chunked_encode_matches(self, tiny_params):
        x = jax.random.normal(jax.random.key(9), (3, 1, 16, 16, 3))
        full = vae_encode(tiny_params, x, TINY)
        chunked = vae_encode_chunked(tiny_params, x, TINY, max_batch=2)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(chunked), rtol=1e-5, atol=1e-6
        )
