"""Bundled CV8x8x8 latent statistics: the 256-entry latents_mean/std table
ships in-package (ref: VAE_config.json:21-535) so a flagship pipeline never
silently runs identity stats when the checkpoint dir lacks config.json."""

import json

import numpy as np

from diffusionrenderer_tpu.checkpoint_vae import (
    _is_flagship_vae,
    bundled_latent_stats,
    ensure_latent_stats,
)
from diffusionrenderer_tpu.config import VAEConfig

TINY = VAEConfig(
    encoder_block_out_channels=(8, 12, 16, 16),
    decode_block_out_channels=(12, 16, 16, 16),
    num_layers=1,
)


def identity_params():
    return {
        "latents_mean": np.zeros((16, 16), np.float32),
        "latents_std": np.ones((16, 16), np.float32),
    }


class TestBundledStats:
    def test_table_shape_and_sanity(self):
        stats = bundled_latent_stats()
        mean = np.asarray(stats["latents_mean"], np.float32)
        std = np.asarray(stats["latents_std"], np.float32)
        assert mean.shape == (256,) and std.shape == (256,)
        # Real statistics: stds strictly positive and not all-ones,
        # means not all-zero.
        assert (std > 0).all()
        assert not np.allclose(std, 1.0)
        assert np.abs(mean).max() > 0

    def test_table_matches_reference_config(self):
        with open("/root/reference/VAE_config.json") as f:
            ref = json.load(f)
        stats = bundled_latent_stats()
        np.testing.assert_array_equal(stats["latents_mean"],
                                      ref["latents_mean"])
        np.testing.assert_array_equal(stats["latents_std"],
                                      ref["latents_std"])

    def test_flagship_detection(self):
        assert _is_flagship_vae(VAEConfig())  # default == CV8x8x8
        assert not _is_flagship_vae(TINY)

    def test_ensure_installs_on_identity_flagship(self):
        out = ensure_latent_stats(identity_params(), VAEConfig())
        stats = bundled_latent_stats()
        np.testing.assert_allclose(
            np.asarray(out["latents_mean"]).reshape(-1),
            np.asarray(stats["latents_mean"], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(out["latents_std"]).reshape(-1),
            np.asarray(stats["latents_std"], np.float32),
        )

    def test_ensure_preserves_loaded_stats(self):
        params = identity_params()
        params["latents_mean"] = np.full((16, 16), 0.25, np.float32)
        out = ensure_latent_stats(params, VAEConfig())
        np.testing.assert_array_equal(np.asarray(out["latents_mean"]),
                                      params["latents_mean"])

    def test_ensure_skips_non_flagship(self):
        out = ensure_latent_stats(identity_params(), TINY)
        assert np.all(np.asarray(out["latents_mean"]) == 0.0)
        assert np.all(np.asarray(out["latents_std"]) == 1.0)
