"""JAX VAE parity vs the torch AutoencoderKLCosmos restatement.

Pins, through the state-dict converter (so key names AND math are tested
jointly, the same golden recipe as test_dit_parity.py):
  * encode parity (Haar patch order/scale, factorized convs, hybrid
    downsample, per-frame norms, mid attention, causal temporal attention)
  * decode parity (hybrid residual upsample, inverse Haar, frame drop)
  * roundtrip decode(encode(x)) parity
  * single-frame (image) path
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusionrenderer_tpu.checkpoint_vae import (
    convert_diffusers_vae_state_dict,
)
from diffusionrenderer_tpu.config import VAEConfig
from diffusionrenderer_tpu.models.vae import vae_decode, vae_encode

from torch_vae_oracle import oracle_from_vae_config

TINY = VAEConfig(
    encoder_block_out_channels=(8, 12, 16, 16),
    decode_block_out_channels=(12, 16, 16, 16),
    num_layers=1,
)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    oracle = oracle_from_vae_config(TINY)
    # Perturb norm affine params away from identity so they are load-bearing.
    with torch.no_grad():
        for name, p in oracle.named_parameters():
            if "norm" in name:
                if name.endswith("weight"):
                    p.mul_(1.0 + 0.2 * torch.randn_like(p))
                else:
                    p.add_(0.1 * torch.randn_like(p))
    params = convert_diffusers_vae_state_dict(
        oracle.state_dict(), TINY, dtype=jnp.float32
    )
    return oracle, params


def _to_torch(x_nthwc: np.ndarray) -> torch.Tensor:
    return torch.tensor(x_nthwc).permute(0, 4, 1, 2, 3)  # NCTHW


def _from_torch(x_ncthw: torch.Tensor) -> np.ndarray:
    return x_ncthw.permute(0, 2, 3, 4, 1).numpy()


class TestVAEParity:
    @pytest.mark.parametrize("t,h,w", [(1, 16, 16), (9, 16, 32), (17, 16, 16)])
    def test_encode_matches(self, pair, t, h, w):
        oracle, params = pair
        rng = np.random.default_rng(t)
        x = rng.standard_normal((1, t, h, w, 3)).astype(np.float32)
        with torch.no_grad():
            expected = _from_torch(oracle.encode(_to_torch(x)))
        got = np.asarray(vae_encode(params, jnp.asarray(x), TINY))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("t,h,w", [(1, 2, 2), (3, 2, 4)])
    def test_decode_matches(self, pair, t, h, w):
        oracle, params = pair
        rng = np.random.default_rng(10 + t)
        z = rng.standard_normal((1, t, h, w, 16)).astype(np.float32)
        with torch.no_grad():
            expected = _from_torch(oracle.decode(_to_torch(z)))
        got = np.asarray(vae_decode(params, jnp.asarray(z), TINY))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    def test_roundtrip_matches(self, pair):
        oracle, params = pair
        rng = np.random.default_rng(99)
        x = rng.standard_normal((1, 9, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            expected = _from_torch(oracle.decode(oracle.encode(_to_torch(x))))
        z = vae_encode(params, jnp.asarray(x), TINY)
        got = np.asarray(vae_decode(params, z, TINY))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=2e-4)

    def test_converter_is_strict(self, pair):
        oracle, _ = pair
        sd = dict(oracle.state_dict())
        extra = dict(sd)
        extra["encoder.bogus.weight"] = torch.zeros(1)
        with pytest.raises(ValueError, match="Unconsumed"):
            convert_diffusers_vae_state_dict(extra, TINY, dtype=jnp.float32)
        missing = dict(sd)
        missing.pop("encoder.conv_in.conv_s.weight")
        with pytest.raises(KeyError, match="missing"):
            convert_diffusers_vae_state_dict(missing, TINY, dtype=jnp.float32)
