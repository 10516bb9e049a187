"""EDM Euler scheduler parity vs a torch oracle of the reference math
(/root/reference/model_diffusion_renderer.py:16-82)."""

import jax.numpy as jnp
import numpy as np
import torch

from diffusionrenderer_tpu.sampling.edm import (
    edm_sigmas,
    edm_step,
    sample_edm,
    scale_model_input,
)


def torch_sigmas(n, smax=80.0, smin=0.02):
    return torch.cat(
        [
            torch.logspace(np.log10(smax), np.log10(smin), n, dtype=torch.float32),
            torch.zeros(1),
        ]
    )


class TestSigmaTable:
    def test_matches_torch_logspace(self):
        got = edm_sigmas(15)
        expected = torch_sigmas(15).numpy()
        assert got.shape == (16,)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)
        assert float(got[0]) == 80.0
        assert abs(float(got[-2]) - 0.02) < 1e-6
        assert float(got[-1]) == 0.0

    def test_default_20_steps(self):
        assert edm_sigmas(20).shape == (21,)


class TestScaleModelInput:
    def test_c_in(self):
        x = np.random.default_rng(0).standard_normal((2, 3)).astype(np.float32)
        sigma = 7.5
        expected = x / np.sqrt(sigma**2 + 0.25)
        got = scale_model_input(jnp.asarray(x), sigma)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


class TestStep:
    def test_matches_oracle(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 4)).astype(np.float32)
        f = rng.standard_normal((4, 4)).astype(np.float32)
        sigma, sigma_next, sd = 12.0, 7.0, 0.5
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / np.sqrt(sigma**2 + sd**2)
        denoised = c_skip * x + c_out * f
        expected = x + (x - denoised) / sigma * (sigma_next - sigma)
        got = edm_step(jnp.asarray(f), sigma, sigma_next, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


class TestFullTrajectory:
    def test_matches_stateful_torch_loop(self):
        """Run 8 steps with a deterministic fake denoiser F(x) = 0.1*x and
        compare the scan against a stateful loop that mirrors the reference's
        scheduler object protocol."""
        n = 8
        sigmas_t = torch_sigmas(n)
        x0 = torch.randn(2, 3, generator=torch.Generator().manual_seed(0))
        x0 = x0 * sigmas_t[0]

        # Stateful torch loop (oracle).
        x = x0.clone()
        sd = 0.5
        for i in range(n):
            t = sigmas_t[i]
            c_in = 1 / torch.sqrt(t**2 + sd**2)
            f = 0.1 * (x * c_in)
            c_skip = sd**2 / (t**2 + sd**2)
            c_out = t * sd / torch.sqrt(t**2 + sd**2)
            denoised = c_skip * x + c_out * f
            x = x + (x - denoised) / t * (sigmas_t[i + 1] - t)
        expected = x.numpy()

        got = sample_edm(
            lambda xs, s: 0.1 * xs,
            jnp.asarray(x0.numpy()),
            edm_sigmas(n),
        )
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)

    def test_bf16_state_fp32_math(self):
        x0 = jnp.ones((2, 2), jnp.bfloat16) * 80.0
        out = sample_edm(lambda xs, s: 0.1 * xs, x0, edm_sigmas(4))
        assert out.dtype == jnp.bfloat16
        assert np.all(np.isfinite(np.asarray(out, np.float32)))
