"""Golden end-to-end parity: the full jitted generation (conditioning ->
EDM denoise loop -> post-processing) vs a torch re-statement of the
reference's sampler semantics (model_diffusion_renderer.py:211-235 +
diffusion_renderer_pipeline.py:285-319), with an identity VAE and injected
noise so the comparison isolates sampler + conditioning + network math.

This is the SURVEY.md section-4 golden harness (BASELINE config #1 shape
family, scaled down for CPU runtime).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffusionrenderer_tpu.checkpoint import convert_dit_state_dict
from diffusionrenderer_tpu.config import (
    DiTConfig,
    SchedulerConfig,
    VAEConfig,
    get_inverse_renderer_config,
)
from diffusionrenderer_tpu.pipeline import _generate_jit

from torch_oracle import make_oracle_state_dict, oracle_forward

NET = DiTConfig(
    model_channels=96,
    num_blocks=2,
    num_heads=2,
    in_channels=16,
    out_channels=16,
    additional_concat_ch=16,
    adaln_lora_dim=8,
    crossattn_emb_channels=16,
    use_context_embedding=True,
)


def torch_reference_generate(sd, cfg_net, rgb_latent, noise, ctx_idx,
                             num_steps, guidance, sigma_data=0.5):
    """Reference sampler semantics in torch (fp32)."""
    sigmas = torch.cat([
        torch.logspace(np.log10(80.0), np.log10(0.02), num_steps,
                       dtype=torch.float32),
        torch.zeros(1),
    ])
    latent_condition = rgb_latent * sigma_data  # identity-VAE encode * sd
    xt = noise * sigmas[0]
    b = rgb_latent.shape[0]
    for i in range(num_steps):
        t = sigmas[i]
        c_in = 1 / torch.sqrt(t**2 + sigma_data**2)
        x_scaled = xt * c_in
        f = oracle_forward(sd, cfg_net, x_scaled, t.expand(b),
                           latent_condition, ctx_idx)
        if guidance > 0:
            f_u = oracle_forward(sd, cfg_net, x_scaled, t.expand(b),
                                 torch.zeros_like(latent_condition),
                                 torch.zeros_like(ctx_idx))
            f = f + guidance * (f - f_u)
        c_skip = sigma_data**2 / (t**2 + sigma_data**2)
        c_out = t * sigma_data / torch.sqrt(t**2 + sigma_data**2)
        denoised = c_skip * xt + c_out * f
        xt = xt + (xt - denoised) / t * (sigmas[i + 1] - t)
    video = xt / sigma_data  # identity-VAE decode
    return ((1.0 + video).clamp(0, 2) / 2).permute(0, 2, 3, 4, 1)  # NTHWC


def run_pair(guidance=0.0, num_steps=5, seed=0):
    sd = make_oracle_state_dict(NET, seed=seed)
    params = convert_dit_state_dict(sd, NET, dtype=jnp.float32)

    cfg = get_inverse_renderer_config(
        height=32, width=48, num_frames=1, net=NET, compute_dtype="float32"
    )

    rng = np.random.default_rng(seed)
    b, t, h, w = 1, 1, 4, 6  # latent dims directly (identity VAE)
    rgb = rng.standard_normal((b, 16, t, h, w)).astype(np.float32)
    noise = rng.standard_normal((b, 16, t, h, w)).astype(np.float32)
    ctx = np.array([3], np.int64)

    expected = torch_reference_generate(
        sd, NET, torch.tensor(rgb), torch.tensor(noise), torch.tensor(ctx),
        num_steps, guidance,
    ).numpy()

    rgb_j = jnp.asarray(rgb)  # conditions enter the jit NCTHW (lane-pad-safe
    # device boundary; _generate_jit transposes to NTHWC internally)
    noise_j = jnp.asarray(noise).transpose(0, 2, 3, 4, 1) * 80.0  # latent: NTHWC
    got_u8 = _generate_jit(
        params,
        None,
        (rgb_j,),
        jnp.asarray(ctx, jnp.int32),
        jax.random.PRNGKey(0),
        jnp.asarray(guidance, jnp.float32),
        jnp.zeros((b,)),
        noise_j,
        cfg=cfg,
        num_steps=num_steps,
        use_cfg=guidance > 0,
        present=(True,),
        identity_vae=True,
    )
    # The jitted path now returns uint8 directly (device-side quantization).
    return np.asarray(got_u8), expected


class TestGoldenE2E:
    def _check(self, got_u8, expected01):
        b = (expected01 * 255).astype(np.uint8)
        # The final uint8 frames differ by at most 1 count vs torch.
        assert got_u8.dtype == np.uint8
        assert np.abs(got_u8.astype(int) - b.astype(int)).max() <= 1

    def test_no_guidance(self):
        self._check(*run_pair(guidance=0.0))

    def test_with_cfg(self):
        self._check(*run_pair(guidance=2.0, seed=1))

    def test_another_seed(self):
        self._check(*run_pair(guidance=0.0, seed=2))
