"""Parity against the ACTUAL reference modules at /root/reference.

Unlike tests/torch_oracle.py (a hand-written restatement), these tests import
the reference code itself — CleanGeneralDIT.py and model_diffusion_renderer.py
run on CPU with only torch+einops — instantiate it at tiny configs, and then:

* truth-test every checkpoint key name by feeding the module's REAL
  state_dict() through convert_dit_state_dict (strict both ways);
* assert dit_forward matches CleanDiffusionRendererGeneralDIT.forward;
* assert the full sampler trajectory matches
  CleanDiffusionRendererModel.generate_samples_from_batch (identity VAE,
  reproduced torch noise), with and without CFG;
* assert latent-condition assembly matches
  prepare_diffusion_renderer_latent_conditions (mask on/off, missing keys);
* assert the EDM scheduler (sigmas / scale_model_input / step) matches
  CleanEDMEulerScheduler step-for-step.

Study-only use of the reference (instantiated as an oracle); no code copied.
"""

from __future__ import annotations

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusionrenderer_tpu.checkpoint import (
    convert_dit_state_dict,
    export_dit_state_dict,
)
from diffusionrenderer_tpu.config import (
    DiTConfig,
    get_forward_renderer_config,
    get_inverse_renderer_config,
)
from diffusionrenderer_tpu.models.dit import dit_forward
from diffusionrenderer_tpu.pipeline import _prepare_latent_conditions
from diffusionrenderer_tpu.sampling.edm import (
    edm_sigmas,
    edm_step,
    sample_edm,
    scale_model_input,
)
from diffusionrenderer_tpu.utils.layout import ncthw_to_nthwc, nthwc_to_ncthw

REF_DIR = "/root/reference"
_PKG = "ref_drc"


def _ref_modules():
    """Import the reference as a package WITHOUT running its __init__
    (which pulls in ComfyUI): register a bare package whose __path__ is the
    reference dir, then import the submodules normally."""
    if _PKG not in sys.modules:
        pkg = types.ModuleType(_PKG)
        pkg.__path__ = [REF_DIR]
        sys.modules[_PKG] = pkg
    dit_mod = importlib.import_module(f"{_PKG}.CleanGeneralDIT")
    mdl_mod = importlib.import_module(f"{_PKG}.model_diffusion_renderer")
    _patch_head_merge(dit_mod)
    return dit_mod, mdl_mod


def _patch_head_merge(dit_mod):
    """Fix a latent crash in the reference so it can run as an oracle.

    transformer_engine's DotProductAttention returns (S, B, H*D) in sbhd
    format; the reference's pure-torch restatement
    (CleanGeneralDIT.py:180-203) returns (S, B, H, D) without merging heads,
    so `to_out` — an nn.Linear with in_features = H*D
    (CleanGeneralDIT.py:254) — crashes on ANY forward (verified standalone).
    The intended contract is unambiguous from that in_features; we restore the
    TE behavior by flattening the head axes after the reference's own SDPA.
    """
    cls = dit_mod.PytorchDotProductAttention
    if getattr(cls, "_head_merge_patched", False):
        return
    orig = cls.forward

    def forward(self, q, k, v, **kwargs):
        out = orig(self, q, k, v, **kwargs)
        return out.flatten(-2)  # (S, B, H, D) -> (S, B, H*D), TE contract

    cls.forward = forward
    cls._head_merge_patched = True


# Tiny-but-real architecture.  The renderer subclass hardwires
# adaln_lora_dim=256 (ref: CleanGeneralDIT.py:725-726), so ours must match.
def _tiny_net_config(use_context_embedding: bool, additional_concat_ch: int):
    return dict(
        model_channels=96,
        num_blocks=2,
        num_heads=2,
        in_channels=16,
        out_channels=16,
        crossattn_emb_channels=16,
        block_config="FA-CA-MLP",
        mlp_ratio=4.0,
        patch_spatial=2,
        patch_temporal=1,
        concat_padding_mask=True,
        additional_concat_ch=additional_concat_ch,
        use_context_embedding=use_context_embedding,
    )


def _tiny_dit_config(use_context_embedding: bool, additional_concat_ch: int):
    return DiTConfig(
        model_channels=96,
        num_blocks=2,
        num_heads=2,
        in_channels=16,
        out_channels=16,
        additional_concat_ch=additional_concat_ch,
        adaln_lora_dim=256,
        crossattn_emb_channels=16,
        use_context_embedding=use_context_embedding,
    )


class _IdentityVAE:
    """Identity tokenizer for the reference model wrapper (the same trick as
    our pipeline's identity_vae mode): isolates sampler/conditioning/network
    math from VAE weights."""

    latent_ch = 16
    spatial_compression_factor = 1

    def get_latent_num_frames(self, t):
        return t

    def encode(self, x):
        return x

    def decode(self, x):
        return x


@pytest.fixture(scope="module")
def ref():
    dit_mod, mdl_mod = _ref_modules()
    return types.SimpleNamespace(dit=dit_mod, mdl=mdl_mod)


@pytest.fixture(scope="module")
def inverse_pair(ref):
    """(reference CleanDiffusionRendererModel, our DiTConfig, converted params)
    for the tiny inverse architecture, real state_dict through the converter."""
    torch.manual_seed(0)
    config = {
        "net": _tiny_net_config(True, 16),
        "scheduler": {"sigma_max": 80.0, "sigma_min": 0.02, "sigma_data": 0.5},
        "model_type": "inverse",
        # The real inverse config (ref: diffusion_renderer_config.py:162-164).
        "condition_keys": ["rgb"],
        "append_condition_mask": False,
    }
    model = ref.mdl.CleanDiffusionRendererModel(config).float().eval()
    # Perturb the norm weights away from init ones so they are load-bearing.
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith((".to_q.1.weight", ".to_k.1.weight")) or (
                "affline_norm" in name
            ):
                p.add_(0.05 * torch.randn_like(p))
    model.vae = _IdentityVAE()
    cfg = _tiny_dit_config(True, 16)
    params = convert_dit_state_dict(model.state_dict(), cfg, dtype=jnp.float32)
    return model, cfg, params


class TestConverterAgainstRealStateDict:
    def test_real_state_dict_converts_strictly(self, inverse_pair):
        # The fixture itself is the assertion: convert_dit_state_dict raises
        # on any missing or unconsumed key, so a successful conversion pins
        # every name in the real module tree (incl. logvar buffers discard).
        _, cfg, params = inverse_pair
        assert params["x_embedder"]["weight"].shape == (cfg.patch_dim, 96)

    def test_forward_variant_converts_strictly(self, ref):
        torch.manual_seed(1)
        net = ref.dit.CleanDiffusionRendererGeneralDIT(
            use_context_embedding=False, **{
                k: v for k, v in _tiny_net_config(False, 17 * 8).items()
                if k != "use_context_embedding"
            }
        ).float().eval()
        cfg = _tiny_dit_config(False, 17 * 8)
        params = convert_dit_state_dict(
            net.state_dict(), cfg, dtype=jnp.float32, prefix=""
        )
        assert "context_embedding" not in params

    def test_export_roundtrips_real_names(self, inverse_pair):
        model, cfg, params = inverse_pair
        exported = export_dit_state_dict(params, cfg)
        real = {
            k: v for k, v in model.state_dict().items()
            if not k.startswith("logvar.")
            and k != "net.pos_embedder.seq"  # derived arange buffer
        }
        assert set(exported) == set(real)
        for k in real:
            np.testing.assert_allclose(
                exported[k], real[k].numpy(), rtol=0, atol=1e-6, err_msg=k
            )


class TestForwardAgainstReference:
    @pytest.mark.parametrize("b,t,h,w", [(1, 1, 8, 12), (2, 2, 4, 6)])
    def test_dit_forward_matches(self, inverse_pair, b, t, h, w):
        model, cfg, params = inverse_pair
        rng = np.random.default_rng(b * 100 + t)
        x = rng.standard_normal((b, 16, t, h, w)).astype(np.float32)
        cond = rng.standard_normal((b, 16, t, h, w)).astype(np.float32)
        sigma = np.full((b,), 7.5, np.float32)
        ctx = np.arange(b, dtype=np.int64) + 2

        with torch.no_grad():
            expected = model.net(
                x=torch.tensor(x),
                timesteps=torch.tensor(sigma),
                latent_condition=torch.tensor(cond),
                context_index=torch.tensor(ctx),
            ).numpy()

        got = dit_forward(
            params,
            ncthw_to_nthwc(jnp.asarray(x)),
            jnp.asarray(sigma),
            ncthw_to_nthwc(jnp.asarray(cond)),
            jnp.asarray(ctx, jnp.int32),
            cfg,
        )
        got = np.asarray(nthwc_to_ncthw(got))
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


class TestSchedulerAgainstReference:
    def test_sigma_table(self, ref):
        sched = ref.mdl.CleanEDMEulerScheduler()
        sched.set_timesteps(15)
        # Ours computes the logspace in fp64 then rounds; torch computes in
        # fp32 — last-ulp differences only (measured relmax 2.3e-7).
        np.testing.assert_allclose(
            np.asarray(edm_sigmas(15)), sched.sigmas.numpy(), rtol=1e-6,
            atol=1e-7,
        )

    def test_scale_and_step_trajectory(self, ref):
        sched = ref.mdl.CleanEDMEulerScheduler()
        num_steps = 7
        sched.set_timesteps(num_steps)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 3, 4)).astype(np.float32)
        xt_ref = torch.tensor(x) * sched.sigmas[0]
        xt_our = jnp.asarray(x) * 80.0
        sigmas = np.asarray(edm_sigmas(num_steps))
        for i, tstep in enumerate(sched.timesteps):
            f = rng.standard_normal((2, 3, 4)).astype(np.float32)
            scaled_ref = sched.scale_model_input(xt_ref, timestep=tstep)
            scaled_our = scale_model_input(xt_our, sigmas[i])
            np.testing.assert_allclose(
                np.asarray(scaled_our), scaled_ref.numpy(), rtol=1e-6,
                atol=1e-6,
            )
            xt_ref = sched.step(torch.tensor(f), tstep, xt_ref).prev_sample
            xt_our = edm_step(jnp.asarray(f), sigmas[i], sigmas[i + 1], xt_our)
            np.testing.assert_allclose(
                np.asarray(xt_our), xt_ref.numpy(), rtol=1e-5, atol=1e-6,
            )


class TestLatentConditionsAgainstReference:
    def test_inverse_no_mask(self, inverse_pair):
        model, cfg, _ = inverse_pair
        rng = np.random.default_rng(3)
        rgb = rng.standard_normal((1, 16, 2, 4, 6)).astype(np.float32)
        data_batch = {"rgb": torch.tensor(rgb),
                      "context_index": torch.tensor([[1]])}
        cond, uncond = model._get_conditions(data_batch)
        expected = cond.to_dict()["latent_condition"].numpy()

        rcfg = get_inverse_renderer_config(
            height=32, width=48, num_frames=2, net=cfg,
            compute_dtype="float32",
        )
        # cond_tensors arrive channels-FIRST at the pipeline boundary
        # (lane-pad-safe device layout; _prepare_latent_conditions docstring).
        got = _prepare_latent_conditions(
            None, None, (jnp.asarray(rgb),), (True,), rcfg,
            identity_vae=True,
        )
        np.testing.assert_allclose(
            np.asarray(nthwc_to_ncthw(got)), expected, rtol=1e-6, atol=1e-6
        )
        assert np.all(uncond.to_dict()["latent_condition"].numpy() == 0)

    def test_forward_mask_and_missing_keys(self, ref):
        """8 condition keys, mask channels, zeros for the 3 missing env keys
        (ref: model_diffusion_renderer.py:158-197)."""
        torch.manual_seed(2)
        config = {
            "net": _tiny_net_config(False, 17 * 8),
            "scheduler": {"sigma_max": 80.0, "sigma_min": 0.02,
                          "sigma_data": 0.5},
            "model_type": "forward",
            # Real order (ref: diffusion_renderer_config.py:222-225).
            "condition_keys": ["basecolor", "normal", "metallic", "roughness",
                               "depth", "env_ldr", "env_log", "env_nrm"],
            "append_condition_mask": True,
        }
        model = ref.mdl.CleanDiffusionRendererModel(config).float().eval()
        model.vae = _IdentityVAE()

        rng = np.random.default_rng(4)
        gb = {
            k: rng.standard_normal((1, 16, 1, 4, 6)).astype(np.float32)
            for k in ("depth", "normal", "basecolor", "roughness", "metallic")
        }
        data_batch = {k: torch.tensor(v) for k, v in gb.items()}
        data_batch["video"] = data_batch["depth"]
        cond, _ = model._get_conditions(data_batch)
        expected = cond.to_dict()["latent_condition"].numpy()

        cfg = _tiny_dit_config(False, 17 * 8)
        rcfg = get_forward_renderer_config(
            height=32, width=48, num_frames=1, net=cfg,
            compute_dtype="float32",
        )
        present = tuple(k in gb for k in rcfg.condition_keys)
        cond_tensors = tuple(
            jnp.asarray(gb[k]) if k in gb
            else jnp.asarray(gb["depth"])  # ignored; NCTHW boundary layout
            for k in rcfg.condition_keys
        )
        got = _prepare_latent_conditions(
            None, None, cond_tensors, present, rcfg, identity_vae=True
        )
        np.testing.assert_allclose(
            np.asarray(nthwc_to_ncthw(got)), expected, rtol=1e-6, atol=1e-6
        )


class TestSamplerTrajectoryAgainstReference:
    @pytest.mark.parametrize("guidance", [0.0, 2.0])
    def test_generate_samples_matches(self, inverse_pair, guidance):
        """Full generate_samples_from_batch vs our sample_edm trajectory,
        identical noise (reproduced from torch.manual_seed), 5 steps."""
        model, cfg, params = inverse_pair
        num_steps, seed = 5, 1000
        t, h, w = 1, 4, 6
        state_shape = (16, t, h, w)
        rng = np.random.default_rng(7)
        rgb = rng.standard_normal((1, 16, t, h, w)).astype(np.float32)

        data_batch = {"rgb": torch.tensor(rgb),
                      "context_index": torch.tensor([[3]])}
        with torch.no_grad():
            expected = model.generate_samples_from_batch(
                data_batch, guidance=guidance, seed=seed,
                state_shape=state_shape, num_steps=num_steps,
            ).numpy()

        # Reproduce the reference's initial noise: first randn after
        # manual_seed(seed) (ref: model_diffusion_renderer.py:216,222 — the
        # identity-VAE condition encode consumes no RNG in between).
        torch.manual_seed(seed)
        noise = torch.randn(1, *state_shape).numpy()

        sigmas = edm_sigmas(num_steps)
        latent_condition = ncthw_to_nthwc(jnp.asarray(rgb)) * 0.5
        ctx = jnp.asarray([3], jnp.int32)
        b = 1

        def denoise_fn(x_scaled, sigma):
            f = dit_forward(
                params, x_scaled, jnp.full((b,), sigma, jnp.float32),
                latent_condition, ctx, cfg,
            )
            if guidance > 0:
                f_u = dit_forward(
                    params, x_scaled, jnp.full((b,), sigma, jnp.float32),
                    jnp.zeros_like(latent_condition), jnp.zeros_like(ctx),
                    cfg,
                )
                f = f + guidance * (f - f_u)
            return f

        x_init = ncthw_to_nthwc(jnp.asarray(noise)) * sigmas[0]
        got = sample_edm(denoise_fn, x_init, sigmas)
        np.testing.assert_allclose(
            np.asarray(nthwc_to_ncthw(got)), expected, rtol=2e-4, atol=2e-4
        )
