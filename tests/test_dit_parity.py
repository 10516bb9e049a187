"""Full-DiT parity: JAX dit_forward vs the torch oracle, through the
checkpoint converter.  This is the golden test that the model math AND the
state-dict conversion jointly reproduce the reference network."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusionrenderer_tpu.checkpoint import (
    convert_dit_state_dict,
    export_dit_state_dict,
)
from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.dit import dit_forward, dit_param_count
from diffusionrenderer_tpu.utils.layout import ncthw_to_nthwc, nthwc_to_ncthw

from torch_oracle import make_oracle_state_dict, oracle_forward

TINY_INVERSE = DiTConfig(
    model_channels=96,
    num_blocks=3,
    num_heads=2,  # head_dim 48 -> rope split 16/16/16
    in_channels=4,
    out_channels=4,
    additional_concat_ch=4,
    adaln_lora_dim=8,
    crossattn_emb_channels=16,
    use_context_embedding=True,
)
TINY_FORWARD = DiTConfig(
    model_channels=96,
    num_blocks=2,
    num_heads=2,
    in_channels=4,
    out_channels=4,
    additional_concat_ch=10,
    adaln_lora_dim=8,
    crossattn_emb_channels=16,
    use_context_embedding=False,
)


def _run_both(cfg, seed=0, b=2, t=2, h=4, w=6, sigma_val=7.5):
    sd = make_oracle_state_dict(cfg, seed=seed)
    params = convert_dit_state_dict(sd, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, cfg.in_channels, t, h, w)).astype(np.float32)
    cond = rng.standard_normal(
        (b, cfg.additional_concat_ch, t, h, w)
    ).astype(np.float32)
    sigma = np.full((b,), sigma_val, np.float32)
    ctx_idx = np.array([1, 3][:b], np.int64) if cfg.use_context_embedding else None

    expected = oracle_forward(
        sd,
        cfg,
        torch.tensor(x),
        torch.tensor(sigma),
        torch.tensor(cond),
        torch.tensor(ctx_idx) if ctx_idx is not None else None,
    ).numpy()

    got = dit_forward(
        params,
        ncthw_to_nthwc(jnp.asarray(x)),
        jnp.asarray(sigma),
        ncthw_to_nthwc(jnp.asarray(cond)),
        jnp.asarray(ctx_idx, jnp.int32) if ctx_idx is not None else None,
        cfg,
    )
    got = np.asarray(nthwc_to_ncthw(got))
    return got, expected


class TestDiTParity:
    def test_inverse_variant_matches_oracle(self):
        got, expected = _run_both(TINY_INVERSE)
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)

    def test_forward_variant_matches_oracle(self):
        got, expected = _run_both(TINY_FORWARD)
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)

    def test_sigma_sensitivity(self):
        """Different sigmas must give different outputs (conditioning wired)."""
        a, _ = _run_both(TINY_INVERSE, sigma_val=80.0)
        b, _ = _run_both(TINY_INVERSE, sigma_val=0.02)
        assert np.abs(a - b).max() > 1e-3

    def test_context_index_sensitivity(self):
        """context_index must change the output (G-buffer selection wired)."""
        sd = make_oracle_state_dict(TINY_INVERSE)
        params = convert_dit_state_dict(sd, TINY_INVERSE, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 2, 4, 6, 4)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((1, 2, 4, 6, 4)), jnp.float32)
        sig = jnp.full((1,), 5.0)
        outs = [
            np.asarray(
                dit_forward(params, x, sig, cond, jnp.array([i]), TINY_INVERSE)
            )
            for i in (0, 4)
        ]
        assert np.abs(outs[0] - outs[1]).max() > 1e-6


class TestConverter:
    def test_strict_missing_key(self):
        sd = make_oracle_state_dict(TINY_INVERSE)
        del sd["net.blocks.block1.blocks.2.block.layer1.weight"]
        with pytest.raises(KeyError):
            convert_dit_state_dict(sd, TINY_INVERSE)

    def test_strict_unexpected_key(self):
        sd = make_oracle_state_dict(TINY_INVERSE)
        sd["net.some_extra.weight"] = torch.zeros(3)
        with pytest.raises(ValueError):
            convert_dit_state_dict(sd, TINY_INVERSE)

    def test_logvar_head_ignored(self):
        sd = make_oracle_state_dict(TINY_INVERSE)
        assert "logvar.1.weight" in sd  # present in checkpoint, discarded
        convert_dit_state_dict(sd, TINY_INVERSE)  # no raise

    def test_roundtrip_export(self):
        sd = make_oracle_state_dict(TINY_INVERSE)
        params = convert_dit_state_dict(sd, TINY_INVERSE, dtype=jnp.float32)
        sd2 = export_dit_state_dict(params, TINY_INVERSE)
        for k, v in sd2.items():
            np.testing.assert_allclose(
                v, sd[k].numpy(), rtol=1e-6, err_msg=k
            )

    def test_param_count_formula(self):
        sd = make_oracle_state_dict(TINY_INVERSE)
        n_ckpt = sum(
            v.numel()
            for k, v in sd.items()
            if k.startswith("net.")
        )
        assert dit_param_count(TINY_INVERSE) == n_ckpt
