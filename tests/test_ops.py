"""Unit tests for core DiT ops against small torch/numpy oracles.

Each oracle re-states the reference math (file:line cited per test) in a few
lines of torch, then we check the JAX op matches in fp32 to tight tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusionrenderer_tpu.ops.attention import attention_xla
from diffusionrenderer_tpu.ops.norms import (
    layer_norm_no_affine,
    modulate,
    rms_norm,
)
from diffusionrenderer_tpu.ops.patch import patchify, unpatchify
from diffusionrenderer_tpu.ops.rope import apply_rope, rope_3d_angles
from diffusionrenderer_tpu.ops.timestep import sinusoidal_embedding


def rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


class TestRMSNorm:
    def test_matches_reference_formula(self):
        # ref: CleanGeneralDIT.py:23-33
        x = rand(4, 7, 16)
        w = rand(16, seed=1) * 0.1 + 1.0
        xt = torch.tensor(x)
        var = xt.pow(2).mean(dim=-1, keepdim=True)
        expected = (xt * torch.rsqrt(var + 1e-6)) * torch.tensor(w)
        got = rms_norm(jnp.asarray(x), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_roundtrip_dtype(self):
        x = jnp.asarray(rand(2, 8), jnp.bfloat16)
        out = rms_norm(x, jnp.ones(8, jnp.bfloat16))
        assert out.dtype == jnp.bfloat16


class TestLayerNorm:
    def test_matches_torch_layernorm(self):
        # ref: CleanGeneralDIT.py:481 (elementwise_affine=False, eps=1e-6)
        x = rand(3, 5, 32)
        expected = torch.nn.functional.layer_norm(
            torch.tensor(x), (32,), eps=1e-6
        ).numpy()
        got = layer_norm_no_affine(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


class TestModulate:
    def test_broadcast_over_tokens(self):
        # ref: CleanGeneralDIT.py:7-11 — x*(1+scale)+shift
        x = rand(2, 6, 4)
        shift, scale = rand(2, 4, seed=1), rand(2, 4, seed=2)
        got = modulate(jnp.asarray(x), jnp.asarray(shift), jnp.asarray(scale))
        expected = x * (1 + scale[:, None, :]) + shift[:, None, :]
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


class TestRope:
    def _torch_table(self, t, h, w, head_dim, t_ntk=2.0):
        # Oracle mirrors CleanRoPE3D (ref: CleanGeneralDIT.py:86-159).
        dim_h = head_dim // 6 * 2
        dim_t = head_dim - 2 * dim_h
        sp = torch.arange(0, dim_h, 2)[: dim_h // 2].float() / dim_h
        tp = torch.arange(0, dim_t, 2)[: dim_t // 2].float() / dim_t
        hf = 1.0 / (10000.0**sp)
        wf = 1.0 / (10000.0**sp)
        tf = 1.0 / ((10000.0 * t_ntk) ** tp)
        et = torch.outer(torch.arange(t).float(), tf)
        eh = torch.outer(torch.arange(h).float(), hf)
        ew = torch.outer(torch.arange(w).float(), wf)
        parts = [
            et[:, None, None, :].expand(t, h, w, -1),
            eh[None, :, None, :].expand(t, h, w, -1),
            ew[None, None, :, :].expand(t, h, w, -1),
        ]
        emb = torch.cat(parts * 2, dim=-1)
        return emb.reshape(t * h * w, head_dim)

    def test_table_matches_oracle_128(self):
        got = rope_3d_angles(3, 4, 5, 128)
        expected = self._torch_table(3, 4, 5, 128).numpy()
        assert got.shape == (60, 128)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)

    def test_dim_split_42_42_44(self):
        # head_dim 128 -> h/w/t = 42/42/44 (ref: CleanGeneralDIT.py:94-98)
        from diffusionrenderer_tpu.ops.rope import _rope_dims

        assert _rope_dims(128) == (44, 42, 42)

    def test_apply_rope_matches_rotate_half_oracle(self):
        # ref: CleanGeneralDIT.py:45-82 (sbhd there; blhd here)
        b, l, h, d = 2, 12, 3, 8
        x = rand(b, l, h, d)
        angles = rand(l, d, seed=3)
        xt = torch.tensor(x)
        f = torch.tensor(angles)[None, :, None, :]
        x1, x2 = xt.chunk(2, dim=-1)
        rot = torch.cat((-x2, x1), dim=-1)
        expected = (xt * f.cos() + rot * f.sin()).numpy()
        got = apply_rope(jnp.asarray(x), jnp.asarray(angles))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


class TestSinusoid:
    def test_cos_sin_concat_order(self):
        # ref: CleanGeneralDIT.py:316-335 — [cos, sin] order
        import math

        t = np.array([0.5, 80.0], np.float32)
        dim = 16
        half = dim // 2
        exponent = -math.log(10000.0) * torch.arange(half).float() / half
        emb = torch.tensor(t)[:, None] * exponent.exp()[None, :]
        expected = torch.cat([emb.cos(), emb.sin()], dim=-1).numpy()
        got = sinusoidal_embedding(jnp.asarray(t), dim)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3, atol=1e-5)


class TestPatchify:
    def test_roundtrip(self):
        x = rand(2, 4, 6, 8, 5)
        p = patchify(jnp.asarray(x), patch_spatial=2, patch_temporal=1)
        assert p.shape == (2, 4, 3, 4, 5 * 4)

    def test_flatten_order_matches_einops_oracle(self):
        # ref: CleanGeneralDIT.py:406-417 — 'b c (t r) (h m) (w n) -> b t h w (c r m n)'
        from einops import rearrange

        x = rand(1, 2, 4, 6, 3)  # (B, T, H, W, C)
        x_ncthw = torch.tensor(x).permute(0, 4, 1, 2, 3)
        expected = rearrange(
            x_ncthw, "b c (t r) (h m) (w n) -> b t h w (c r m n)", r=2, m=2, n=2
        ).numpy()
        got = patchify(jnp.asarray(x), patch_spatial=2, patch_temporal=2)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)

    def test_unpatchify_matches_einops_oracle(self):
        # ref: CleanGeneralDIT.py:709-717 —
        # '(B T) (H W) (ph pw pt C) -> B C (T pt) (H ph) (W pw)'
        from einops import rearrange

        b, tp, hp, wp, ps, pt, c = 2, 3, 2, 4, 2, 1, 5
        x = rand(b, tp * hp * wp, ps * ps * pt * c)
        xt = torch.tensor(x).reshape(b * tp, hp * wp, -1)
        expected = rearrange(
            xt,
            "(B T) (H W) (ph pw pt C) -> B C (T pt) (H ph) (W pw)",
            ph=ps, pw=ps, pt=pt, H=hp, W=wp, B=b, T=tp,
        )
        expected_nthwc = expected.permute(0, 2, 3, 4, 1).numpy()
        got = unpatchify(jnp.asarray(x), tp, hp, wp, ps, pt, c)
        np.testing.assert_allclose(np.asarray(got), expected_nthwc, rtol=1e-6)


class TestAttention:
    def test_matches_torch_sdpa(self):
        # ref: CleanGeneralDIT.py:192-197 (non-causal, no mask)
        b, l, h, d = 2, 16, 4, 8
        q, k, v = rand(b, l, h, d), rand(b, l, h, d, seed=1), rand(b, l, h, d, seed=2)
        expected = torch.nn.functional.scaled_dot_product_attention(
            torch.tensor(q).permute(0, 2, 1, 3),
            torch.tensor(k).permute(0, 2, 1, 3),
            torch.tensor(v).permute(0, 2, 1, 3),
        ).permute(0, 2, 1, 3).numpy()
        got = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)

    def test_single_kv_softmax_identity(self):
        # With one key, softmax == 1 -> output == v for every query.
        b, l, h, d = 1, 9, 2, 4
        q = rand(b, l, h, d)
        k, v = rand(b, 1, h, d, seed=1), rand(b, 1, h, d, seed=2)
        got = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        expected = np.broadcast_to(v, (b, l, h, d))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)
