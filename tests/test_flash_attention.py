"""Pallas flash attention vs the XLA softmax-attention oracle.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel compiles
natively on TPU (exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionrenderer_tpu.ops.attention import attention_xla
from diffusionrenderer_tpu.ops.flash_attention import flash_attention


def make_qkv(b, l, h, d, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(seed), 3)
    mk = lambda k: jax.random.normal(k, (b, l, h, d), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


class TestFlashAttention:
    @pytest.mark.parametrize(
        "b,l,h,d,blk",
        [
            (1, 256, 2, 128, 128),   # multiple blocks, even split
            (2, 128, 1, 128, 128),   # single block
            (1, 384, 1, 128, 128),   # 3 kv blocks
        ],
    )
    def test_matches_xla(self, b, l, h, d, blk):
        q, k, v = make_qkv(b, l, h, d)
        expected = np.asarray(attention_xla(q, k, v))
        got = np.asarray(
            flash_attention(q, k, v, block_q=blk, block_k=blk, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)

    def test_ragged_tail_masked(self):
        """L not divisible by the block: padded keys must not leak."""
        b, l, h, d = 1, 200, 2, 128
        q, k, v = make_qkv(b, l, h, d, seed=1)
        expected = np.asarray(attention_xla(q, k, v))
        got = np.asarray(
            flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)

    def test_bf16_inputs(self):
        b, l, h, d = 1, 256, 2, 128
        q, k, v = make_qkv(b, l, h, d, seed=2, dtype=jnp.bfloat16)
        expected = np.asarray(attention_xla(q, k, v), np.float32)
        got = np.asarray(
            flash_attention(q, k, v, block_q=128, block_k=128, interpret=True),
            np.float32,
        )
        np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)

    def test_extreme_logits_stable(self):
        """Online softmax must survive large logit magnitudes."""
        b, l, h, d = 1, 256, 1, 128
        q, k, v = make_qkv(b, l, h, d, seed=3)
        q = q * 30.0
        got = np.asarray(
            flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        )
        expected = np.asarray(attention_xla(q, k, v))
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("l", [256, 200])  # even split + ragged tail
    def test_bounded_matches_xla(self, l):
        """Bounded-softmax variant (precomputed Cauchy-Schwarz row bound,
        no running max): exact to fp32 rounding — the default TPU dispatch."""
        q, k, v = make_qkv(1, l, 2, 128, seed=5)
        expected = np.asarray(attention_xla(q, k, v))
        got = np.asarray(
            flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True, bounded=True)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)

    def test_bounded_rms_normalized_envelope(self):
        """Sharp softmax within the DiT's operating envelope (per-head
        RMS-normalized q/k with gamma ~2.5): bound overshoot stays tiny."""
        q, k, v = make_qkv(1, 256, 2, 128, seed=6)
        rms = lambda x: x * jax.lax.rsqrt(
            jnp.mean(x * x, axis=-1, keepdims=True) + 1e-6)
        q, k = rms(q) * 2.5, rms(k) * 2.5
        expected = np.asarray(attention_xla(q, k, v))
        got = np.asarray(
            flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True, bounded=True)
        )
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)

    def test_bounded_noshift_branch_matches_xla(self):
        """Unit-scale inputs pass the global fp32-range check, so bounded
        mode takes the no-shift kernel (p = exp2(s), no per-row bound
        operand) — must still match the oracle exactly."""
        q, k, v = make_qkv(1, 256, 2, 128, seed=8)
        q, k = q * 0.1, k * 0.1  # headroom check certainly passes
        expected = np.asarray(attention_xla(q, k, v))
        got = np.asarray(
            flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True, bounded=True)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)

    def test_bounded_fallback_branch_large_logits(self):
        """Out-of-envelope magnitudes (bound >> fp32 headroom) must take the
        shifted kernel through the lax.cond and stay exact."""
        q, k, v = make_qkv(1, 256, 1, 128, seed=9)
        q = q * 100.0  # row bound ~ 1.6k log2 units: no-shift would overflow
        expected = np.asarray(attention_xla(q, k, v))
        got = np.asarray(
            flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True, bounded=True)
        )
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("l", [256, 200])  # even split + ragged tail
    def test_bounded_pipelined_matches_xla(self, l):
        """Software-pipelined bounded variant (score tile carried in VMEM
        scratch across grid steps, one drain step): same ops per tile as
        bounded — identical numerics required."""
        q, k, v = make_qkv(1, l, 2, 128, seed=5)
        expected = np.asarray(attention_xla(q, k, v))
        got = np.asarray(
            flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True, bounded=True, pipelined=True)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("mode", ["qk8", "qk8pv8"])
    def test_int8_modes_within_quant_tolerance(self, mode):
        """SageAttention-style int8 paths: error bounded by int8 resolution."""
        q, k, v = make_qkv(2, 256, 2, 64, seed=7)
        expected = np.asarray(attention_xla(q, k, v))
        got = np.asarray(flash_attention(
            q, k, v, block_q=128, block_k=128, interpret=True,
            qk_int8=True, pv_int8=(mode == "qk8pv8"),
        ))
        tol = 0.012 if mode == "qk8" else 0.025
        assert np.abs(got - expected).max() < tol

    def test_default_blocks_rebalance_chunked(self):
        """Default (704, 2816) blocks at L=1024: _flash_call's balancing
        turns the 704 q-block into two exact 512 tiles (no padding waste)
        and the no-shift body runs its 4-way query-chunked exp2->PV loop
        (NOSHIFT_VPU_CHUNKS=4, cq=128) — must match the oracle exactly."""
        q, k, v = make_qkv(1, 1024, 2, 128, seed=11)
        q, k = q * 0.1, k * 0.1  # stay inside the no-shift envelope
        expected = np.asarray(attention_xla(q, k, v))
        got = np.asarray(
            flash_attention(q, k, v, interpret=True, bounded=True)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)

    def test_wide_single_head_512(self):
        """The VAE's single-head C=512 attention path."""
        b, l, h, d = 2, 300, 1, 512
        q, k, v = make_qkv(b, l, h, d, seed=4)
        expected = np.asarray(attention_xla(q, k, v))
        got = np.asarray(
            flash_attention(q, k, v, block_q=256, block_k=128, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)
