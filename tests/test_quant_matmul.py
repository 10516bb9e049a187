"""Fused W8A8 quantize-matmul Pallas kernel vs the XLA reference path.

The kernel must match models/quant.dense_maybe_quantized bit-for-bit in its
integer core (same bf16 activation quantize, same int8 codes) and to fp32
rounding in the scale folds, for per-channel and both per-group regimes
(group smaller / larger than the k tile).  Runs in interpret mode off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionrenderer_tpu.models.quant import (
    dense_maybe_quantized,
    quantize_tensor,
)
from diffusionrenderer_tpu.ops.quant_matmul import quant_matmul_w8a8


def _ref(x, wq):
    # XLA reference: the is-TPU router is off on CPU, so this is the plain
    # dense_maybe_quantized W8A8 path.
    return np.asarray(dense_maybe_quantized(x, wq), np.float32)


class TestQuantMatmul:
    @pytest.mark.parametrize("m,k,n", [(512, 1024, 512), (513, 1024, 512)])
    def test_per_channel_matches_xla(self, m, k, n):
        x = jax.random.normal(jax.random.key(0), (m, k), jnp.float32)
        w = jax.random.normal(jax.random.key(1), (k, n), jnp.float32) * 0.1
        wq = quantize_tensor(w, act_quant=True)
        got = np.asarray(quant_matmul_w8a8(x, wq["q"], wq["sa"],
                                           interpret=True), np.float32)
        ref = _ref(x, wq)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("gsz", [128, 512, 1024])
    def test_grouped_matches_xla(self, gsz):
        m, k, n = 512, 2048, 512
        x = jax.random.normal(jax.random.key(2), (m, k), jnp.float32)
        w = jax.random.normal(jax.random.key(3), (k, n), jnp.float32) * 0.1
        w = w.at[7].mul(25.0)  # outlier row exercises distinct group scales
        wq = quantize_tensor(w, act_quant=True, group_size=gsz)
        assert wq["sa"].shape == (k // gsz, n)
        got = np.asarray(quant_matmul_w8a8(x, wq["q"], wq["sa"],
                                           interpret=True), np.float32)
        ref = _ref(x, wq)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_batched_lead_dims(self):
        """bf16 input with lead dims: the kernel quantizes the fp32 product
        (strictly more accurate than the XLA path's bf16-rounded product —
        see ops/quant_matmul.py docstring), so the reference here recomputes
        the same fp32-product quantize rather than dense_maybe_quantized.
        The int8 codes are bit-identical (same XLA pre-pass); the fp32
        group-fold order inside the kernel is not guaranteed to round
        identically to the einsum reference (Mosaic may contract mul+add to
        an FMA), so the final bf16 outputs are compared to 1 bf16 ULP
        (ADVICE r3: round 3 shipped this as strict equality and it failed on
        2/262,144 entries)."""
        b, l, k, n = 2, 256, 1024, 512
        x = jax.random.normal(jax.random.key(4), (b, l, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(5), (k, n), jnp.float32) * 0.1
        wq = quantize_tensor(w, act_quant=True, group_size=512)
        got = quant_matmul_w8a8(x, wq["q"], wq["sa"], interpret=True)
        assert got.shape == (b, l, n) and got.dtype == jnp.bfloat16

        x2 = jnp.reshape(x, (b * l, k))
        amax = jnp.max(jnp.abs(x2).astype(jnp.float32), -1, keepdims=True)
        inv = (127.0 / jnp.maximum(amax, 1e-12)).astype(x.dtype)
        prod = x2.astype(jnp.float32) * inv.astype(jnp.float32)
        xq = jnp.clip(jnp.round(prod), -127, 127).astype(jnp.int8)
        g = wq["sa"].shape[-2]
        xg = xq.reshape(b * l, g, k // g)
        wg = wq["q"].reshape(g, k // g, n)
        y = jnp.einsum("lgk,gko->lgo", xg, wg,
                       preferred_element_type=jnp.int32)
        y = jnp.sum(y.astype(jnp.float32) * wq["sa"], axis=-2)
        ref = (y * (1.0 / inv.astype(jnp.float32))).astype(x.dtype)
        got32 = np.asarray(got, np.float32)
        ref32 = np.asarray(ref.reshape(b, l, n), np.float32)
        # 1 bf16 ULP of v lies in (|v|*2^-8, |v|*2^-7]; |ref|*2^-7 therefore
        # upper-bounds one ULP everywhere (and admits at most one).
        tol = np.maximum(np.abs(ref32), np.float32(2**-126)) * 2.0**-7
        mismatch = np.abs(got32 - ref32) > tol
        assert not mismatch.any(), (
            f"{mismatch.sum()} entries beyond 1 bf16 ULP of the fp32 oracle")

        # And the two paths stay within activation-quantization noise of
        # each other: +-1 int8 code on ~9% of entries accumulates to well
        # under one part in 2^5 of the output scale at these shapes.
        xla = _ref(x, wq)
        np.testing.assert_allclose(np.asarray(got, np.float32), xla,
                                   rtol=0.05, atol=0.35)

    def test_quantize_identical_to_xla_path(self):
        """The integer core must be EXACT: with scale 1 weights already int8
        and fp32 x, outputs are integer-valued and must match exactly."""
        m, k, n = 256, 512, 512
        rng = np.random.default_rng(0)
        q = rng.integers(-127, 128, (k, n), dtype=np.int8)
        x = jnp.asarray(rng.integers(-3, 4, (m, k)).astype(np.float32))
        wq = {"q": jnp.asarray(q), "sa": jnp.ones((n,), jnp.float32)}
        got = np.asarray(quant_matmul_w8a8(x, wq["q"], wq["sa"],
                                           interpret=True), np.float32)
        ref = _ref(x, wq)
        np.testing.assert_array_equal(got, ref)
