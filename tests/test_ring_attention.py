"""Ring attention == full attention, on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusionrenderer_tpu.ops.attention import attention_xla
from diffusionrenderer_tpu.parallel import make_mesh
from diffusionrenderer_tpu.parallel.ring_attention import make_ring_attention


def _run(mesh, b, l, h, d, seed=0, impl="xla"):
    ks = jax.random.split(jax.random.key(seed), 3)
    q, k, v = (jax.random.normal(kk, (b, l, h, d)) for kk in ks)
    expected = np.asarray(attention_xla(q, k, v))

    spec = NamedSharding(mesh, P("data", "seq", "tensor", None))
    qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
    ring = make_ring_attention(mesh, impl=impl)
    with mesh:
        got = np.asarray(jax.jit(ring)(qs, ks_, vs))
    return got, expected


class TestRingAttention:
    def test_matches_full_attention_seq4(self):
        mesh = make_mesh(8, data=1, seq=4, tensor=2)
        got, expected = _run(mesh, b=1, l=64, h=4, d=16)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_matches_with_data_and_seq(self):
        mesh = make_mesh(8, data=2, seq=2, tensor=2)
        got, expected = _run(mesh, b=2, l=32, h=2, d=8, seed=1)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_seq8_full_ring(self):
        mesh = make_mesh(8, data=1, seq=8, tensor=1)
        got, expected = _run(mesh, b=1, l=128, h=1, d=32, seed=2)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_flash_inner_block_matches(self):
        """The Pallas inner block (interpret mode on CPU) merges exactly
        across ring steps — the long-context path is also the fast path."""
        mesh = make_mesh(8, data=1, seq=4, tensor=2)
        got, expected = _run(mesh, b=1, l=64, h=4, d=16, seed=4, impl="flash")
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_flash_inner_block_full_ring(self):
        mesh = make_mesh(8, data=1, seq=8, tensor=1)
        got, expected = _run(mesh, b=2, l=128, h=1, d=32, seed=5,
                             impl="flash")
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_extreme_logits_stable(self):
        mesh = make_mesh(8, data=1, seq=4, tensor=2)
        ks = jax.random.split(jax.random.key(3), 3)
        q, k, v = (jax.random.normal(kk, (1, 32, 2, 16)) for kk in ks)
        q = q * 30.0  # sharp softmax across ring steps
        expected = np.asarray(attention_xla(q, k, v))
        spec = NamedSharding(mesh, P("data", "seq", "tensor", None))
        with mesh:
            got = np.asarray(
                jax.jit(make_ring_attention(mesh))(
                    *(jax.device_put(x, spec) for x in (q, k, v))
                )
            )
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
