"""Pipeline parallelism on the 8-device virtual CPU mesh.

Invariant: the GPipe block-executor (parallel/pipeline_parallel.py) is a
numerics-identical drop-in for the plain lax.scan over stacked blocks —
same forward values, same gradients — for every (data x pipe) mesh shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.dit import dit_forward, init_dit_params
from diffusionrenderer_tpu.parallel.pipeline_parallel import (
    make_pp_executor,
    make_pp_mesh,
    pp_block_shardings,
)

CFG = DiTConfig(
    model_channels=64,
    num_blocks=4,
    num_heads=4,
    adaln_lora_dim=8,
    crossattn_emb_channels=16,
    additional_concat_ch=16,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
    b, t, h, w = 8, 2, 8, 8
    x = jax.random.normal(jax.random.key(1), (b, t, h, w, 16))
    cond = jax.random.normal(jax.random.key(2), (b, t, h, w, 16))
    sigma = jnp.linspace(0.5, 40.0, b)
    ctx = jnp.arange(b, dtype=jnp.int32) % 8
    expected = np.asarray(
        dit_forward(params, x, sigma, cond, ctx, CFG, attn_backend="xla")
    )
    return params, x, sigma, cond, ctx, expected


def _run_pp(setup, mesh, microbatches, **exec_kw):
    params, x, sigma, cond, ctx, _ = setup
    executor = make_pp_executor(mesh, microbatches, **exec_kw)
    pspec = pp_block_shardings(mesh)
    params = dict(params)
    params["blocks"] = jax.tree.map(
        lambda t: jax.device_put(t, pspec), params["blocks"]
    )

    @jax.jit
    def fwd(p, x, s, c, ci):
        return dit_forward(
            p, x, s, c, ci, CFG, attn_backend="xla", block_executor=executor
        )

    with mesh:
        return np.asarray(fwd(params, x, sigma, cond, ctx))


class TestPPForward:
    def test_data_x_pipe(self, setup):
        mesh = make_pp_mesh(num_stages=4, data=2)
        got = _run_pp(setup, mesh, microbatches=4)
        np.testing.assert_allclose(got, setup[-1], rtol=1e-4, atol=1e-5)

    def test_pipe_only(self, setup):
        # No data axis in play: all microbatch rows live on every stage.
        mesh = make_pp_mesh(num_stages=4)
        got = _run_pp(setup, mesh, microbatches=8, data_axis=None)
        np.testing.assert_allclose(got, setup[-1], rtol=1e-4, atol=1e-5)

    def test_more_microbatches_than_stages(self, setup):
        # M > S: stage-0 keeps feeding past the pipeline depth.
        mesh = make_pp_mesh(num_stages=2, data=1)
        got = _run_pp(setup, mesh, microbatches=8)
        np.testing.assert_allclose(got, setup[-1], rtol=1e-4, atol=1e-5)

    def test_remat(self, setup):
        mesh = make_pp_mesh(num_stages=4, data=2)
        got = _run_pp(setup, mesh, microbatches=4, remat=True)
        np.testing.assert_allclose(got, setup[-1], rtol=1e-4, atol=1e-5)

    def test_rejects_indivisible(self, setup):
        params, x, sigma, cond, ctx, _ = setup
        mesh = make_pp_mesh(num_stages=4, data=2)
        executor = make_pp_executor(mesh, num_microbatches=3)
        with pytest.raises(ValueError, match="not divisible"):
            with mesh:
                dit_forward(
                    params, x, sigma, cond, ctx, CFG, attn_backend="xla",
                    block_executor=executor,
                )


class TestPPGradients:
    def test_grad_matches_scan(self, setup):
        """The schedule is one scan + ppermute: differentiable end-to-end.
        Check dL/dparams on a scalar loss matches the plain-scan gradients."""
        params, x, sigma, cond, ctx, _ = setup
        mesh = make_pp_mesh(num_stages=4, data=2)
        executor = make_pp_executor(mesh, num_microbatches=4, remat=True)
        pspec = pp_block_shardings(mesh)

        def loss_plain(p):
            out = dit_forward(p, x, sigma, cond, ctx, CFG, attn_backend="xla")
            return jnp.mean(out**2)

        def loss_pp(p):
            out = dit_forward(
                p, x, sigma, cond, ctx, CFG, attn_backend="xla",
                block_executor=executor,
            )
            return jnp.mean(out**2)

        g_plain = jax.jit(jax.grad(loss_plain))(params)

        params_pp = dict(params)
        params_pp["blocks"] = jax.tree.map(
            lambda t: jax.device_put(t, pspec), params_pp["blocks"]
        )
        with mesh:
            g_pp = jax.jit(jax.grad(loss_pp))(params_pp)

        flat_a, _ = jax.tree.flatten(g_plain)
        flat_b, _ = jax.tree.flatten(g_pp)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5
            )
