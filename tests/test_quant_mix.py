"""Round-5 '_mixN' blockwise mixed precision: the N highest-damage blocks
keep all weights bf16 (separate lax.scan segments) while the rest stay
int8 — spends the single-chip HBM headroom where the measured quantization
damage is (BASELINE.md round-5 ladder; the reference ships bf16-only on an
80 GB A100, /root/reference/nodes.py:76, so blockwise mixed precision has
no reference counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.dit import dit_forward, init_dit_params
from diffusionrenderer_tpu.models.quant import (
    _mix_bf16_set,
    mix_block_damage,
    parse_quant_mode,
    quantize_dit_params_host,
)

CFG = DiTConfig(
    model_channels=128,
    num_blocks=4,
    num_heads=4,
    adaln_lora_dim=8,
    crossattn_emb_channels=128,
    additional_concat_ch=16,
)


@pytest.fixture(scope="module")
def host_params():
    params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.bfloat16)
    return jax.tree.map(np.asarray, params)


@pytest.fixture(scope="module")
def inputs():
    x = jax.random.normal(jax.random.key(1), (1, 16, 4, 4, CFG.in_channels),
                          jnp.bfloat16)
    sig = jnp.full((1,), 1.0, jnp.bfloat16)
    cond = jax.random.normal(jax.random.key(2),
                             (1, 16, 4, 4, CFG.additional_concat_ch),
                             jnp.bfloat16)
    ci = jnp.zeros((1,), jnp.int32)
    return x, sig, cond, ci


def _fwd(params, inputs):
    x, sig, cond, ci = inputs
    return dit_forward(params, x, sig, cond, ci, CFG)


class TestParse:
    def test_mix_suffix(self):
        qm = parse_quant_mode("w8_g32_keepres_keepattn_gptq_mix8")
        assert qm.mix_blocks == 8 and qm.gptq and qm.group_size == 32

    def test_bad_mix_raises(self):
        with pytest.raises(ValueError):
            parse_quant_mode("w8_mixx8")


class TestSegments:
    def test_mix_all_blocks_is_exact_bf16(self, host_params, inputs):
        ref = _fwd(jax.tree.map(jnp.asarray, host_params), inputs)
        q = quantize_dit_params_host(host_params, "w8_mix4")
        assert isinstance(q["blocks"], tuple) and len(q["blocks"]) == 1
        out = _fwd(q, inputs)
        assert bool(jnp.all(out == ref))

    def test_boundary_split_shapes(self, host_params):
        q = quantize_dit_params_host(host_params, "w8_mix2")
        lens = [jax.tree_util.tree_leaves(s)[0].shape[0]
                for s in q["blocks"]]
        assert lens == [1, 2, 1]
        # middle segment quantized, edges bf16
        assert isinstance(q["blocks"][1]["mlp"]["w1"], dict)
        assert not isinstance(q["blocks"][0]["mlp"]["w1"], dict)

    def test_mix_error_below_full_quant(self, host_params, inputs):
        ref = _fwd(jax.tree.map(jnp.asarray, host_params), inputs)
        e = {}
        for mode in ("w8", "w8_mix2"):
            out = _fwd(quantize_dit_params_host(host_params, mode), inputs)
            e[mode] = float(jnp.mean(
                (out.astype(jnp.float32) - ref.astype(jnp.float32)) ** 2))
        assert e["w8_mix2"] < e["w8"]


class TestRanking:
    def test_damage_ranks_outlier_block(self, host_params):
        params = jax.tree.map(np.copy, host_params)
        # Make block 2's MLP-up weight an outlier: far more RTN damage.
        params["blocks"]["mlp"]["w1"][2] *= 25.0
        mode = parse_quant_mode("w8_g32_keepres_keepattn_mix1")
        site_k = params["blocks"]["mlp"]["w1"].shape[-2]
        calib = {"amean": {"mlp.w1": np.ones((CFG.num_blocks, site_k),
                                             np.float32)},
                 "h": {}}
        damage = mix_block_damage(params, mode, calib)
        assert int(np.argmax(damage)) == 2
        assert _mix_bf16_set(params, mode, calib, CFG.num_blocks) == {2}

    def test_ranked_split_applied(self, host_params):
        params = jax.tree.map(np.copy, host_params)
        params["blocks"]["mlp"]["w1"][2] *= 25.0
        site_k = params["blocks"]["mlp"]["w1"].shape[-2]
        calib = {"amean": {"mlp.w1": np.ones((CFG.num_blocks, site_k),
                                             np.float32)},
                 "h": {}}
        q = quantize_dit_params_host(params, "w8_g32_keepres_keepattn_mix1",
                                     calib)
        lens = [jax.tree_util.tree_leaves(s)[0].shape[0]
                for s in q["blocks"]]
        assert lens == [2, 1, 1]  # blocks 0-1 int8, block 2 bf16, block 3 int8
        assert not isinstance(q["blocks"][1]["mlp"]["w1"], dict)
        assert isinstance(q["blocks"][0]["mlp"]["w1"], dict)
        assert isinstance(q["blocks"][2]["mlp"]["w1"], dict)

    def test_boundary_fallback_without_calib(self, host_params):
        mode = parse_quant_mode("w8_mix3")
        assert _mix_bf16_set(host_params, mode, None, 4) == {0, 1, 3}


class TestSharded:
    def test_sharded_matches_unsharded(self, host_params, inputs):
        from diffusionrenderer_tpu.parallel import (
            dit_param_shardings, make_mesh, shard_params,
        )

        q = quantize_dit_params_host(host_params, "w8_g32_keepres_mix2")
        ref = _fwd(q, inputs)
        mesh = make_mesh(data=2, seq=1, tensor=4)
        shardings = dit_param_shardings(q, mesh)
        qs = shard_params(q, shardings)
        with mesh:
            out = jax.jit(lambda p, i: _fwd(p, i))(qs, inputs)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0.02, atol=0.02)


class TestGuards:
    def test_block_executor_rejects_segments(self, host_params, inputs):
        q = quantize_dit_params_host(host_params, "w8_mix2")
        x, sig, cond, ci = inputs

        def executor(blocks, tokens, *a):
            return tokens

        with pytest.raises(ValueError, match="mixN"):
            dit_forward(q, x, sig, cond, ci, CFG, block_executor=executor)

    def test_export_rejects_segments(self, host_params):
        from diffusionrenderer_tpu.checkpoint import export_dit_state_dict

        q = quantize_dit_params_host(host_params, "w8_mix2")
        with pytest.raises(ValueError, match="mixN"):
            export_dit_state_dict(q, CFG)
