"""Round-5 quantizers: Hadamard rotation, scale migration, MSE clip, GPTQ,
and the calibration capture that feeds them.

The reference ships bf16-only (/root/reference/nodes.py:76); these quantizers
exist to push the single-chip int8 accuracy ladder toward the 40 dB bar
(BASELINE.md round-4 ladder) with convert-time techniques.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.calibrate import capture_dit_stats
from diffusionrenderer_tpu.models.dit import dit_forward, init_dit_params
from diffusionrenderer_tpu.models.quant import (
    QuantMode,
    dense_maybe_quantized,
    dequantize_tensor,
    gptq_quantize_host,
    hadamard_block,
    hadamard_rotate,
    parse_quant_mode,
    quantize_dit_params,
    quantize_dit_params_host,
    quantize_leaf_host,
    quantize_tensor,
    quantize_tensor_host,
    _hadamard_matrix,
    _hadamard_signs,
)

CFG = DiTConfig(
    model_channels=128,
    num_blocks=2,
    num_heads=4,
    adaln_lora_dim=8,
    crossattn_emb_channels=128,
    additional_concat_ch=16,
)

K, N = 256, 128


def _rng_w(seed=0, ht=False):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    if ht:
        w[::37] *= 12.0  # outlier input rows — trained-checkpoint shape
    return w


def _dequant_orig_space(leaf):
    """Dequantize a leaf back to the ORIGINAL input space (inverting the
    hs/di transforms) so weight-space MSE is comparable across modes."""
    w = np.asarray(dequantize_tensor(leaf, jnp.float32))
    k = w.shape[-2]
    if "hs" in leaf:
        b = hadamard_block(k)
        h = _hadamard_matrix(b)
        hs = np.asarray(leaf["hs"], np.float32)
        wg = w.reshape(*w.shape[:-2], k // b, b, w.shape[-1])
        w = np.einsum("ij,...jn->...in", h, wg).reshape(w.shape)
        w = w * hs[..., :, None]
    if "di" in leaf:
        w = w * np.asarray(leaf["di"], np.float32)[..., :, None]
    return w


class TestParseGrammar:
    def test_new_tokens(self):
        m = parse_quant_mode("w8a8_g128_had_mse_keepres")
        assert m == QuantMode(True, 128, ("w2", "wo"), hadamard=True,
                              mse_clip=True)
        m = parse_quant_mode("w8_gptq_awq_g32_keepattn")
        assert m.gptq and m.awq and m.group_size == 32
        assert m.needs_calibration
        assert not parse_quant_mode("w8a8").needs_calibration

    def test_bad_suffix_raises(self):
        with pytest.raises(ValueError):
            parse_quant_mode("w8_quarot")


class TestHadamard:
    def test_rotation_pair_is_exact(self):
        """x'W' == xW up to fp rounding: the rotation is an identity."""
        w = _rng_w()
        x = np.random.default_rng(1).standard_normal((7, K)).astype(
            np.float32)
        signs = jnp.asarray(_hadamard_signs(K))
        xr = np.asarray(hadamard_rotate(jnp.asarray(x), signs))
        b = hadamard_block(K)
        h = _hadamard_matrix(b)
        wr = np.einsum(
            "ij,gjn->gin", h,
            (w * _hadamard_signs(K)[:, None]).reshape(K // b, b, N)
        ).reshape(K, N)
        np.testing.assert_allclose(xr @ wr, x @ w, atol=1e-4)

    def test_dense_path_error_comparable_to_rtn(self):
        w = _rng_w()
        x = np.random.default_rng(2).standard_normal((9, K)).astype(
            np.float32)
        y0 = x @ w
        for kwargs in ({"hadamard": True}, {"hadamard": True,
                                            "act_quant": True}):
            qw = quantize_tensor(jnp.asarray(w), **kwargs)
            assert "hs" in qw
            y = np.asarray(dense_maybe_quantized(jnp.asarray(x), qw))
            rel = np.abs(y - y0).max() / np.abs(y0).max()
            assert rel < 0.05, rel

    def test_spreads_heavy_tailed_rows(self):
        """On outlier-row weights the rotation must cut weight-space MSE
        by a large factor (measured 13.8x at this shape) while staying
        neutral on Gaussian weights."""
        for ht, min_gain in ((True, 4.0), (False, 0.8)):
            w = _rng_w(0, ht=ht)
            mse_r = np.mean((_dequant_orig_space(
                quantize_tensor_host(w)) - w) ** 2)
            mse_h = np.mean((_dequant_orig_space(
                quantize_tensor_host(w, hadamard=True)) - w) ** 2)
            assert mse_r / mse_h > min_gain, (ht, mse_r, mse_h)

    def test_block_size_fallbacks(self):
        assert hadamard_block(4096) == 128
        assert hadamard_block(48) == 16
        assert hadamard_block(15) == 1  # odd: rotation skipped
        qw = quantize_tensor(jnp.ones((15, 8)), hadamard=True)
        assert "hs" not in qw


class TestMigration:
    def test_di_leaf_exactness(self):
        w = _rng_w(3)
        x = np.random.default_rng(4).standard_normal((5, K)).astype(
            np.float32)
        di = np.abs(w).max(1).astype(np.float32) + 0.5
        qw = quantize_tensor(jnp.asarray(w), migrate=jnp.asarray(di))
        y = np.asarray(dense_maybe_quantized(jnp.asarray(x), qw))
        y0 = x @ w
        assert np.abs(y - y0).max() / np.abs(y0).max() < 0.02

    def test_awq_tames_outlier_rows(self):
        """Calibrated migration must beat RTN on heavy-tailed weights."""
        w = _rng_w(5, ht=True)
        amean = np.full((K,), 1.0, np.float32)
        mode = parse_quant_mode("w8_awq")
        leaf = quantize_leaf_host(w, mode, amean=amean)
        assert "di" in leaf
        mse_awq = np.mean((_dequant_orig_space(leaf) - w) ** 2)
        mse_rtn = np.mean((_dequant_orig_space(
            quantize_tensor_host(w)) - w) ** 2)
        assert mse_awq < 0.5 * mse_rtn, (mse_awq, mse_rtn)

    def test_awq_requires_stats(self):
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        with pytest.raises(ValueError, match="calibration"):
            quantize_dit_params_host(
                jax.tree.map(np.asarray, params), "w8_awq")


class TestMseClip:
    def test_never_worse_than_rtn(self):
        for seed, ht in ((0, False), (1, True), (2, True)):
            w = _rng_w(seed, ht=ht)
            # Laplacian-ish heavy tails where clipping actually wins:
            w = np.sign(w) * np.abs(w) ** 1.5 * 10
            for gsz in (None, 32):
                base = quantize_tensor_host(w, group_size=gsz)
                clip = quantize_tensor_host(w, group_size=gsz, mse_clip=True)
                mse_b = np.mean((_dequant_orig_space(base) - w) ** 2)
                mse_c = np.mean((_dequant_orig_space(clip) - w) ** 2)
                assert mse_c <= mse_b * (1 + 1e-6)

    def test_device_matches_host(self):
        w = _rng_w(7, ht=True)
        dev = quantize_tensor(jnp.asarray(w), mse_clip=True, group_size=32)
        host = quantize_tensor_host(w, mse_clip=True, group_size=32)
        np.testing.assert_array_equal(np.asarray(dev["q"]),
                                      np.asarray(host["q"]))
        np.testing.assert_allclose(np.asarray(dev["s"]),
                                   np.asarray(host["s"]), rtol=1e-6)


class TestGPTQ:
    def _calib(self, seed=0, n_samples=2048):
        rng = np.random.default_rng(seed)
        a = rng.standard_normal((K, K)).astype(np.float32)
        a = a @ np.diag(np.exp(rng.standard_normal(K) * 0.8)).astype(
            np.float32)
        x = (rng.standard_normal((n_samples, K)).astype(np.float32) @ a
             ) / np.sqrt(K)
        return x, x.T @ x

    def test_identity_hessian_reduces_to_rtn(self):
        w = _rng_w(0)
        g = gptq_quantize_host(w, np.eye(K, dtype=np.float32), damp=0.0)
        r = quantize_tensor_host(w)
        np.testing.assert_array_equal(np.asarray(g["q"]), np.asarray(r["q"]))
        np.testing.assert_allclose(np.asarray(g["s"]), np.asarray(r["s"]),
                                   rtol=1e-6)

    def test_beats_rtn_on_calibration_objective(self):
        w = _rng_w(0)
        x, h = self._calib()
        for gsz in (None, 32):
            g = gptq_quantize_host(w, h, group_size=gsz)
            r = quantize_tensor_host(w, group_size=gsz)
            e_g = np.linalg.norm(x @ (_dequant_orig_space(g) - w))
            e_r = np.linalg.norm(x @ (_dequant_orig_space(r) - w))
            assert e_g < 0.85 * e_r, (gsz, e_g, e_r)

    def test_grouped_scale_layout(self):
        w = _rng_w(1)
        _, h = self._calib(1)
        g = gptq_quantize_host(w, h, group_size=64, act_quant=True)
        assert g["q"].shape == (K, N) and g["sa"].shape == (K // 64, N)

    def test_composes_with_transforms(self):
        """gptq after hadamard+awq through quantize_leaf_host: the Hessian
        must be transformed into the same space as the weight."""
        w = _rng_w(2, ht=True)
        x, h = self._calib(2)
        amean = np.abs(x).mean(0)
        mode = parse_quant_mode("w8_gptq_had_awq")
        leaf = quantize_leaf_host(w, mode, amean=amean, hessian=h)
        assert "hs" in leaf and "di" in leaf
        e = np.linalg.norm(x @ (_dequant_orig_space(leaf) - w))
        e_rtn = np.linalg.norm(
            x @ (_dequant_orig_space(quantize_tensor_host(w)) - w))
        assert e < 0.5 * e_rtn, (e, e_rtn)
        # and the runtime dense path agrees with the offline dequant:
        y = np.asarray(dense_maybe_quantized(
            jnp.asarray(x[:4]), jax.tree.map(jnp.asarray, leaf)))
        y_off = x[:4] @ _dequant_orig_space(leaf)
        np.testing.assert_allclose(y, y_off, atol=2e-2)


class TestCalibrationCapture:
    def _inputs(self, b=2):
        key = jax.random.key(0)
        x = jax.random.normal(key, (b, 1, 8, 8, CFG.in_channels))
        sigma = jnp.asarray([7.5, 1.0][:b])
        cond = jax.random.normal(jax.random.key(1),
                                 (b, 1, 8, 8, CFG.additional_concat_ch))
        ctx = jnp.zeros((b,), jnp.int32)
        return x, sigma, cond, ctx

    def test_capture_shapes_and_psd(self):
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        x, sigma, cond, ctx = self._inputs()
        stats = capture_dit_stats(params, CFG, x, sigma, cond, ctx,
                                  hessian_sites=("mlp.w1",))
        d = CFG.model_channels
        assert stats["amean"]["mlp.w1"].shape == (CFG.num_blocks, d)
        assert stats["amean"]["mlp.w2"].shape == (CFG.num_blocks,
                                                  CFG.hidden_dim)
        assert (stats["amean"]["mlp.w1"] > 0).all()
        h = stats["h"]["mlp.w1"]
        assert h.shape == (CFG.num_blocks, d, d)
        for hb in h:
            np.testing.assert_allclose(hb, hb.T, atol=1e-3)
            assert np.linalg.eigvalsh(hb).min() > -1e-2
        # token count: B * L tokens through each block
        assert stats["count"]["mlp.w1"] == x.shape[0] * 16

    def test_capture_executor_matches_scan_forward(self):
        """The capturing host-loop executor must not change the forward."""
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        x, sigma, cond, ctx = self._inputs()
        ref = dit_forward(params, x, sigma, cond, ctx, CFG)
        captured = {}

        from diffusionrenderer_tpu.models.calibrate import (
            _make_capture_executor,
        )

        out = dit_forward(
            params, x, sigma, cond, ctx, CFG,
            block_executor=_make_capture_executor(CFG, (), captured))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_end_to_end_calibrated_quantization(self):
        """capture -> quantize_dit_params_host(gptq+awq) -> forward runs and
        stays closer to fp32 than plain RTN W8A8 on this model."""
        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        host = jax.tree.map(np.asarray, params)
        x, sigma, cond, ctx = self._inputs()
        stats = capture_dit_stats(
            params, CFG, x, sigma, cond, ctx,
            hessian_sites=("fa.qkv", "fa.wo", "mlp.w1"))
        ref = np.asarray(dit_forward(params, x, sigma, cond, ctx, CFG),
                         np.float32)

        def err(mode):
            qp = quantize_dit_params_host(host, mode, stats)
            out = np.asarray(dit_forward(qp, x, sigma, cond, ctx, CFG),
                             np.float32)
            return np.sqrt(np.mean((out - ref) ** 2))

        e_rtn = err("w8")
        e_cal = err("w8_gptq_awq")
        assert np.isfinite(e_cal) and e_cal < e_rtn * 1.05, (e_cal, e_rtn)


class TestShardedTransformLeaves:
    def test_sharded_matches_unsharded(self):
        """had+awq quantized params under the Megatron TP mesh produce the
        same forward as unsharded (the di/hs leaves shard with K)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual CPU mesh")
        from diffusionrenderer_tpu.parallel import (
            dit_param_shardings,
            make_mesh,
            shard_params,
        )

        params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
        qp = quantize_dit_params(params, act_quant=True, hadamard=True)
        # attach a non-trivial di too
        for sub in qp["blocks"]:
            for name in ("wq", "wo", "w1", "w2"):
                if name in qp["blocks"][sub] and isinstance(
                        qp["blocks"][sub][name], dict):
                    kk = qp["blocks"][sub][name]["q"].shape[-2]
                    qp["blocks"][sub][name]["di"] = jnp.linspace(
                        0.5, 2.0, kk)[None, :].repeat(CFG.num_blocks, 0)
        x = jax.random.normal(jax.random.key(1), (2, 1, 8, 8,
                                                  CFG.in_channels))
        sigma = jnp.asarray([7.5, 1.0])
        cond = jax.random.normal(jax.random.key(2),
                                 (2, 1, 8, 8, CFG.additional_concat_ch))
        ctx = jnp.zeros((2,), jnp.int32)
        ref = np.asarray(dit_forward(qp, x, sigma, cond, ctx, CFG))

        mesh = make_mesh(8)
        qp_s = shard_params(qp, dit_param_shardings(qp, mesh))
        with mesh:
            out = np.asarray(jax.jit(
                lambda p, *a: dit_forward(p, *a, CFG))(
                    qp_s, x, sigma, cond, ctx))
        np.testing.assert_allclose(out, ref, atol=3e-4)
