"""End-to-end pipeline/API tests on scaled-down models.

Covers the reference node behaviors (ref: nodes.py) and pipeline post-
processing (ref: diffusion_renderer_pipeline.py:242-320) without full-size
weights: shapes, determinism, CFG wiring, batched 5-pass inverse, forward
relighting with envmap preprocessing.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionrenderer_tpu.api import forward_render, inverse_render
from diffusionrenderer_tpu.config import DiTConfig, VAEConfig
from diffusionrenderer_tpu.models.dit import init_dit_params
from diffusionrenderer_tpu.models.vae import init_vae_params
from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline

TINY_VAE = VAEConfig(
    encoder_block_out_channels=(8, 12, 16, 16),
    decode_block_out_channels=(12, 16, 16, 16),
    num_layers=1,
)
TINY_INV_NET = DiTConfig(
    model_channels=48,
    num_blocks=2,
    num_heads=2,
    adaln_lora_dim=8,
    crossattn_emb_channels=16,
    additional_concat_ch=16,
    use_context_embedding=True,
)
TINY_FWD_NET = DiTConfig(
    model_channels=48,
    num_blocks=2,
    num_heads=2,
    adaln_lora_dim=8,
    crossattn_emb_channels=16,
    additional_concat_ch=17 * 8,
    use_context_embedding=False,
)


def make_pipeline(model_type, **kw):
    net = TINY_INV_NET if model_type == "inverse" else TINY_FWD_NET
    dit = init_dit_params(jax.random.key(0), net, dtype=jnp.float32)
    vae = init_vae_params(jax.random.key(1), TINY_VAE, dtype=jnp.float32)
    return DiffusionRendererPipeline(
        dit, vae, model_type=model_type, num_steps=3,
        compute_dtype="float32", net_config=net, vae_config=TINY_VAE, **kw
    )


@pytest.fixture(scope="module")
def inv_pipe():
    return make_pipeline("inverse")


def test_compute_dtype_derived_from_params():
    """Default compute_dtype follows the weights: fp32 params must run fp32
    end-to-end without an explicit compute_dtype (XLA convs reject mixed
    bf16/fp32 operands — regression for the public-API footgun)."""
    dit = init_dit_params(jax.random.key(0), TINY_INV_NET, dtype=jnp.float32)
    vae = init_vae_params(jax.random.key(1), TINY_VAE, dtype=jnp.float32)
    pipe = DiffusionRendererPipeline(
        dit, vae, model_type="inverse", num_steps=2,
        net_config=TINY_INV_NET, vae_config=TINY_VAE,
    )
    assert pipe.compute_dtype == "float32"
    video = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 1, 16, 16, 3)), jnp.float32
    )
    out = pipe.generate(
        {"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)}, seed=0
    )
    assert out.shape == (1, 1, 16, 16, 3) and np.isfinite(
        np.asarray(out, np.float32)).all()


@pytest.fixture(scope="module")
def fwd_pipe():
    return make_pipeline("forward")


class TestGenerate:
    def test_output_shape_and_dtype(self, inv_pipe):
        img = np.random.default_rng(0).uniform(size=(1, 1, 16, 16, 3))
        video = img * 2 - 1
        out = inv_pipe.generate(
            {"rgb": jnp.asarray(video, jnp.float32),
             "context_index": jnp.zeros((1,), jnp.int32)}
        )
        assert out.shape == (1, 1, 16, 16, 3)
        assert out.dtype == np.uint8

    def test_deterministic_same_seed(self, inv_pipe):
        video = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (1, 1, 16, 16, 3)), jnp.float32
        )
        batch = {"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)}
        a = inv_pipe.generate(batch, seed=7)
        b = inv_pipe.generate(batch, seed=7)
        np.testing.assert_array_equal(a, b)

    def test_different_seed_differs(self, inv_pipe):
        video = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (1, 1, 16, 16, 3)), jnp.float32
        )
        batch = {"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)}
        a = inv_pipe.generate(batch, seed=7)
        b = inv_pipe.generate(batch, seed=8)
        assert np.abs(a.astype(int) - b.astype(int)).max() > 0

    def test_cfg_changes_output(self):
        pipe = make_pipeline("inverse")
        video = jnp.asarray(
            np.random.default_rng(2).uniform(-1, 1, (1, 1, 16, 16, 3)), jnp.float32
        )
        batch = {"rgb": video, "context_index": jnp.ones((1,), jnp.int32)}
        a = pipe.generate(batch, seed=3)
        pipe.guidance = 2.0
        b = pipe.generate(batch, seed=3)
        assert np.abs(a.astype(int) - b.astype(int)).max() > 0

    def test_video_frames(self, inv_pipe):
        video = jnp.asarray(
            np.random.default_rng(3).uniform(-1, 1, (1, 9, 16, 16, 3)), jnp.float32
        )
        out = inv_pipe.generate(
            {"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)}
        )
        assert out.shape == (1, 9, 16, 16, 3)

    def test_wrong_checkpoint_type_rejected(self, inv_pipe):
        inv_pipe.set_model_type("forward")
        video = jnp.zeros((1, 1, 16, 16, 3), jnp.float32)
        try:
            with pytest.raises(ValueError,
                               match="patch_dim|additional_concat_ch"):
                inv_pipe.generate({"depth": video})
        finally:
            inv_pipe.set_model_type("inverse")


class TestInverseAPI:
    def test_five_passes_batched(self, inv_pipe):
        img = np.random.default_rng(4).uniform(size=(1, 16, 16, 3)).astype(
            np.float32
        )
        out = inverse_render(inv_pipe, img, batch_passes=True)
        assert set(out) == {"basecolor", "metallic", "roughness", "normal", "depth"}
        for v in out.values():
            assert v.shape == (1, 16, 16, 3)
            assert 0.0 <= v.min() and v.max() <= 1.0

    def test_batched_matches_serial(self, inv_pipe):
        """Batched 5-pass must equal the serial loop (same per-pass seed)."""
        img = np.random.default_rng(5).uniform(size=(1, 16, 16, 3)).astype(
            np.float32
        )
        a = inverse_render(inv_pipe, img, batch_passes=True,
                           passes=("basecolor", "normal"))
        b = inverse_render(inv_pipe, img, batch_passes=False,
                           passes=("basecolor", "normal"))
        for k in a:
            np.testing.assert_allclose(
                a[k], b[k], atol=2 / 255.0,
                err_msg=f"batched vs serial mismatch for {k}",
            )

    def test_uint8_input_matches_float(self, inv_pipe):
        """uint8 input rides the raw-upload fast path (range map on device,
        pipeline._cond_to_ncdhw) and must match the host-float path."""
        img_u8 = np.random.default_rng(8).integers(
            0, 256, (1, 16, 16, 3), np.uint8
        )
        a = inverse_render(inv_pipe, img_u8, passes=("basecolor", "normal"))
        b = inverse_render(inv_pipe, img_u8.astype(np.float32) / 255.0,
                           passes=("basecolor", "normal"))
        for k in a:
            np.testing.assert_allclose(
                a[k], b[k], atol=1.5 / 255.0,
                err_msg=f"uint8 vs float path mismatch for {k}",
            )

    def test_3d_input_coercion(self, inv_pipe):
        img = np.random.default_rng(6).uniform(size=(16, 16, 3)).astype(np.float32)
        out = inverse_render(inv_pipe, img, passes=("depth",))
        assert out["depth"].shape == (1, 16, 16, 3)


class TestResume:
    """Per-pass durability of the serial multi-pass job (api.inverse_render
    resume_dir): preempted jobs resume from the last completed pass."""

    PASSES = ("basecolor", "normal", "depth")

    def test_fresh_run_saves_and_matches_plain(self, inv_pipe, tmp_path):
        img = np.random.default_rng(10).uniform(size=(1, 16, 16, 3)).astype(
            np.float32
        )
        a = inverse_render(inv_pipe, img, passes=self.PASSES,
                           resume_dir=str(tmp_path))
        assert (tmp_path / "manifest.json").exists()
        for p in self.PASSES:
            assert (tmp_path / f"{p}.npy").exists()
        b = inverse_render(inv_pipe, img, passes=self.PASSES,
                           batch_passes=False)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    def test_resume_computes_only_missing_passes(self, inv_pipe, tmp_path):
        img = np.random.default_rng(11).uniform(size=(1, 16, 16, 3)).astype(
            np.float32
        )
        first = inverse_render(inv_pipe, img, passes=self.PASSES,
                               resume_dir=str(tmp_path))
        # Simulate preemption after the first pass completed.
        (tmp_path / "normal.npy").unlink()
        (tmp_path / "depth.npy").unlink()
        calls = []
        orig = inv_pipe.generate

        def counting_generate(*args, **kw):
            calls.append(1)
            return orig(*args, **kw)

        inv_pipe.generate = counting_generate
        try:
            resumed = inverse_render(inv_pipe, img, passes=self.PASSES,
                                     resume_dir=str(tmp_path))
        finally:
            inv_pipe.generate = orig
        assert len(calls) == 2  # basecolor loaded from disk
        for k in first:
            np.testing.assert_array_equal(first[k], resumed[k])

    def test_fully_complete_job_recomputes_nothing(self, inv_pipe, tmp_path):
        img = np.random.default_rng(12).uniform(size=(1, 16, 16, 3)).astype(
            np.float32
        )
        first = inverse_render(inv_pipe, img, passes=self.PASSES,
                               resume_dir=str(tmp_path))
        orig = inv_pipe.generate
        inv_pipe.generate = lambda *a, **k: pytest.fail(
            "complete job must not dispatch"
        )
        try:
            again = inverse_render(inv_pipe, img, passes=self.PASSES,
                                   resume_dir=str(tmp_path))
        finally:
            inv_pipe.generate = orig
        for k in first:
            np.testing.assert_array_equal(first[k], again[k])

    def test_mismatched_job_refused(self, inv_pipe, tmp_path):
        img = np.random.default_rng(13).uniform(size=(1, 16, 16, 3)).astype(
            np.float32
        )
        inverse_render(inv_pipe, img, passes=self.PASSES, seed=1,
                       resume_dir=str(tmp_path))
        with pytest.raises(ValueError, match="different job"):
            inverse_render(inv_pipe, img, passes=self.PASSES, seed=2,
                           resume_dir=str(tmp_path))
        other = np.random.default_rng(14).uniform(
            size=(1, 16, 16, 3)).astype(np.float32)
        with pytest.raises(ValueError, match="different job"):
            inverse_render(inv_pipe, other, passes=self.PASSES, seed=1,
                           resume_dir=str(tmp_path))


class TestForwardAPI:
    @pytest.mark.parametrize("env_format", ["proj", "proj_direct", "ball"])
    def test_forward_relighting(self, fwd_pipe, env_format):
        rng = np.random.default_rng(7)
        g = lambda: rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
        env = np.abs(rng.standard_normal((8, 16, 3))).astype(np.float32) * 5
        out = forward_render(
            fwd_pipe, g(), g(), g(), g(), g(), env, env_format=env_format
        )
        assert out.shape == (1, 16, 16, 3)
        assert 0.0 <= out.min() and out.max() <= 1.0


class TestModelHelpers:
    def test_encode_decode_scaling(self, inv_pipe):
        """encode = vae.encode * sigma_data; decode inverts the scaling
        (ref: model_diffusion_renderer.py:138-156)."""
        x = jax.random.normal(jax.random.key(11), (1, 1, 16, 16, 3))
        z = inv_pipe.encode(x)
        y = inv_pipe.decode(z)
        assert z.shape == (1, 1, 2, 2, 16)
        assert y.shape == x.shape
        # sigma_data scaling is present: encode/0.5 matches raw vae encode.
        from diffusionrenderer_tpu.models.vae import vae_encode
        raw = vae_encode(inv_pipe.vae_params, x, TINY_VAE)
        np.testing.assert_allclose(np.asarray(z), np.asarray(raw) * 0.5,
                                   rtol=1e-5, atol=1e-6)

    def test_reset_dtype(self, inv_pipe):
        import copy
        pipe = make_pipeline("inverse")
        pipe.reset_dtype(jnp.bfloat16)
        assert pipe.dit_params["blocks"]["mlp"]["w1"].dtype == jnp.bfloat16


class TestOverlappedDecode:
    def test_frame_count_and_prefix_exactness(self, inv_pipe):
        """Overlapped chunked decode: exact frame count; the first chunk's
        frames match the unchunked decode bit-for-bit (causality)."""
        video = jnp.asarray(
            np.random.default_rng(8).uniform(-1, 1, (1, 17, 16, 16, 3)),
            jnp.float32,
        )  # latent T = 3
        batch = {"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)}
        full = inv_pipe.generate(batch, seed=9)
        inv_pipe.decode_chunk_frames = 2
        try:
            chunked = inv_pipe.generate(batch, seed=9)
        finally:
            inv_pipe.decode_chunk_frames = None
        assert chunked.shape == full.shape == (1, 17, 16, 16, 3)
        # First chunk covers latents 0..1 -> pixel frames 0..8 (causality).
        # XLA compiles the two decode shapes into different programs, so the
        # shared prefix can differ by float fusion noise (~1e-5, measured) —
        # allow a 1-count uint8 rounding flip, nothing more.
        diff = np.abs(chunked[:, :9].astype(int) - full[:, :9].astype(int))
        assert diff.max() <= 1, f"prefix not causal: max diff {diff.max()}"
        # Later frames restart the causal state one latent early — an
        # approximation whose seam quality is a trained-weights property
        # (random weights decorrelate on any state change), so only the
        # structural invariants are asserted here.

    def test_multi_chunk_frame_count(self, inv_pipe):
        """Loop covers >2 chunks incl. the tail-break: (T_lat-1)*8+1 frames."""
        video = jnp.asarray(
            np.random.default_rng(3).uniform(-1, 1, (1, 33, 16, 16, 3)),
            jnp.float32,
        )  # latent T = 5
        batch = {"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)}
        inv_pipe.decode_chunk_frames = 2
        try:
            out = inv_pipe.generate(batch, seed=4)
        finally:
            inv_pipe.decode_chunk_frames = None
        assert out.shape == (1, 33, 16, 16, 3)


class TestAllocatorDrainRetry:
    """Fault injection for the axon RESOURCE_EXHAUSTED drain-retry
    (pipeline.generate): transient allocator exhaustion must be retried
    with a drain wait; anything else — or a real platform — must surface
    the error untouched."""

    def _fail_n_times(self, pipe, monkeypatch, n, msg):
        calls = {"n": 0}
        real = pipe._generate_inner

        def flaky(*a, **kw):
            calls["n"] += 1
            if calls["n"] <= n:
                raise RuntimeError(msg)
            return real(*a, **kw)

        monkeypatch.setattr(pipe, "_generate_inner", flaky)
        return calls

    def _batch(self):
        video = jnp.asarray(
            np.random.default_rng(3).uniform(-1, 1, (1, 1, 16, 16, 3)),
            jnp.float32,
        )
        return {"rgb": video, "context_index": jnp.zeros((1,), jnp.int32)}

    def test_transient_exhaustion_retried_on_axon(self, inv_pipe, monkeypatch):
        import diffusionrenderer_tpu.utils.platform as plat

        monkeypatch.setattr(plat, "is_axon", lambda: True)
        monkeypatch.setattr(time, "sleep", lambda s: None)  # no real drain
        calls = self._fail_n_times(
            inv_pipe, monkeypatch, 2, "RESOURCE_EXHAUSTED: out of memory"
        )
        out = inv_pipe.generate(self._batch(), seed=0)
        assert out.shape == (1, 1, 16, 16, 3)
        assert calls["n"] == 3  # two injected failures + one success

    def test_exhaustion_not_retried_off_axon(self, inv_pipe, monkeypatch):
        import diffusionrenderer_tpu.utils.platform as plat

        monkeypatch.setattr(plat, "is_axon", lambda: False)
        calls = self._fail_n_times(
            inv_pipe, monkeypatch, 1, "RESOURCE_EXHAUSTED: out of memory"
        )
        with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
            inv_pipe.generate(self._batch(), seed=0)
        assert calls["n"] == 1  # a real OOM surfaces immediately

    def test_other_errors_never_retried(self, inv_pipe, monkeypatch):
        import diffusionrenderer_tpu.utils.platform as plat

        monkeypatch.setattr(plat, "is_axon", lambda: True)
        calls = self._fail_n_times(inv_pipe, monkeypatch, 1, "INVALID_ARGUMENT")
        with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
            inv_pipe.generate(self._batch(), seed=0)
        assert calls["n"] == 1

    def test_gives_up_after_final_wait(self, inv_pipe, monkeypatch):
        import diffusionrenderer_tpu.utils.platform as plat

        monkeypatch.setattr(plat, "is_axon", lambda: True)
        monkeypatch.setattr(time, "sleep", lambda s: None)
        calls = self._fail_n_times(
            inv_pipe, monkeypatch, 99, "RESOURCE_EXHAUSTED: out of memory"
        )
        with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
            inv_pipe.generate(self._batch(), seed=0)
        assert calls["n"] == 4  # initial try + 3 escalating drain retries
