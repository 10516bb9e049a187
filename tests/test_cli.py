"""CLI smoke tests (tiny architecture, CPU, in-process via main(argv))."""

import os

import numpy as np
import pytest

from diffusionrenderer_tpu.cli import main
from diffusionrenderer_tpu.native import rgbe


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    import imageio.v3 as iio

    rng = np.random.default_rng(0)
    paths = {}
    for name in ("rgb", "depth", "normal", "rough", "metal", "base"):
        p = str(d / f"{name}.png")
        iio.imwrite(p, (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8))
        paths[name] = p
    paths["hdr"] = str(d / "sky.hdr")
    rgbe.save_hdr(paths["hdr"],
                  np.abs(rng.standard_normal((8, 16, 3))).astype(np.float32) * 4)
    paths["dir"] = str(d)
    return paths


class TestCLI:
    def test_info(self, capsys):
        main(["info"])
        out = capsys.readouterr().out
        assert '"presets"' in out and "inverse_704x1280_video" in out

    def test_inverse_tiny(self, fixtures, tmp_path):
        out_dir = str(tmp_path / "inv")
        main([
            "inverse", "--tiny", "--steps", "1", "--passes", "depth",
            "--input", fixtures["rgb"], "--output-dir", out_dir,
        ])
        assert os.path.exists(os.path.join(out_dir, "depth.png"))

    def test_envmap(self, fixtures, tmp_path):
        prefix = str(tmp_path / "env")
        main([
            "envmap", "--input", fixtures["hdr"], "--height", "16",
            "--width", "16", "--output-prefix", prefix,
        ])
        assert os.path.exists(prefix + "_env_ldr.png")
        assert os.path.exists(prefix + "_env_log.png")

    def test_forward_tiny(self, fixtures, tmp_path):
        out = str(tmp_path / "relit.png")
        main([
            "forward", "--tiny", "--steps", "1",
            "--depth", fixtures["depth"], "--normal", fixtures["normal"],
            "--roughness", fixtures["rough"], "--metallic", fixtures["metal"],
            "--basecolor", fixtures["base"], "--env", fixtures["hdr"],
            "--output", out,
        ])
        assert os.path.exists(out)

    def test_convert_to_native_and_load(self, tmp_path):
        """convert: torch-format DiT -> quantized native orbax dir; the
        native dir then loads through the normal --checkpoint path (no
        torch parse / re-quantization at boot)."""
        import jax
        import jax.numpy as jnp
        from safetensors.numpy import save_file

        from diffusionrenderer_tpu.checkpoint import (
            convert_dit_state_dict, export_dit_state_dict,
            load_dit_checkpoint,
        )
        from diffusionrenderer_tpu.cli import _tiny_configs
        from diffusionrenderer_tpu.models.dit import init_dit_params

        cfg, _ = _tiny_configs("inverse")
        params = init_dit_params(jax.random.key(0), cfg, dtype=jnp.float32)
        flat = export_dit_state_dict(params, cfg)
        st = str(tmp_path / "tiny_dit.safetensors")
        save_file(flat, st)

        out_dir = str(tmp_path / "native")
        main(["convert", "--tiny", "--dit", st, "--w8a8", "--out", out_dir])

        native = load_dit_checkpoint(
            os.path.join(out_dir, "dit"), cfg, jnp.float32
        )
        expected = convert_dit_state_dict(
            flat, cfg, jnp.float32, quantize_int8=True, act_quant=True
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            native, expected,
        )

        # The native dir drives the pipeline end to end via --checkpoint.
        inv_dir = str(tmp_path / "inv")
        import imageio.v3 as iio

        rng = np.random.default_rng(1)
        in_png = str(tmp_path / "in.png")
        iio.imwrite(in_png,
                    (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8))
        main([
            "inverse", "--tiny", "--steps", "1", "--passes", "depth",
            "--checkpoint", os.path.join(out_dir, "dit"),
            "--input", in_png, "--output-dir", inv_dir,
        ])
        assert os.path.exists(os.path.join(inv_dir, "depth.png"))

        # The convert sidecar makes a model-type mismatch fail fast at
        # load time, not as a shape error at trace time.
        from diffusionrenderer_tpu.api import load_pipeline

        with pytest.raises(ValueError, match="model_type"):
            load_pipeline(dit_checkpoint=os.path.join(out_dir, "dit"),
                          model_type="forward")

    def test_convert_vae_to_native_and_load(self, tmp_path):
        """convert --vae: diffusers-format safetensors -> native orbax dir,
        restored tree equals the direct conversion."""
        import jax
        import jax.numpy as jnp
        import torch
        from safetensors.numpy import save_file
        from torch_vae_oracle import oracle_from_vae_config

        from diffusionrenderer_tpu.checkpoint_vae import (
            convert_diffusers_vae_state_dict, load_vae_checkpoint,
        )
        from diffusionrenderer_tpu.cli import _tiny_configs

        _, vcfg = _tiny_configs("inverse")
        torch.manual_seed(0)
        oracle = oracle_from_vae_config(vcfg)
        sd = {k: np.ascontiguousarray(v.detach().numpy())
              for k, v in oracle.state_dict().items()}
        st = str(tmp_path / "tiny_vae.safetensors")
        save_file(sd, st)

        out_dir = str(tmp_path / "native")
        main(["convert", "--tiny", "--vae", st, "--out", out_dir])

        native = load_vae_checkpoint(
            os.path.join(out_dir, "vae"), vcfg, jnp.float32
        )
        expected = convert_diffusers_vae_state_dict(sd, vcfg, jnp.float32)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            native, expected,
        )
