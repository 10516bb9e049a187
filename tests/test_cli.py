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
