"""Native C++ HDR codec: RGBE round-trips, cross-checks vs imageio, PFM."""

import os
import struct
import tempfile

import numpy as np
import pytest

from diffusionrenderer_tpu.native import rgbe
from diffusionrenderer_tpu.io import load_hdr_file, load_hdr_image


@pytest.fixture(scope="module")
def hdr_img():
    rng = np.random.default_rng(0)
    # HDR-range content incl. tiny and huge values.
    img = np.abs(rng.standard_normal((16, 32, 3))).astype(np.float32)
    img[0, 0] = [0, 0, 0]
    img[1, 1] = [1000.0, 0.5, 1e-4]
    return img


class TestRGBE:
    def test_roundtrip(self, hdr_img, tmp_path):
        path = str(tmp_path / "test.hdr")
        rgbe.save_hdr(path, hdr_img)
        loaded = rgbe.load(path)
        assert loaded.shape == hdr_img.shape
        # RGBE shares one exponent per pixel: error bound is relative to the
        # pixel's max component (~1/256), not per-component.
        bound = hdr_img.max(axis=-1, keepdims=True) / 128.0 + 1e-6
        assert np.all(np.abs(loaded - hdr_img) <= bound)

    def test_crosscheck_imageio(self, hdr_img, tmp_path):
        imageio = pytest.importorskip("imageio.v3")
        path = str(tmp_path / "cross.hdr")
        rgbe.save_hdr(path, hdr_img)
        try:
            theirs = np.asarray(imageio.imread(path))
        except Exception:
            pytest.skip("imageio lacks an HDR reader in this env")
        if theirs.dtype != np.float32:
            # This env's imageio lacks a float HDR reader (returns
            # tone-mapped uint8) — exactly why the native decoder exists.
            pytest.skip("imageio has no float HDR reader here")
        ours = rgbe.load(path)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)

    def test_reads_rle_files_from_imageio(self, hdr_img, tmp_path):
        """imageio/FreeImage writes RLE scanlines; our decoder must read them."""
        imageio = pytest.importorskip("imageio.v3")
        path = str(tmp_path / "rle.hdr")
        try:
            imageio.imwrite(path, hdr_img.astype(np.float32), extension=".hdr")
        except Exception:
            pytest.skip("imageio lacks an HDR writer in this env")
        ours = rgbe.load(path)
        bound = hdr_img.max(axis=-1, keepdims=True) / 128.0 + 1e-6
        assert np.all(np.abs(ours - hdr_img) <= bound)

    def test_io_module_uses_native(self, hdr_img, tmp_path):
        path = str(tmp_path / "io.hdr")
        rgbe.save_hdr(path, hdr_img)
        loaded = load_hdr_file(path)
        assert loaded.dtype == np.float32
        bound = hdr_img.max(axis=-1, keepdims=True) / 128.0 + 1e-6
        assert np.all(np.abs(loaded - hdr_img) <= bound)

    def test_load_hdr_image_api_shape(self, hdr_img, tmp_path):
        # LoadHDRImage node equivalent returns (1, H, W, 3)
        # (ref: nodes.py:312-332).
        path = str(tmp_path / "api.hdr")
        rgbe.save_hdr(path, hdr_img)
        out = load_hdr_image(path)
        assert out.shape == (1, 16, 32, 3)
        assert out.max() > 1.0  # HDR values preserved


class TestPFM:
    def _write_pfm(self, path, img, little_endian=True):
        h, w, c = img.shape
        tag = b"PF" if c == 3 else b"Pf"
        scale = -1.0 if little_endian else 1.0
        data = img[::-1].astype("<f4" if little_endian else ">f4")
        with open(path, "wb") as f:
            f.write(tag + b"\n")
            f.write(f"{w} {h}\n{scale}\n".encode())
            f.write(data.tobytes())

    def test_pfm_roundtrip_little_endian(self, hdr_img, tmp_path):
        path = str(tmp_path / "t.pfm")
        self._write_pfm(path, hdr_img, little_endian=True)
        loaded = rgbe.load(path)
        np.testing.assert_allclose(loaded, hdr_img, rtol=1e-6)

    def test_pfm_big_endian(self, hdr_img, tmp_path):
        path = str(tmp_path / "be.pfm")
        self._write_pfm(path, hdr_img, little_endian=False)
        loaded = rgbe.load(path)
        np.testing.assert_allclose(loaded, hdr_img, rtol=1e-6)

    def test_pfm_grayscale(self, tmp_path):
        img = np.abs(np.random.default_rng(1).standard_normal(
            (8, 8, 1))).astype(np.float32)
        path = str(tmp_path / "gray.pfm")
        self._write_pfm(path, img, little_endian=True)
        loaded = rgbe.load(path)
        assert loaded.shape == (8, 8, 3)
        np.testing.assert_allclose(loaded[..., 0], img[..., 0], rtol=1e-6)


class TestBatchLoad:
    def test_threaded_batch(self, hdr_img, tmp_path):
        paths = []
        for i in range(6):
            p = str(tmp_path / f"b{i}.hdr")
            rgbe.save_hdr(p, hdr_img * (i + 1))
            paths.append(p)
        outs = rgbe.load_batch(paths, num_threads=3)
        assert len(outs) == 6
        for i, out in enumerate(outs):
            bound = (hdr_img * (i + 1)).max(-1, keepdims=True) / 128.0 + 1e-6
            assert np.all(np.abs(out - hdr_img * (i + 1)) <= bound)

    def test_batch_failure_reported(self, tmp_path):
        with pytest.raises(ValueError, match="failures"):
            rgbe.load_batch([str(tmp_path / "missing.hdr")])

    def test_empty_batch(self):
        assert rgbe.load_batch([]) == []


def _write_minimal_exr_none_float(path, img):
    """Independent oracle: hand-built single-part scanline EXR, compression
    NONE, FLOAT channels R/G/B — written with struct only, no codec shared
    with the reader under test."""
    import struct

    h, w, _ = img.shape

    def attr(name, typ, payload):
        return name.encode() + b"\0" + typ.encode() + b"\0" + struct.pack(
            "<i", len(payload)) + payload

    chl = b""
    for name in ("B", "G", "R"):  # alphabetical, FLOAT(2)
        chl += name.encode() + b"\0" + struct.pack("<iBBBBii", 2, 0, 0, 0, 0,
                                                   1, 1)
    chl += b"\0"
    hdr = struct.pack("<ii", 20000630, 2)
    hdr += attr("channels", "chlist", chl)
    hdr += attr("compression", "compression", b"\0")  # NONE
    hdr += attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    hdr += attr("displayWindow", "box2i",
                struct.pack("<iiii", 0, 0, w - 1, h - 1))
    hdr += attr("lineOrder", "lineOrder", b"\0")
    hdr += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    hdr += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    hdr += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    hdr += b"\0"

    line_bytes = w * 3 * 4
    chunks = []
    offset = len(hdr) + 8 * h  # offset table: one block per scanline
    offsets = []
    for y in range(h):
        row = b""
        for ci, comp in ((0, 2), (1, 1), (2, 0)):  # B, G, R file order
            row += np.ascontiguousarray(img[y, :, comp], "<f4").tobytes()
        chunk = struct.pack("<ii", y, line_bytes) + row
        offsets.append(offset)
        offset += len(chunk)
        chunks.append(chunk)
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(struct.pack(f"<{h}q", *offsets))
        for c in chunks:
            f.write(c)


class TestEXR:
    def test_zip_half_roundtrip(self, tmp_path):
        rng = np.random.default_rng(7)
        img = (rng.uniform(0, 1, (37, 53, 3)).astype(np.float32) ** 2) * 50.0
        img[0, 0] = [0.0, 1e-6, 30000.0]
        p = str(tmp_path / "rt.exr")
        rgbe.save_exr(p, img)
        back = rgbe.load(p)
        assert back.shape == img.shape
        rel = np.abs(back - img) / np.maximum(np.abs(img), 1e-4)
        assert rel.max() < 2e-3  # half-precision mantissa

    def test_reads_independent_none_float_file(self, tmp_path):
        rng = np.random.default_rng(8)
        img = rng.uniform(-2, 100, (5, 9, 3)).astype(np.float32)
        p = str(tmp_path / "oracle.exr")
        _write_minimal_exr_none_float(p, img)
        back = rgbe.load(p)
        np.testing.assert_array_equal(back, img)  # FLOAT+NONE: bit exact

    def test_io_module_dispatches_exr(self, tmp_path):
        from diffusionrenderer_tpu import io as drio

        img = np.full((4, 6, 3), 2.5, np.float32)
        p = str(tmp_path / "d.exr")
        rgbe.save_exr(p, img)
        out = drio.load_hdr_file(p)
        assert out.shape == (4, 6, 3)
        assert np.allclose(out, 2.5, rtol=1e-3)

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.exr")
        with open(p, "wb") as f:
            f.write(b"not an exr file at all")
        with pytest.raises(ValueError, match="exr_read failed"):
            rgbe.load(p)
