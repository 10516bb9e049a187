"""Envmap pipeline tests: tone mapping / direction fields / samplers against
torch oracles of the reference math (/root/reference/preprocess_envmap.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffusionrenderer_tpu.envmap import (
    clear_environment_cache,
    get_cache_stats,
    hdr_tonemaps,
    latlong_to_cubemap,
    latlong_vec,
    preprocess_panorama,
    render_projection_from_panorama,
    reinhard,
    rgb_to_srgb,
    tonemap_image_direct,
)
from diffusionrenderer_tpu.ops.resample import (
    grid_sample_bilinear,
    resize_bilinear,
    sample_cubemap,
)


def rand(*shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (np.abs(rng.standard_normal(shape)) * scale).astype(np.float32)


class TestToneMapping:
    def test_srgb_matches_oracle(self):
        # ref: preprocess_envmap.py:109-113
        x = np.linspace(0, 1.5, 64, dtype=np.float32).reshape(8, 8)
        xt = torch.tensor(x)
        expected = torch.where(
            xt <= 0.0031308,
            12.92 * xt,
            1.055 * torch.pow(torch.clamp(xt, 1e-8, 1.0), 1 / 2.4) - 0.055,
        ).numpy()
        got = np.asarray(rgb_to_srgb(jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    def test_reinhard(self):
        x = rand(4, 4, scale=20)
        expected = x / (x + 1) * 16.0
        np.testing.assert_allclose(
            np.asarray(reinhard(jnp.asarray(x))), expected, rtol=1e-6
        )

    def test_hdr_tonemaps_match_oracle(self):
        # ref: preprocess_envmap.py:119-140
        x = rand(6, 6, 3, scale=100)
        xt = torch.tensor(x)
        ldr_exp = torch.clamp(xt / (xt + 1) * 16.0, 0, 1)
        ldr_exp = torch.where(
            ldr_exp <= 0.0031308,
            12.92 * ldr_exp,
            1.055 * torch.pow(torch.clamp(ldr_exp, 1e-8, 1.0), 1 / 2.4) - 0.055,
        )
        log_exp = torch.log1p(xt) / np.log1p(10000.0)
        log_exp = torch.where(
            log_exp <= 0.0031308,
            12.92 * log_exp,
            1.055 * torch.pow(torch.clamp(log_exp, 1e-8, 1.0), 1 / 2.4) - 0.055,
        ).clamp(0, 1)
        maps = hdr_tonemaps(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(maps["env_ldr"]), ldr_exp.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(maps["env_log"]), log_exp.numpy(),
                                   rtol=1e-4, atol=1e-5)


class TestLatlongVec:
    def test_matches_oracle(self):
        # ref: preprocess_envmap.py:320-338
        h, w = 8, 16
        gy, gx = torch.meshgrid(
            torch.linspace(1 / h, 1 - 1 / h, h),
            torch.linspace(-1 + 1 / w, 1 - 1 / w, w),
            indexing="ij",
        )
        st, ct = torch.sin(gy * np.pi), torch.cos(gy * np.pi)
        sp, cp = torch.sin(gx * np.pi), torch.cos(gx * np.pi)
        expected = torch.stack((st * sp, ct, -st * cp), dim=-1).numpy()
        got = np.asarray(latlong_vec(h, w))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    def test_unit_norm(self):
        v = np.asarray(latlong_vec(16, 32))
        np.testing.assert_allclose(
            np.linalg.norm(v, axis=-1), 1.0, rtol=1e-5
        )


class TestGridSample:
    def test_matches_torch_grid_sample(self):
        img = rand(9, 13, 3, seed=1)
        grid = (np.random.default_rng(2).uniform(-1.2, 1.2, (5, 7, 2))
                .astype(np.float32))
        expected = torch.nn.functional.grid_sample(
            torch.tensor(img).permute(2, 0, 1)[None],
            torch.tensor(grid)[None],
            mode="bilinear", padding_mode="border", align_corners=False,
        )[0].permute(1, 2, 0).numpy()
        got = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_resize_matches_torch_interpolate(self):
        img = rand(10, 14, 3, seed=3)
        expected = torch.nn.functional.interpolate(
            torch.tensor(img).permute(2, 0, 1)[None],
            size=(5, 21), mode="bilinear", align_corners=False,
        )[0].permute(1, 2, 0).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(img), 5, 21))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestCubemap:
    def test_constant_panorama_constant_cubemap(self):
        pano = np.full((16, 32, 3), 3.25, np.float32)
        cube = np.asarray(latlong_to_cubemap(jnp.asarray(pano), 8))
        assert cube.shape == (6, 8, 8, 3)
        np.testing.assert_allclose(cube, 3.25, rtol=1e-5)

    def test_fetch_roundtrip_recovers_panorama(self):
        """cubemap(pano) sampled along latlong dirs ~= pano (away from poles)."""
        rng = np.random.default_rng(4)
        # Smooth panorama: low-frequency so resampling error is small.
        h, w = 32, 64
        yy = np.linspace(0, np.pi, h)[:, None]
        xx = np.linspace(0, 2 * np.pi, w)[None, :]
        pano = np.stack(
            [np.sin(yy + 0 * xx) + 1.5, np.cos(xx) * np.sin(yy) + 1.5,
             0.5 * np.sin(2 * xx) * np.sin(yy) + 1.5], axis=-1
        ).astype(np.float32)
        cube = latlong_to_cubemap(jnp.asarray(pano), 64)
        dirs = latlong_vec(h, w)
        fetched = np.asarray(sample_cubemap(cube, dirs))
        # Compare the midband (poles are singular in equirect).
        mid = slice(h // 4, 3 * h // 4)
        np.testing.assert_allclose(
            fetched[mid], pano[mid], rtol=0.05, atol=0.05
        )

    def test_seam_exact_parity_with_fold_oracle(self):
        """Edge-ring taps filter ACROSS faces exactly (VERDICT r2 item 6).

        Oracle: independent geometric fold — an out-of-face integer tap's
        plane point is rotated about the shared cube edge onto the adjacent
        face, whose nearest texel it must fetch (this is what nvdiffrast's
        boundary_mode='cube' seamless filtering does, ref:
        preprocess_envmap.py:446-447).  Directions are built so fy=0 and
        fx=0.25, making the expected two-texel blend exact in float32 —
        equality is asserted exactly, not within tolerance."""
        from diffusionrenderer_tpu.ops.resample import (
            _cube_face_dir,
            sample_cubemap,
        )

        r = 8
        # Identifying texel values: cubemap[f, y, x] = f*10000 + y*100 + x.
        cube = np.zeros((6, r, r, 1), np.float32)
        f_idx, y_idx, x_idx = np.meshgrid(
            np.arange(6), np.arange(r), np.arange(r), indexing="ij")
        cube[..., 0] = f_idx * 10000 + y_idx * 100 + x_idx

        naxis = {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2}
        nsign = [1, -1, 1, -1, 1, -1]
        face_of = {(0, 1): 0, (0, -1): 1, (1, 1): 2, (1, -1): 3,
                   (2, 1): 4, (2, -1): 5}

        def extract_uv(f, p):
            x, y, z = p
            m = abs(p[naxis[f]])
            return {
                0: (-z / m, -y / m), 1: (z / m, -y / m),
                2: (x / m, z / m), 3: (x / m, -z / m),
                4: (x / m, -y / m), 5: (-x / m, -y / m),
            }[f]

        def fold_tap(f, xi, yi):
            """Out-of-range integer tap on face f -> (face, y, x) texel."""
            in_x, in_y = 0 <= xi <= r - 1, 0 <= yi <= r - 1
            if in_x and in_y:
                return f, yi, xi
            assert in_x or in_y, "corner taps handled separately"
            u = (xi + 0.5) * 2.0 / r - 1.0
            v = (yi + 0.5) * 2.0 / r - 1.0
            p = np.array(_cube_face_dir(f, u, v), np.float64)
            ax = int(np.argmax(np.abs(p)))  # the coordinate that exceeded 1
            assert ax != naxis[f]
            e = abs(p[ax]) - 1.0
            q = p.copy()
            q[ax] = np.sign(p[ax])
            q[naxis[f]] = nsign[f] * (1.0 - e)  # rotate about the edge
            g = face_of[(ax, int(np.sign(p[ax])))]
            u2, v2 = extract_uv(g, q)
            x2 = int(round((u2 + 1.0) * r / 2.0 - 0.5))
            y2 = int(round((v2 + 1.0) * r / 2.0 - 0.5))
            return g, y2, x2

        def texel(f, y, x):
            return float(cube[f, y, x, 0])

        # One direction per (face, edge, along-edge j): fx = 0.25 exactly,
        # fy = 0 (v at a texel center) -> out = 0.75*own + 0.25*neighbor.
        for f in range(6):
            for j in [0, 2, r - 1]:
                v = (j + 0.5) * 2.0 / r - 1.0
                for gx, x0 in ((r - 0.75, r - 1), (-0.25, -1)):
                    u = (gx + 0.5) * 2.0 / r - 1.0
                    d = np.array(_cube_face_dir(f, u, v), np.float32)
                    got = float(np.asarray(
                        sample_cubemap(jnp.asarray(cube), jnp.asarray(d))
                    )[0])
                    t0 = texel(*fold_tap(f, x0, j))
                    t1 = texel(*fold_tap(f, x0 + 1, j))
                    if x0 == -1:
                        # gx=-0.25: fx = gx - floor(gx) = 0.75 -> the out
                        # tap at -1 gets 0.25, the in tap at 0 gets 0.75.
                        expected = 0.25 * t0 + 0.75 * t1
                    else:  # taps: in at r-1 (w=0.75), out at r (w=0.25)
                        expected = 0.75 * t0 + 0.25 * t1
                    assert got == np.float32(expected), (
                        f, j, gx, got, expected)

        # Vertical edges too (fy = 0.25, fx = 0).
        for f in range(6):
            j = 1
            u = (j + 0.5) * 2.0 / r - 1.0
            gy = r - 0.75
            v = (gy + 0.5) * 2.0 / r - 1.0
            d = np.array(_cube_face_dir(f, u, v), np.float32)
            got = float(np.asarray(
                sample_cubemap(jnp.asarray(cube), jnp.asarray(d)))[0])
            t0 = texel(*fold_tap(f, j, r - 1))
            t1 = texel(*fold_tap(f, j, r))
            assert got == np.float32(0.75 * t0 + 0.25 * t1), (f, got)

        # Corner: taps beyond the cube corner average the 3 meeting texels.
        f = 4
        gx = gy = r - 0.75
        u = v = (gx + 0.5) * 2.0 / r - 1.0
        d = np.array(_cube_face_dir(f, u, v), np.float32)
        got = float(np.asarray(
            sample_cubemap(jnp.asarray(cube), jnp.asarray(d)))[0])
        own = texel(f, r - 1, r - 1)
        via_x = texel(*fold_tap(f, r, r - 1))
        via_y = texel(*fold_tap(f, r - 1, r))
        avg3 = (own + via_x + via_y) / 3.0
        expected = (0.5625 * own + 0.1875 * via_x + 0.1875 * via_y
                    + 0.0625 * avg3)
        np.testing.assert_allclose(got, expected, rtol=1e-6)

        # seam=False is the legacy clamp fast path.
        d_in = np.array(_cube_face_dir(0, 0.0, 0.0), np.float32)
        a = np.asarray(sample_cubemap(jnp.asarray(cube), jnp.asarray(d_in),
                                      seam=False))
        b = np.asarray(sample_cubemap(jnp.asarray(cube), jnp.asarray(d_in)))
        np.testing.assert_array_equal(a, b)

    def test_direct_and_cubemap_modes_agree(self):
        clear_environment_cache()
        rng = np.random.default_rng(5)
        h, w = 16, 32
        yy = np.linspace(0, np.pi, h)[:, None] * np.ones((1, w))
        pano = np.stack([np.sin(yy) + 1.0] * 3, axis=-1).astype(np.float32)
        a = render_projection_from_panorama(pano, (h, w), use_cache=False,
                                            mode="cubemap")
        b = render_projection_from_panorama(pano, (h, w), use_cache=False,
                                            mode="direct")
        np.testing.assert_allclose(
            np.asarray(a["env_ldr"]), np.asarray(b["env_ldr"]),
            rtol=0.1, atol=0.05,
        )


class TestPreprocess:
    def test_nan_and_clamp(self):
        x = np.array([[[np.nan, np.inf, -5.0]]], np.float32)
        out = np.asarray(preprocess_panorama(jnp.asarray(x)))
        np.testing.assert_allclose(out, [[[0.0, 65504.0, 0.0]]])

    def test_rotation_roll(self):
        x = np.arange(8, dtype=np.float32).reshape(1, 8, 1) * np.ones((2, 1, 3))
        out = np.asarray(preprocess_panorama(jnp.asarray(x), rotation_deg=180.0))
        expected = np.roll(x, 4, axis=1)
        np.testing.assert_allclose(out, expected)

    def test_flip(self):
        x = rand(4, 6, 3, seed=6)
        out = np.asarray(preprocess_panorama(jnp.asarray(x), flip=True))
        np.testing.assert_allclose(out, x[:, ::-1])


class TestCacheAndShapes:
    def test_cache_hit(self):
        clear_environment_cache()
        pano = rand(8, 16, 3, seed=7)
        r1 = render_projection_from_panorama(pano, (8, 16), num_frames=3)
        stats = get_cache_stats()
        assert stats["cache_size"] == 1
        r2 = render_projection_from_panorama(pano, (8, 16), num_frames=3)
        assert r1 is r2  # same cached dict object

    def test_num_frames_expansion(self):
        out = render_projection_from_panorama(
            rand(8, 16, 3, seed=8), (8, 16), num_frames=5, use_cache=False
        )
        assert out["env_ldr"].shape == (5, 8, 16, 3)
        assert out["env_log"].shape == (5, 8, 16, 3)

    def test_ball_mode_resizes(self):
        out = tonemap_image_direct(
            rand(12, 12, 3, seed=9, scale=10), (8, 8), num_frames=2,
            use_cache=False,
        )
        assert out["env_ldr"].shape == (2, 8, 8, 3)
        assert float(jnp.max(out["env_ldr"])) <= 1.0
