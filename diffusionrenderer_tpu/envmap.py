"""Environment-map preprocessing for the forward (relighting) renderer.

Pure-JAX replacement for the reference's nvdiffrast/CUDA pipeline
(/root/reference/preprocess_envmap.py) — no rasterizer required:

* HDR loading stays host-side I/O (imageio / OpenCV / our native RGBE
  decoder in native/), matching the reference's loader chain
  (ref: preprocess_envmap.py:208-245);
* preprocessing: brightness multiply, NaN/Inf cleanup clamped to the fp16-max
  65504, optional horizontal flip, rotation as a pixel roll
  (ref: preprocess_envmap.py:263-286);
* panorama -> 6x512x512 cubemap via bilinear equirect sampling
  (ref: preprocess_envmap.py:161-206);
* cubemap fetched along the lat-long direction field — the nvdiffrast
  dr.texture(boundary_mode='cube') call (ref: preprocess_envmap.py:439-448)
  replaced by ops.resample.sample_cubemap; a `direct` mode skips the cubemap
  round-trip and resamples the panorama directly along the same directions
  (fewer resampling stages => sharper, and cheaper);
* Reinhard + sRGB tone mapping -> env_ldr; log1p/log1p(1e4) + sRGB ->
  env_log (ref: preprocess_envmap.py:109-140);
* lat-long direction field itself -> env_nrm (ref: preprocess_envmap.py:320-338);
* content-hash LRU cache of processed results (ref: preprocess_envmap.py:23-80).

The whole tensor path (preprocess -> cubemap -> fetch -> tonemaps) is one
jittable function of the panorama; per-resolution compiled variants are
cached by jit.
"""

from __future__ import annotations

import functools
import hashlib
from typing import Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .ops.resample import (
    grid_sample_bilinear,
    resize_bilinear,
    sample_cubemap,
)
from .utils.cache import LRUCache

FP16_MAX = 65504.0

# ---------------------------------------------------------------------------
# Tone mapping (ref: preprocess_envmap.py:109-140)
# ---------------------------------------------------------------------------


def rgb_to_srgb(rgb: jax.Array) -> jax.Array:
    """Official sRGB OETF (ref: preprocess_envmap.py:109-113)."""
    return jnp.where(
        rgb <= 0.0031308,
        12.92 * rgb,
        1.055 * jnp.power(jnp.clip(rgb, 1e-8, 1.0), 1.0 / 2.4) - 0.055,
    )


def reinhard(x: jax.Array, max_point: float = 16.0) -> jax.Array:
    """(ref: preprocess_envmap.py:115-117)"""
    return x / (x + 1.0) * max_point


def hdr_tonemaps(env_hdr: jax.Array, log_scale: float = 10000.0) -> Dict[str, jax.Array]:
    """env_hdr (..., 3) -> {'env_ldr', 'env_log'} in [0, 1]
    (ref: preprocess_envmap.py:119-140)."""
    env_ldr = rgb_to_srgb(jnp.clip(reinhard(env_hdr, 16.0), 0.0, 1.0))
    env_log = jnp.clip(
        rgb_to_srgb(jnp.log1p(env_hdr) / np.log1p(log_scale)), 0.0, 1.0
    )
    return {"env_ldr": env_ldr, "env_log": env_log}


# ---------------------------------------------------------------------------
# Direction fields and cubemap construction
# ---------------------------------------------------------------------------


def latlong_vec(height: int, width: int) -> jax.Array:
    """(H, W, 3) lat-long direction field (ref: preprocess_envmap.py:320-338).

    gy in (1/H, 1-1/H), gx in (-1+1/W, 1-1/W);
    dir = (sin(gy*pi)*sin(gx*pi), cos(gy*pi), -sin(gy*pi)*cos(gx*pi)).
    """
    gy = jnp.linspace(1.0 / height, 1.0 - 1.0 / height, height)
    gx = jnp.linspace(-1.0 + 1.0 / width, 1.0 - 1.0 / width, width)
    gy, gx = jnp.meshgrid(gy, gx, indexing="ij")
    sin_t, cos_t = jnp.sin(gy * jnp.pi), jnp.cos(gy * jnp.pi)
    sin_p, cos_p = jnp.sin(gx * jnp.pi), jnp.cos(gx * jnp.pi)
    return jnp.stack([sin_t * sin_p, cos_t, -sin_t * cos_p], axis=-1)


def _cube_face_dirs(face: int, res: int) -> jax.Array:
    """Directions for one cube face's texel grid
    (ref: preprocess_envmap.py:142-155,176-185)."""
    g = jnp.linspace(-1.0 + 1.0 / res, 1.0 - 1.0 / res, res)
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    one = jnp.ones_like(gx)
    table = {
        0: (one, -gy, -gx),
        1: (-one, -gy, gx),
        2: (gx, one, gy),
        3: (gx, -one, -gy),
        4: (gx, -gy, one),
        5: (-gx, -gy, -one),
    }
    v = jnp.stack(table[face], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _dirs_to_equirect_grid(v: jax.Array) -> jax.Array:
    """Directions -> grid-sample coords in [-1,1]^2 for an equirect map
    (ref: preprocess_envmap.py:186-194)."""
    tu = jnp.arctan2(v[..., 0], -v[..., 2]) / (2 * jnp.pi) + 0.5
    tv = jnp.arccos(jnp.clip(v[..., 1], -1.0, 1.0)) / jnp.pi
    return jnp.stack([tu, tv], axis=-1) * 2.0 - 1.0


@functools.partial(jax.jit, static_argnames=("res",))
def latlong_to_cubemap(latlong: jax.Array, res: int = 512) -> jax.Array:
    """(H, W, 3) panorama -> (6, res, res, 3) cubemap via bilinear equirect
    fetch (ref: preprocess_envmap.py:161-206)."""
    faces = []
    for s in range(6):
        grid = _dirs_to_equirect_grid(_cube_face_dirs(s, res))
        faces.append(grid_sample_bilinear(latlong, grid))
    return jnp.stack(faces, axis=0)


# ---------------------------------------------------------------------------
# Preprocessing
# ---------------------------------------------------------------------------


def preprocess_panorama(
    latlong: jax.Array,
    brightness: float = 1.0,
    flip: bool = False,
    rotation_deg: float = 0.0,
) -> jax.Array:
    """Brightness/NaN-clamp/flip/roll (ref: preprocess_envmap.py:263-286)."""
    x = latlong.astype(jnp.float32)
    if brightness != 1.0:
        x = x * brightness
    x = jnp.nan_to_num(x, nan=0.0, posinf=FP16_MAX, neginf=0.0)
    x = jnp.clip(x, 0.0, FP16_MAX)
    if flip:
        x = x[:, ::-1]
    if rotation_deg:
        shift = int(x.shape[1] * rotation_deg / 360.0)
        x = jnp.roll(x, shift, axis=1)
    return x


# ---------------------------------------------------------------------------
# Full projection pipelines
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "brightness", "flip", "rotation_deg",
                     "mode", "cubemap_res"),
)
def _project_panorama_jit(
    latlong: jax.Array,
    height: int,
    width: int,
    brightness: float,
    flip: bool,
    rotation_deg: float,
    mode: str,
    cubemap_res: int,
) -> Tuple[jax.Array, jax.Array]:
    pano = preprocess_panorama(latlong, brightness, flip, rotation_deg)
    vec = latlong_vec(height, width)
    if mode == "cubemap":
        cube = latlong_to_cubemap(pano, cubemap_res)
        env = sample_cubemap(cube, -vec)
    else:  # 'direct': one resampling stage instead of two.
        env = grid_sample_bilinear(pano, _dirs_to_equirect_grid(-vec))
    env = env[::-1, ::-1]  # flip dims [0, 1] (ref: preprocess_envmap.py:448)
    maps = hdr_tonemaps(env, 10000.0)
    return maps["env_ldr"], maps["env_log"]


_env_cache = LRUCache(max_size=10)


def _content_hash(arr: np.ndarray) -> str:
    """Hash ~1000 regularly spaced elements (ref: preprocess_envmap.py:68-80)."""
    flat = np.asarray(arr).reshape(-1)
    if flat.size > 1000:
        idx = np.linspace(0, flat.size - 1, 1000).astype(np.int64)
        flat = flat[idx]
    return hashlib.md5(flat.astype(np.float32).tobytes()).hexdigest()


def render_projection_from_panorama(
    env_input: Union[np.ndarray, jax.Array, str],
    resolution: Tuple[int, int],
    env_brightness: float = 1.0,
    env_flip: bool = True,
    env_rot: float = 180.0,
    num_frames: int = 1,
    use_cache: bool = True,
    mode: str = "cubemap",
    cubemap_res: int = 512,
) -> Dict[str, jax.Array]:
    """Panorama -> {'env_ldr', 'env_log'} of shape (num_frames, H, W, 3).

    'proj' node path (ref: preprocess_envmap.py:408-467 and nodes.py:286-289).
    mode='cubemap' reproduces the reference's panorama->cubemap->fetch chain;
    mode='direct' resamples the panorama once along the same directions.
    """
    h, w = resolution
    latlong = _load_env_input(env_input)

    key = None
    if use_cache:
        key = (
            _content_hash(latlong),
            resolution,
            f"proj-{mode}",
            env_brightness,
            env_flip,
            env_rot,
        )
        hit = _env_cache.get(key)
        if hit is not None:
            return hit

    ldr, log = _project_panorama_jit(
        jnp.asarray(latlong, jnp.float32),
        h, w, float(env_brightness), bool(env_flip), float(env_rot),
        mode, cubemap_res,
    )
    result = {
        "env_ldr": jnp.broadcast_to(ldr[None], (num_frames, h, w, 3)),
        "env_log": jnp.broadcast_to(log[None], (num_frames, h, w, 3)),
    }
    if use_cache:
        _env_cache.put(key, result)
    return result


@functools.partial(jax.jit, static_argnames=("height", "width"))
def _tonemap_direct_jit(env: jax.Array, height: int, width: int):
    env = env.astype(jnp.float32)
    if env.shape[:2] != (height, width):
        env = resize_bilinear(env, height, width)
    maps = hdr_tonemaps(env, 10000.0)
    return maps["env_ldr"], maps["env_log"]


def tonemap_image_direct(
    env_input: Union[np.ndarray, jax.Array, str],
    resolution: Tuple[int, int],
    num_frames: int = 1,
    use_cache: bool = True,
) -> Dict[str, jax.Array]:
    """Pre-rendered (chrome ball) HDR -> tonemaps only, 'ball' node path
    (ref: preprocess_envmap.py:469-526)."""
    h, w = resolution
    env = _load_env_input(env_input)

    key = None
    if use_cache:
        key = (_content_hash(env), resolution, "ball", 1.0, False, 0.0)
        hit = _env_cache.get(key)
        if hit is not None:
            return hit

    ldr, log = _tonemap_direct_jit(jnp.asarray(env, jnp.float32), h, w)
    result = {
        "env_ldr": jnp.broadcast_to(ldr[None], (num_frames, h, w, 3)),
        "env_log": jnp.broadcast_to(log[None], (num_frames, h, w, 3)),
    }
    if use_cache:
        _env_cache.put(key, result)
    return result


def _load_env_input(env_input) -> np.ndarray:
    """Accept a path, numpy array, or JAX array; normalize to (H, W, 3) fp32
    (ref: preprocess_envmap.py:247-261 tensor normalization)."""
    if isinstance(env_input, str):
        from .io import load_hdr_file

        arr = load_hdr_file(env_input)
    else:
        arr = np.asarray(env_input, np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    elif arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return arr.astype(np.float32)


def clear_environment_cache() -> None:
    """(ref: preprocess_envmap.py:528-530)"""
    _env_cache.clear()


def get_cache_stats() -> Dict[str, int]:
    """(ref: preprocess_envmap.py:532-537)"""
    return {"cache_size": len(_env_cache), "max_size": _env_cache.max_size}
