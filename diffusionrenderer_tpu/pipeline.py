"""Pipeline orchestration: one call = one full diffusion generation.

TPU-native counterpart of CleanDiffusionRendererPipeline
(/root/reference/diffusion_renderer_pipeline.py:37-320).  Differences by
design:

* The entire generation — condition VAE-encodes, the EDM denoise scan with
  all DiT forwards, the VAE decode, and post-processing to [0,1] — is ONE
  jitted function per (config, shape).  The reference crosses the host
  boundary every scheduler step; here XLA owns the whole trajectory.
* The reference's md5-keyed config/model cache
  (diffusion_renderer_pipeline.py:113-166) is replaced by jit's executable
  cache keyed on the frozen RendererConfig + tensor shapes.
* Classifier-free guidance batches (cond, uncond) into the batch axis
  instead of running two sequential net calls
  (ref: model_diffusion_renderer.py:230-232).
* The batch axis is free: B>1 works (the reference hardcodes B=1 noise,
  model_diffusion_renderer.py:222), which also lets the inverse renderer run
  all five G-buffer passes as one B=5 batch (see api.inverse_render).

Data layout: all video tensors are channels-last (B, T, H, W, C), values in
[-1, 1] on entry (the API layer maps from [0,1] images).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    RendererConfig,
    VAEConfig,
    get_config_by_model_type,
    validate_config,
)
from .models.dit import dit_forward
from .models.vae import vae_decode, vae_encode
from .sampling.edm import edm_sigmas, edm_step, scale_model_input
from .utils.layout import ncthw_to_nthwc, nthwc_to_ncthw

# Keys searched, in order, to infer input dimensions
# (ref: diffusion_renderer_pipeline.py:253-265).
SHAPE_INFERENCE_KEYS = (
    "rgb", "image", "basecolor", "normal", "depth", "roughness", "metallic",
)


class PixelInput(NamedTuple):
    """A pixel video already uploaded in the lane-compact MERGED layout.

    arr: (B, T, H, W*C) device buffer — either the pipeline's compute dtype
    with values in [-1, 1], or raw uint8 [0, 255] (the half-bytes upload
    fast path; range-mapped on device in _cond_to_ncdhw);
    shape5: the logical (B, T, H, W, C).

    Built by DiffusionRendererPipeline.prepare_pixel_input; pass as a
    data_batch value to reuse one upload across several generations (the
    5-G-buffer inverse job reads the same video 5 times — ref loop:
    nodes.py:187-213)."""

    arr: jax.Array
    shape5: Tuple[int, int, int, int, int]


def _upload_merged(x, compute_dtype_str: str) -> jax.Array:
    """Host (B, T, H, W, C) video -> merged (B, T, H, W*C) device buffer.

    Cast to the compute dtype ON HOST via torch (utils/hostops — numpy's
    bf16 cast is ~40 s at flagship size, torch's 0.5 s): uploading fp32 and
    casting in-jit would hold the fp32 inputs AND their bf16 copies
    simultaneously (program inputs are not freed mid-program), which tipped
    the 8-condition flagship forward encode over HBM.

    uint8 input is the fast path: uploaded RAW (half the bytes of bf16,
    a quarter of fp32 — tunnel/PCIe transfer is a measured wall at
    flagship size) and range-mapped [0,255] -> [-1,1] in-jit at HBM
    bandwidth (_cond_to_ncdhw).  The uint8->float cast never touches the
    host CPU at all."""
    x = np.asarray(x)
    b_, t_, h_, w_, c_ = x.shape
    if x.dtype == np.uint8:
        pass  # raw upload; dequant + range map happen on device
    elif compute_dtype_str == "bfloat16":
        from .utils.hostops import to_bfloat16

        x = to_bfloat16(x)
    else:
        from .utils.hostops import to_float32

        x = to_float32(x)
    return jnp.asarray(
        np.ascontiguousarray(x).reshape(b_, t_, h_, w_ * c_))


def _cond_to_ncdhw(z: jax.Array, cfg: RendererConfig) -> jax.Array:
    """Merged (B, T, H, W*C) or NCTHW condition -> (B, C, T, H, W).

    uint8 input (the raw-upload fast path, _upload_merged) is range-mapped
    [0,255] -> [-1,1] here, in-jit: x*(2/255) - 1 == the reference's host
    `/255` then `*2-1` (ref: nodes.py:183)."""
    if z.ndim == 4:  # merged (B, T, H, W*C)
        bb, tt, hh, wc = z.shape
        cc = wc // cfg.width
        z = z.reshape(bb, tt, hh, cfg.width, cc)
        z = jnp.transpose(z, (0, 4, 1, 2, 3))
    if z.dtype == jnp.uint8:
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        z = z.astype(dt) * jnp.asarray(2.0 / 255.0, dt) - jnp.asarray(1.0, dt)
    if z.shape[2] == 1 and cfg.num_frames > 1:
        # Time-constant condition (the env projections are static per
        # frame): caller uploads ONE frame, the broadcast happens here
        # on device — 3 fewer full-res uploads than the reference's
        # host-side expand (ref: nodes.py:298-304).
        z = jnp.broadcast_to(
            z, (z.shape[0], z.shape[1], cfg.num_frames, *z.shape[3:])
        )
    return z  # (B, C, T, H, W)


def _prepare_latent_conditions(
    dit_params, vae_params, cond_tensors, present, cfg: RendererConfig,
    identity_vae: bool = False,
):
    """Encode each present condition key through the VAE (x sigma_data), zeros
    for missing keys, optional 0/1 mask channel per key; concat on channels
    (ref: model_diffusion_renderer.py:158-197).

    identity_vae=True treats inputs as already-latent (golden parity harness:
    isolates sampler+conditioning semantics from VAE weights).

    cond_tensors arrive either rank-5 channels-FIRST (B, C, T, H, W) or
    rank-4 MERGED (B, T, H, W*C) — the preferred host boundary: a host
    NTHWC fp32 video reshapes to merged for free (contiguous), the minor
    dimension W*C is lane-compact on chip, and the NCTHW re-layout runs
    in-jit at HBM bandwidth (~1 s at flagship vs ~100 s of single-threaded
    host numpy transpose+cast).  A channels-last device buffer is never
    materialized (it would lane-pad 3 -> 128, 42x)."""

    def _as_ncdhw(z):
        return _cond_to_ncdhw(z, cfg)

    sd = cfg.sigma_data
    pieces = []
    latent = None
    for i, key in enumerate(cfg.condition_keys):
        if present[i]:
            if identity_vae:
                z = ncthw_to_nthwc(_as_ncdhw(cond_tensors[i])) * sd
            else:
                z = vae_encode(vae_params, _as_ncdhw(cond_tensors[i]),
                               cfg.vae, in_layout="NCDHW") * sd
            latent = z
            pieces.append(("z", z))
            if cfg.append_condition_mask:
                pieces.append(("ones", None))
        else:
            pieces.append(("zeros", None))
            if cfg.append_condition_mask:
                pieces.append(("zeros_mask", None))
    assert latent is not None, "no condition tensor present"
    b, t, h, w, c = latent.shape
    out = []
    for kind, z in pieces:
        if kind == "z":
            out.append(z)
        elif kind == "zeros":
            out.append(jnp.zeros((b, t, h, w, c), latent.dtype))
        elif kind == "ones":
            out.append(jnp.ones((b, t, h, w, 1), latent.dtype))
        else:
            out.append(jnp.zeros((b, t, h, w, 1), latent.dtype))
    return jnp.concatenate(out, axis=-1)


def _token_constraint(shard_tokens: bool):
    """Sharding constraint for (B, L, D) DiT activations, or None.

    Requires tracing under an active mesh (generate() enters it)."""
    if not shard_tokens:
        return None
    from jax.sharding import PartitionSpec as P

    return lambda x: jax.lax.with_sharding_constraint(
        x, P("data", "seq", None)
    )


def _make_denoise_fn(dit_params, latent_condition, ctx, guidance, *, cfg,
                     use_cfg, compute_dtype, seq_constraint, sp_attn, mesh,
                     mlp_chunks):
    """The ONE CFG/denoise core: builds denoise_fn(x_scaled, sigma) -> F(x).

    Shared by the fused (_generate_jit) and staged (_sample_jit /
    _sample_segment_jit) paths so the classifier-free-guidance batching and
    the dit_forward plumbing exist exactly once.  Under CFG the (cond,
    uncond) pair rides the batch axis in one forward — the reference runs a
    doubled batch too (ref: model_diffusion_renderer.py:230-232) — and the
    combine is net = cond + g * (cond - uncond) in fp32."""
    b = latent_condition.shape[0]
    if use_cfg:
        lc2 = jnp.concatenate(
            [latent_condition, jnp.zeros_like(latent_condition)], axis=0
        )
        ctx2 = jnp.concatenate([ctx, jnp.zeros_like(ctx)], axis=0)

        def denoise_fn(x_scaled, sigma):
            x2 = jnp.concatenate([x_scaled, x_scaled], axis=0)
            out2 = dit_forward(
                dit_params, x2, jnp.full((2 * b,), sigma, compute_dtype),
                lc2, ctx2, cfg.net,
                seq_sharding_constraint=seq_constraint,
                attn_backend=sp_attn, mesh=mesh,
                mlp_token_chunks=mlp_chunks,
            )
            out_c, out_u = out2[:b], out2[b:]
            g = guidance.astype(jnp.float32)
            return (
                out_c.astype(jnp.float32)
                + g * (out_c.astype(jnp.float32) - out_u.astype(jnp.float32))
            ).astype(compute_dtype)

        return denoise_fn

    def denoise_fn(x_scaled, sigma):
        return dit_forward(
            dit_params, x_scaled, jnp.full((b,), sigma, compute_dtype),
            latent_condition, ctx, cfg.net,
            seq_sharding_constraint=seq_constraint,
            attn_backend=sp_attn, mesh=mesh,
            mlp_token_chunks=mlp_chunks,
        )

    return denoise_fn


def _make_edm_scan_step(denoise_fn, sigma_data):
    """One EDM Euler step for lax.scan over (sigma, sigma_next) pairs
    (ref: model_diffusion_renderer.py:224-235)."""

    def step(x, pair):
        sigma, sigma_next = pair[0], pair[1]
        x_scaled = scale_model_input(x, sigma, sigma_data)
        f = denoise_fn(x_scaled, sigma)
        return edm_step(f, sigma, sigma_next, x, sigma_data), None

    return step


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_steps", "use_cfg", "present", "noise_tile",
                     "identity_vae", "shard_tokens", "mesh", "sp_attn",
                     "mlp_chunks"),
)
def _generate_jit(
    dit_params,
    vae_params,
    cond_tensors: Tuple[jax.Array, ...],
    context_index: jax.Array,
    key: jax.Array,
    guidance: jax.Array,
    normal_mask: jax.Array,
    x_init_override: Optional[jax.Array] = None,
    *,
    cfg: RendererConfig,
    num_steps: int,
    use_cfg: bool,
    present: Tuple[bool, ...],
    noise_tile: int = 1,
    identity_vae: bool = False,
    shard_tokens: bool = False,
    mesh=None,
    sp_attn: str = "auto",
    mlp_chunks: int = 1,
):
    """Full generation: conditions -> EDM scan -> decode -> [0,1] video."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    seq_constraint = _token_constraint(shard_tokens)

    # Inputs arrive channels-first (NCTHW — lane-pad-safe device boundary,
    # see _generate_inner); they stay channels-first until the VAE's Haar
    # patcher has widened the channel axis (_prepare_latent_conditions).
    cond_tensors = tuple(
        x.astype(compute_dtype) if x is not None else None
        for x in cond_tensors
    )
    latent_condition = _prepare_latent_conditions(
        dit_params, vae_params, cond_tensors, present, cfg,
        identity_vae=identity_vae,
    )
    b, lt, lh, lw, _ = latent_condition.shape
    c_lat = cfg.vae.latent_channels

    sigmas = edm_sigmas(num_steps, cfg.scheduler.sigma_max, cfg.scheduler.sigma_min)
    # noise_tile > 1 replicates one noise draw across that many batch groups —
    # the batched-5-pass inverse path then exactly reproduces the serial loop,
    # which reseeds identically per pass (ref: model_diffusion_renderer.py:216).
    if x_init_override is not None:
        x_init = x_init_override.astype(compute_dtype)
    else:
        noise = jax.random.normal(
            key, (b // noise_tile, lt, lh, lw, c_lat), jnp.float32
        )
        x_init = (jnp.tile(noise, (noise_tile, 1, 1, 1, 1)) * sigmas[0]).astype(
            compute_dtype
        )

    ctx = context_index.reshape(b).astype(jnp.int32)

    denoise_fn = _make_denoise_fn(
        dit_params, latent_condition, ctx, guidance, cfg=cfg,
        use_cfg=use_cfg, compute_dtype=compute_dtype,
        seq_constraint=seq_constraint, sp_attn=sp_attn, mesh=mesh,
        mlp_chunks=mlp_chunks,
    )
    # EDM Euler trajectory as one scan.
    pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
    step = _make_edm_scan_step(denoise_fn, cfg.scheduler.sigma_data)
    sample, _ = jax.lax.scan(step, x_init, pairs)

    # Decode: vae.decode(x / sigma_data) (ref:
    # model_diffusion_renderer.py:148-156; pipeline.py:296).
    descaled = (sample / cfg.scheduler.sigma_data).astype(compute_dtype)
    if identity_vae:
        video = descaled.astype(jnp.float32)
    else:
        video = vae_decode(vae_params, descaled, cfg.vae).astype(jnp.float32)

    # Renormalize + blend by magnitude, applied per sample via normal_mask —
    # a (B,) 0/1 selector so a batched 5-pass inverse run normalizes only its
    # 'normal' element (ref: diffusion_renderer_pipeline.py:300-310).
    norm = jnp.linalg.norm(video, axis=-1, keepdims=True)
    normalized = video / jnp.clip(norm, 1e-12, None)
    blend = jnp.clip((norm - 0.2) / (0.4 - 0.2), 0.0, 1.0)
    renormed = normalized * blend + video * (1.0 - blend)
    sel = normal_mask.astype(jnp.float32)[:, None, None, None, None]
    video = renormed * sel + video * (1.0 - sel)

    # [-1,1] -> [0,1] -> uint8, all on device (ref:
    # diffusion_renderer_pipeline.py:313-318) — doing the quantization inside
    # the compiled program avoids a tile-padded eager fp32 buffer at full
    # video resolution and shrinks the device->host transfer 4x.
    video01 = jnp.clip(1.0 + video, 0.0, 2.0) / 2.0
    return (video01 * 255.0).astype(jnp.uint8)


# --- Staged variants -------------------------------------------------------
# The fused _generate_jit holds VAE-encode, the denoise scan, and VAE-decode
# buffers in ONE program; at the flagship shape (57f x 704x1280 + 7B int8
# weights) its peak exceeds the ~14.5 GiB chip.  The staged path runs the
# three phases as separate programs so XLA frees each phase's buffers before
# the next — same math, one extra host sync per phase boundary (negligible
# against the multi-second denoise scan).


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_one_condition_jit(vae_params, x, *, cfg):
    """VAE-encode ONE condition video (x sigma_data).

    The staged pipeline dispatches each condition key as its own program:
    inside a single 8-condition program XLA interleaves the independent
    encodes and their temporaries coexist (measured 6.66 GiB buffer
    assignment for the flagship forward job vs 2.05 for one encode), which
    together with the 7.3 GiB int8 weights exceeds HBM.  Separate
    dispatches serialize on the device queue, so peak = one encode."""
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    if x.dtype != jnp.uint8:
        # uint8 must reach _cond_to_ncdhw unconverted: it carries the raw
        # [0,255] range that the in-jit range map rescales to [-1,1].
        x = x.astype(compute_dtype)
    return vae_encode(
        vae_params, _cond_to_ncdhw(x, cfg), cfg.vae, in_layout="NCDHW"
    ) * cfg.sigma_data


@functools.partial(jax.jit, static_argnames=("cfg", "present", "tile"))
def _assemble_conditions_jit(latents, *, cfg, present, tile=1):
    """Concat per-key latents + mask/zeros channels into the conditioning
    tensor (same semantics as _prepare_latent_conditions; latents arrive
    already sigma_data-scaled, one per PRESENT key, in key order)."""
    it = iter(latents)
    ref = latents[0]
    b, t, h, w, c = ref.shape
    out = []
    for i in range(len(cfg.condition_keys)):
        if present[i]:
            out.append(next(it))
            if cfg.append_condition_mask:
                out.append(jnp.ones((b, t, h, w, 1), ref.dtype))
        else:
            out.append(jnp.zeros((b, t, h, w, c), ref.dtype))
            if cfg.append_condition_mask:
                out.append(jnp.zeros((b, t, h, w, 1), ref.dtype))
    latent = jnp.concatenate(out, axis=-1)
    if tile > 1:
        latent = jnp.tile(latent, (tile, 1, 1, 1, 1))
    return latent


@functools.partial(jax.jit, static_argnames=("cfg", "present", "identity_vae",
                                             "tile"))
def _encode_conditions_jit(vae_params, cond_tensors, *, cfg, present,
                           identity_vae=False, tile=1):
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    # Merged or NCTHW at the device boundary (see _generate_inner);
    # channels-first is preserved into the VAE's Haar patcher.
    cond_tensors = tuple(
        x.astype(compute_dtype) if x is not None else None
        for x in cond_tensors
    )
    latent = _prepare_latent_conditions(
        None, vae_params, cond_tensors, present, cfg,
        identity_vae=identity_vae,
    )
    if tile > 1:
        # Batched multi-pass job sharing one input video: encode once,
        # replicate the (small) latent per pass row — the serial reference
        # loop re-encodes per pass (nodes.py:187-213).
        latent = jnp.tile(latent, (tile, 1, 1, 1, 1))
    return latent


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_steps", "use_cfg", "noise_tile",
                     "shard_tokens", "mesh", "sp_attn", "mlp_chunks"),
)
def _sample_jit(dit_params, latent_condition, context_index, key, guidance,
                *, cfg, num_steps, use_cfg, noise_tile=1, shard_tokens=False,
                mesh=None, sp_attn="auto", mlp_chunks=1):
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    seq_constraint = _token_constraint(shard_tokens)

    latent_condition = latent_condition.astype(compute_dtype)
    b, lt, lh, lw, _ = latent_condition.shape
    c_lat = cfg.vae.latent_channels
    sigmas = edm_sigmas(num_steps, cfg.scheduler.sigma_max,
                        cfg.scheduler.sigma_min)
    noise = jax.random.normal(
        key, (b // noise_tile, lt, lh, lw, c_lat), jnp.float32
    )
    x_init = (jnp.tile(noise, (noise_tile, 1, 1, 1, 1)) * sigmas[0]).astype(
        compute_dtype
    )
    ctx = context_index.reshape(b).astype(jnp.int32)

    denoise_fn = _make_denoise_fn(
        dit_params, latent_condition, ctx, guidance, cfg=cfg,
        use_cfg=use_cfg, compute_dtype=compute_dtype,
        seq_constraint=seq_constraint, sp_attn=sp_attn, mesh=mesh,
        mlp_chunks=mlp_chunks,
    )
    pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
    step = _make_edm_scan_step(denoise_fn, cfg.scheduler.sigma_data)
    sample, _ = jax.lax.scan(step, x_init, pairs)
    return sample


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "use_cfg", "noise_tile", "shard_tokens",
                     "mesh", "sp_attn", "mlp_chunks"),
)
def _sample_segment_jit(dit_params, latent_condition, context_index, x,
                        guidance, sigma_pairs, *, cfg, use_cfg,
                        noise_tile=1, shard_tokens=False, mesh=None,
                        sp_attn="auto", mlp_chunks=1):
    """Run a SLICE of the denoise trajectory: x over sigma_pairs (k, 2).

    Exists because this environment's TPU worker kills executions running
    longer than some tens of seconds ("kernel fault" crash); the host
    dispatches the 15-step flagship trajectory as short segments, carrying x
    on-device between dispatches.  Identical math to _sample_jit.
    """
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    seq_constraint = _token_constraint(shard_tokens)

    latent_condition = latent_condition.astype(compute_dtype)
    b = latent_condition.shape[0]
    x = x.astype(compute_dtype)
    ctx = context_index.reshape(b).astype(jnp.int32)

    denoise_fn = _make_denoise_fn(
        dit_params, latent_condition, ctx, guidance, cfg=cfg,
        use_cfg=use_cfg, compute_dtype=compute_dtype,
        seq_constraint=seq_constraint, sp_attn=sp_attn, mesh=mesh,
        mlp_chunks=mlp_chunks,
    )
    step = _make_edm_scan_step(denoise_fn, cfg.scheduler.sigma_data)
    x, _ = jax.lax.scan(step, x, sigma_pairs)
    return x


@functools.partial(
    jax.jit, static_argnames=("shape", "noise_tile", "dtype_str", "per_row")
)
def _noise_init_jit(key, sigma0, *, shape, noise_tile, dtype_str, per_row=False):
    if per_row:
        # key: (B,) stacked per-row PRNG keys.  Row i's draw is bit-identical
        # to jax.random.normal(key_i, (1, *shape[1:])) — a batched serving
        # dispatch therefore reproduces each request's solo noise exactly.
        noise = jax.vmap(
            lambda k: jax.random.normal(k, shape[1:], jnp.float32)
        )(key)
    else:
        noise = jax.random.normal(
            key, (shape[0] // noise_tile, *shape[1:]), jnp.float32
        )
        noise = jnp.tile(noise, (noise_tile, 1, 1, 1, 1))
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    return (noise * sigma0).astype(dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode_jit(vae_params, sample, normal_mask, *, cfg):
    """Decode + post-process in NCTHW — keeping (H, W) as the minor dims
    avoids a 42x lane-padded (..., 3) pixel buffer at flagship resolution —
    then emit MERGED uint8 (B, T, H, W*C): lane-compact on chip, and the
    host gets channels-last with a free reshape instead of a ~3-minute
    single-threaded strided transpose of the full video."""
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    descaled = (sample / cfg.scheduler.sigma_data).astype(compute_dtype)
    video = vae_decode(vae_params, descaled, cfg.vae,
                       out_layout="NCDHW").astype(jnp.float32)
    norm = jnp.linalg.norm(video, axis=1, keepdims=True)
    normalized = video / jnp.clip(norm, 1e-12, None)
    blend = jnp.clip((norm - 0.2) / (0.4 - 0.2), 0.0, 1.0)
    renormed = normalized * blend + video * (1.0 - blend)
    sel = normal_mask.astype(jnp.float32)[:, None, None, None, None]
    video = renormed * sel + video * (1.0 - sel)
    video01 = jnp.clip(1.0 + video, 0.0, 2.0) / 2.0
    u8 = (video01 * 255.0).astype(jnp.uint8)  # (B, C, T, H, W)
    b_, c_, t_, h_, w_ = u8.shape
    return jnp.transpose(u8, (0, 2, 3, 4, 1)).reshape(b_, t_, h_, w_ * c_)


class DiffusionRendererPipeline:
    """Holds model params and dispatches jitted generations.

    Equivalent public surface to the reference pipeline: set_model_type,
    generate_video (here `generate`), runtime guidance/num_steps/seed
    (ref: diffusion_renderer_pipeline.py:37-111,242-320).
    """

    def __init__(
        self,
        dit_params: Mapping[str, Any],
        vae_params: Mapping[str, Any],
        model_type: Optional[str] = "inverse",
        guidance: float = 0.0,
        num_steps: int = 15,
        seed: int = 42,
        compute_dtype: Optional[str] = None,
        net_config=None,
        vae_config=None,
        mesh=None,
    ):
        self.dit_params = dit_params
        self.vae_params = vae_params
        self.model_type = model_type.lower() if model_type else None
        self.guidance = guidance
        self.num_steps = num_steps
        self.seed = seed
        if compute_dtype is None:
            # Follow the weights: fp32 params (tests, CPU parity work) run
            # fp32; bf16 production weights run bf16.  XLA convs/matmuls
            # require matching operand dtypes, so a mismatched default would
            # crash in the VAE's causal_conv3d.
            leaf = next(
                (x for x in jax.tree_util.tree_leaves(vae_params)
                 if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                           jnp.floating)),
                None,
            )
            compute_dtype = (
                "float32"
                if leaf is not None and leaf.dtype == jnp.float32
                else "bfloat16"
            )
        self.compute_dtype = compute_dtype
        # Optional architecture overrides (scaled-down models for tests and
        # ablations); None = flagship FADITV2_7B / CV8x8x8.
        self.net_config = net_config
        self.vae_config = vae_config
        # Multi-chip execution: set via shard() — params placed per the
        # Megatron TP layout, batches sharded over `data`.
        self.mesh = mesh
        # Sequence-parallel attention impl under a mesh: 'auto' (shard_map'd
        # Pallas flash with all-gathered KV on TPU, XLA elsewhere),
        # 'flash_sp', 'ring', or 'xla' (see parallel/flash_sp.py).
        self.sp_attn = "auto"
        # Max denoise steps per device dispatch in the staged path.
        # None = auto: 3 on the axon tunnel (its worker kills executions
        # beyond ~tens of seconds; 3 flagship steps ~ 13 s), unlimited on
        # real TPUs/CPU so the whole trajectory is one program.
        self.max_steps_per_dispatch: Optional[int] = None
        # MLP token-axis chunking inside each DiT block: None = auto
        # (4 chunks at >=16k tokens); 1 disables.
        self.mlp_token_chunks: Optional[int] = None
        # Optional temporally-chunked decode (latent frames per chunk).
        # Chunk-restart causality — the reference's own legacy long-video
        # behavior (ref: pretrained_vae.py:367-436); bounds decoder peak
        # memory for flagship shapes on a single 16 GB chip.
        self.decode_chunk_frames: Optional[int] = None

    def shard(self, mesh, sp_attn: Optional[str] = None
              ) -> "DiffusionRendererPipeline":
        """Place the pipeline's params onto a (data, seq, tensor) mesh.

        The reference has no distributed path at all (SURVEY.md section 2d);
        this is the framework's multi-chip inference entry point.
        sp_attn optionally overrides the sequence-parallel attention impl
        ('auto' | 'flash_sp' | 'ring' | 'xla').
        """
        if sp_attn is not None:
            self.sp_attn = sp_attn
        from .parallel.sharding import (
            dit_param_shardings,
            shard_params,
            vae_param_shardings,
        )

        self.dit_params = shard_params(
            self.dit_params, dit_param_shardings(self.dit_params, mesh)
        )
        self.vae_params = shard_params(
            self.vae_params, vae_param_shardings(self.vae_params, mesh)
        )
        self.mesh = mesh
        return self

    def set_model_type(self, model_type: str) -> None:
        """(ref: diffusion_renderer_pipeline.py:99-111).  Note: inverse and
        forward use different checkpoints (patch_dim 132 vs 612); switching
        type only changes the config — the caller is responsible for having
        loaded matching weights (checked at generate time)."""
        self.model_type = model_type.lower()

    def prepare_pixel_input(self, video) -> PixelInput:
        """Upload a host (B, T, H, W, C) video (values in [-1, 1]) once in
        the lane-compact merged layout and the pipeline's compute dtype;
        the result can be passed as a data_batch value to any number of
        generate() calls (the 5-G-buffer inverse job reuses one upload
        across its 5 passes)."""
        shape5 = tuple(np.shape(video))
        return PixelInput(_upload_merged(video, self.compute_dtype), shape5)

    def _config_for(self, shape_5d: Tuple[int, ...]) -> RendererConfig:
        import dataclasses

        b, t, h, w, c = shape_5d
        cfg = get_config_by_model_type(
            self.model_type, height=h, width=w, num_frames=t,
            compute_dtype=self.compute_dtype,
        )
        if self.net_config is not None:
            cfg = dataclasses.replace(cfg, net=self.net_config)
        if self.vae_config is not None:
            cfg = dataclasses.replace(cfg, vae=self.vae_config)
        validate_config(cfg)
        # Weight compatibility check (the reference relies on
        # load_state_dict(strict=True) to catch this, nodes.py:110).
        patch_dim = self.dit_params["x_embedder"]["weight"].shape[0]
        if patch_dim != cfg.net.patch_dim:
            raise ValueError(
                f"Loaded DiT weights have patch_dim {patch_dim} but model_type "
                f"{self.model_type!r} needs {cfg.net.patch_dim}. Load the "
                f"matching checkpoint (inverse=132, forward=612)."
            )
        return cfg

    def _vae_cfg(self, cfg: Optional[RendererConfig]) -> VAEConfig:
        if cfg is not None:
            return cfg.vae
        return self.vae_config if self.vae_config is not None else VAEConfig()

    def encode(self, x: jax.Array, cfg: Optional[RendererConfig] = None) -> jax.Array:
        """VAE encode with EDM sigma_data scaling: vae.encode(x) * sigma_data
        (ref: model_diffusion_renderer.py:138-146).  x: (B, T, H, W, 3)."""
        sd = cfg.sigma_data if cfg is not None else 0.5
        return vae_encode(self.vae_params, x, self._vae_cfg(cfg)) * sd

    def decode(self, z: jax.Array, cfg: Optional[RendererConfig] = None) -> jax.Array:
        """VAE decode with EDM scaling: vae.decode(z / sigma_data)
        (ref: model_diffusion_renderer.py:148-156)."""
        sd = cfg.sigma_data if cfg is not None else 0.5
        return vae_decode(self.vae_params, z / sd, self._vae_cfg(cfg))

    def reset_dtype(self, dtype) -> None:
        """Cast all weights to a new dtype (ref: CleanVAE.py:66-67 /
        nodes.py:90-91).  Norm/statistics leaves stay fp32; int8 quantized
        leaves are untouched."""
        def cast(path, x):
            # int8 weights and their fp32 dequant scales ('s'/'sa') stay put.
            if any(getattr(k, "key", None) in ("s", "sa") for k in path):
                return x
            if x.dtype in (jnp.int8, jnp.int32, jnp.float32) and x.ndim <= 1:
                return x
            if x.dtype == jnp.int8:
                return x
            return x.astype(dtype) if x.ndim > 1 else x

        self.dit_params = jax.tree_util.tree_map_with_path(
            cast, self.dit_params)
        self.vae_params = jax.tree_util.tree_map_with_path(
            cast, self.vae_params)

    def _decode_overlapped(self, sample, normal_mask, cfg, chunk: int,
                           overlap: int = 1) -> np.ndarray:
        """Decode latent-time chunks with `overlap` latents of causal context.

        Bounds decoder peak memory for flagship shapes.  The first chunk's
        frames are exact; later chunks restart the causal state `overlap`
        latents early and keep only their non-overlap frames (each decoded
        frame sees >= overlap latents of history).  Frame count matches the
        unchunked decode exactly: (T_lat-1)*8+1.
        """
        if sample.shape[0] > 1:
            # Row-split batched decodes: chunking exists to bound decoder
            # peak memory, which scales with the batch row count too.
            return np.concatenate([
                self._decode_overlapped(sample[i : i + 1], normal_mask[i : i + 1],
                                        cfg, chunk, overlap)
                for i in range(sample.shape[0])
            ], axis=0)
        t_lat = sample.shape[1]
        step = chunk - overlap
        assert step >= 1, "chunk must exceed overlap"
        # Dispatch every chunk decode first (device queue serializes them),
        # THEN fetch in order: chunk i's device->host readback overlaps
        # chunk i+1's decode compute.  Decoded chunks are merged uint8 —
        # holding all of them on device is ~the output video's nominal size.
        dispatched = []
        start = 0
        while start < t_lat:
            length = min(chunk, t_lat - start)
            if start > 0 and length <= overlap:
                break  # fully covered by the previous chunk
            dispatched.append((start, length, _decode_jit(
                self.vae_params, sample[:, start : start + length],
                normal_mask, cfg=cfg,
            )))  # merged (B, T_pix, H, W*C), (length-1)*8+1 frames
            start += step
        pieces = []
        for start, length, dev in dispatched:
            out = np.asarray(dev)
            if start == 0:
                pieces.append(out)
            else:
                keep = 8 * (length - overlap)
                pieces.append(out[:, -keep:])
        return np.concatenate(pieces, axis=1)

    def generate(
        self,
        data_batch: Mapping[str, Any],
        normalize_normal=False,
        seed: Optional[int] = None,
        noise_tile: int = 1,
        staged: bool = True,
        batch_tile: int = 1,
        defer_fetch: bool = False,
    ) -> np.ndarray:
        """Run one generation; returns uint8 (B, T, H, W, C) on host
        (ref: diffusion_renderer_pipeline.py:242-320).

        defer_fetch=True returns the MERGED uint8 (B, T, H, W*C) still on
        device (staged unchunked decode only): callers pipelining several
        generations fetch results after dispatching the next pass, hiding
        the device->host readback behind compute.

        staged=True (default) runs condition-encode / denoise / decode as
        three programs so each phase's buffers are freed before the next —
        required for flagship shapes on a single 16 GB chip; staged=False
        fuses everything into one program (lowest overhead at small shapes).

        batch_tile=n encodes the condition video ONCE and replicates the
        latent n-fold on device: the batched multi-pass inverse job shares
        one input video across rows, so the per-row context_index /
        normalize_normal / output batch is n * B while only B rows are
        uploaded and encoded (staged path only).
        """
        import gc
        import time as _time

        from .utils.profiling import logger

        # The axon tunnel reclaims device buffers asynchronously: a
        # generation dispatched right after a large one (another pass, a
        # crashed job, a probe) can see RESOURCE_EXHAUSTED even though the
        # memory is already logically free, and multi-GiB drains can take
        # minutes.  Retry with escalating waits — axon only; real TPU
        # runtimes free synchronously, so there a genuine OOM surfaces
        # untouched.  Retries happen OUTSIDE the except block: the
        # exception's traceback pins the failed attempt's frames — and
        # every device buffer they reference — which would defeat the
        # drain.
        for wait_s in (None, 20.0, 60.0, 120.0):
            if wait_s is not None:
                logger.warning(
                    "device allocator exhausted — draining deferred frees "
                    "and retrying in %.0f s", wait_s)
                gc.collect()
                _time.sleep(wait_s)
            try:
                return self._generate_inner(
                    data_batch, normalize_normal, seed, noise_tile, staged,
                    batch_tile, defer_fetch)
            except Exception as e:  # pragma: no cover - runtime specific
                from .utils.platform import is_axon

                if ("RESOURCE_EXHAUSTED" not in str(e) or not is_axon()
                        or wait_s == 120.0):
                    raise

    def _generate_inner(
        self,
        data_batch: Mapping[str, Any],
        normalize_normal=False,
        seed: Optional[int] = None,
        noise_tile: int = 1,
        staged: bool = True,
        batch_tile: int = 1,
        defer_fetch: bool = False,
    ) -> np.ndarray:
        if self.model_type is None:
            raise RuntimeError("model_type not set; call set_model_type first")

        from .utils.profiling import logger, phase_timer

        shape_key = None
        for k in SHAPE_INFERENCE_KEYS:
            if k in data_batch:
                shape_key = k
                break
        if shape_key is None:
            raise ValueError(
                f"No tensor for shape inference; looked for {SHAPE_INFERENCE_KEYS}"
            )
        sval = data_batch[shape_key]
        shape5 = (tuple(sval.shape5) if isinstance(sval, PixelInput)
                  else tuple(np.shape(sval)))  # no device upload
        cfg = self._config_for(shape5)
        logger.info(
            "generate: model_type=%s input=%s (key=%r) latent=%s steps=%d "
            "guidance=%.2f", self.model_type, shape5,
            shape_key, cfg.latent_shape, self.num_steps, self.guidance,
        )

        # MLP token chunking: bounds the (L, 4*D) hidden (and, under W8A8,
        # its int8-quantization transients) — at flagship 28,160 tokens that
        # buffer is ~920 MB bf16 and decides whether the step fits HBM.
        if self.mlp_token_chunks is not None:
            mlp_chunks = int(self.mlp_token_chunks)
        else:
            _, lt_, lh_, lw_ = cfg.latent_shape
            tokens = (lt_ // cfg.net.patch_temporal) * (
                lh_ // cfg.net.patch_spatial) * (lw_ // cfg.net.patch_spatial)
            mlp_chunks = 4 if tokens >= 16384 and tokens % 4 == 0 else 1

        present = tuple(
            (k in data_batch) or (k == "image" and "rgb" in data_batch)
            for k in cfg.condition_keys
        )

        # Device boundary is MERGED (B, T, H, W*C) fp32: this runtime
        # tile-pads a buffer's minor (lane) dimension to 128, so a full-res
        # channels-last video would occupy ~42x its nominal bytes on chip
        # (3 -> 128 lanes), while W*C = 3840 is lane-compact.  A contiguous
        # host NTHWC video reshapes to merged for FREE; the jitted programs
        # un-merge to channels-first at HBM bandwidth (~1 s at flagship —
        # host numpy transpose+bf16 cast measured ~100 s single-threaded).
        # jax.Array inputs are passed through: api callers upload once and
        # reuse the buffer across the 5 G-buffer passes.
        def _to_merged(x):
            if isinstance(x, PixelInput):
                return x.arr
            if isinstance(x, jax.Array):
                # Rank-5 device arrays keep the legacy NTHWC contract
                # (small inputs only — fine to re-layout on device).
                return nthwc_to_ncthw(x) if x.ndim == 5 else x
            return _upload_merged(x, cfg.compute_dtype)

        cond_converted = {}

        def _cond_for(i):
            src = (cfg.condition_keys[i]
                   if cfg.condition_keys[i] in data_batch else "rgb")
            if src not in cond_converted:
                cond_converted[src] = _to_merged(data_batch[src])
            return cond_converted[src]

        cond_tensors = None
        if not staged:
            for i in range(len(cfg.condition_keys)):
                if present[i]:
                    _cond_for(i)
            placeholder = next(iter(cond_converted.values()))
            cond_tensors = tuple(
                cond_converted[k if k in data_batch else "rgb"]
                if present[i]
                else placeholder  # ignored under static `present`
                for i, k in enumerate(cfg.condition_keys)
            )

        # batch_tile replicates the encoded latent on device: context /
        # masks / outputs run at b rows while only b/batch_tile rows were
        # uploaded+encoded.
        if batch_tile > 1 and not staged:
            raise ValueError("batch_tile > 1 requires the staged path")
        b = shape5[0] * batch_tile
        ctx = data_batch.get("context_index")
        ctx = (
            jnp.zeros((b,), jnp.int32)
            if ctx is None
            else jnp.asarray(ctx).reshape(b)
        )

        effective_seed = self.seed if seed is None else seed
        if isinstance(effective_seed, (list, tuple, np.ndarray)):
            # Per-row seeds (serving batches mixed requests): row i's noise is
            # bit-identical to a solo dispatch with seed_i.
            seeds = [int(s) for s in np.asarray(effective_seed).reshape(-1)]
            if len(seeds) != b:
                raise ValueError(
                    f"got {len(seeds)} per-row seeds for batch of {b}")
            if noise_tile != 1:
                raise ValueError("per-row seeds and noise_tile are exclusive")
            key = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
            per_row_seeds = True
        else:
            key = jax.random.PRNGKey(effective_seed)
            per_row_seeds = False

        if isinstance(normalize_normal, bool):
            normal_mask = jnp.full((b,), float(normalize_normal))
        else:
            normal_mask = jnp.asarray(normalize_normal, jnp.float32).reshape(b)

        import contextlib

        mesh_ctx = self.mesh if self.mesh is not None else contextlib.nullcontext()
        bs = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            data_n = self.mesh.shape["data"]

            def bs(x):  # noqa: E731 — shadows the no-mesh None sentinel
                # Shard the leading batch axis over `data` whatever the rank
                # (pixel tensors arrive MERGED rank-4, legacy rank-5).  A
                # batch that doesn't divide `data` (e.g. B=1 conditions that
                # a later batch_tile fans out) stays replicated — the tiled
                # denoise activations still shard via the in-jit token
                # constraint (_sample_segment_jit, shard_tokens=True).
                if x.shape[0] % data_n != 0:
                    return x
                spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(self.mesh, spec))

            if cond_tensors is not None:
                cond_tensors = tuple(bs(x) for x in cond_tensors)

        with mesh_ctx, phase_timer(f"generate/{self.model_type}"):
            if staged:
                with phase_timer("generate/encode_conditions"):
                    # One dispatch per condition key: the device queue
                    # serializes them, so peak temp = ONE encode (inside a
                    # single 8-condition program XLA interleaves the
                    # independent encodes — 6.66 GiB assignment, OOM next
                    # to the 7.3 GiB weights).  Uploads interleave with
                    # encodes key by key.
                    latents = []
                    for i in range(len(cfg.condition_keys)):
                        if not present[i]:
                            continue
                        x = _cond_for(i)
                        if bs is not None:
                            x = bs(x)
                        latents.append(_encode_one_condition_jit(
                            self.vae_params, x, cfg=cfg))
                    latent_condition = _assemble_conditions_jit(
                        tuple(latents), cfg=cfg, present=present,
                        tile=batch_tile,
                    )
                    del latents
                with phase_timer("generate/denoise"):
                    sigmas = np.asarray(edm_sigmas(
                        self.num_steps, cfg.scheduler.sigma_max,
                        cfg.scheduler.sigma_min,
                    ))
                    b_lat = latent_condition.shape[0]
                    state_shape = (
                        b_lat, *latent_condition.shape[1:4],
                        cfg.vae.latent_channels,
                    )
                    sample = _noise_init_jit(
                        key, float(sigmas[0]), shape=state_shape,
                        noise_tile=noise_tile, dtype_str=cfg.compute_dtype,
                        per_row=per_row_seeds,
                    )
                    pairs = np.stack([sigmas[:-1], sigmas[1:]], axis=1)
                    if self.max_steps_per_dispatch is None:
                        from .utils.platform import is_axon

                        seg = 3 if is_axon() else len(pairs)
                    else:
                        seg = max(1, int(self.max_steps_per_dispatch))
                    for start in range(0, len(pairs), seg):
                        sample = _sample_segment_jit(
                            self.dit_params,
                            latent_condition,
                            ctx,
                            sample,
                            jnp.asarray(self.guidance, jnp.float32),
                            jnp.asarray(pairs[start : start + seg]),
                            cfg=cfg,
                            use_cfg=self.guidance > 0,
                            noise_tile=noise_tile,
                            shard_tokens=self.mesh is not None,
                            mesh=self.mesh,
                            sp_attn=self.sp_attn,
                            mlp_chunks=mlp_chunks,
                        )
                del latent_condition
                with phase_timer("generate/decode"):
                    ck = self.decode_chunk_frames
                    if defer_fetch:
                        # Leave the merged uint8 on device: the caller
                        # fetches later, overlapping this pass's readback
                        # with the next pass's compute (api.inverse_render
                        # serial loop).  Requires the unchunked decode.
                        return _decode_jit(
                            self.vae_params, sample, normal_mask, cfg=cfg
                        )
                    if ck and sample.shape[1] > ck:
                        video_u8 = self._decode_overlapped(
                            sample, normal_mask, cfg, ck
                        )
                    else:
                        video_u8 = np.asarray(_decode_jit(
                            self.vae_params, sample, normal_mask, cfg=cfg
                        ))
                # Merged (B, T, H, W*C) -> NTHWC is a free host reshape.
                b_, t_, h_, _ = video_u8.shape
                return np.asarray(video_u8).reshape(
                    b_, t_, h_, cfg.width, -1)
            else:
                x_init_override = None
                if per_row_seeds:
                    c_lat_, lt_, lh_, lw_ = cfg.latent_shape
                    sigma0 = float(cfg.scheduler.sigma_max)
                    x_init_override = _noise_init_jit(
                        key, sigma0, shape=(b, lt_, lh_, lw_, c_lat_),
                        noise_tile=1, dtype_str=cfg.compute_dtype,
                        per_row=True,
                    )
                video_u8 = _generate_jit(
                    self.dit_params,
                    self.vae_params,
                    cond_tensors,
                    ctx,
                    key,
                    jnp.asarray(self.guidance, jnp.float32),
                    normal_mask,
                    x_init_override,
                    cfg=cfg,
                    num_steps=self.num_steps,
                    use_cfg=self.guidance > 0,
                    present=present,
                    noise_tile=noise_tile,
                    shard_tokens=self.mesh is not None,
                    mesh=self.mesh,
                    sp_attn=self.sp_attn,
                    mlp_chunks=mlp_chunks,
                )
        return np.asarray(video_u8)
