"""High-level API — the framework's equivalent of the ComfyUI node surface.

The reference exposes four nodes (/root/reference/nodes.py:335-340):
LoadDiffusionRendererModel, Cosmos1InverseRenderer, Cosmos1ForwardRenderer,
LoadHDRImage.  Here each is a plain function:

    load_pipeline(...)   -> DiffusionRendererPipeline
    inverse_render(...)  -> {basecolor, metallic, roughness, normal, depth}
    forward_render(...)  -> relit RGB video
    load_hdr(path)       -> float HDR image

Image convention matches ComfyUI: float arrays in [0, 1], channels last.
3D (H,W,C) / 4D (B,H,W,C) / 5D (B,T,H,W,C) inputs are coerced like the
reference nodes (ref: nodes.py:154-179).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import GBUFFER_INDEX_MAPPING, DiTConfig, VAEConfig
from .envmap import (
    latlong_vec,
    render_projection_from_panorama,
    tonemap_image_direct,
)
from .io import load_hdr_image
from .models.dit import init_dit_params
from .models.vae import init_vae_params, load_latent_stats
from .pipeline import DiffusionRendererPipeline
from .utils.layout import to_5d_video

INVERSE_PASSES = ("basecolor", "metallic", "roughness", "normal", "depth")


def load_pipeline(
    dit_checkpoint: Optional[str] = None,
    vae_checkpoint: Optional[str] = None,
    model_type: str = "inverse",
    guidance: float = 0.0,
    num_steps: int = 15,
    seed: int = 42,
    dtype: jnp.dtype = jnp.bfloat16,
    compute_dtype: Optional[str] = None,
    vae_config_json: Optional[str] = None,
    quantize_int8: bool = False,
    act_quant: bool = False,
    quant_group_size: Optional[int] = None,
    quant_keep_bf16: Sequence[str] = (),
    quant_mse_clip: bool = False,
    quant_hadamard: bool = False,
    net_config: Optional[DiTConfig] = None,
    vae_config: Optional[VAEConfig] = None,
) -> DiffusionRendererPipeline:
    """Build a pipeline (LoadDiffusionRendererModel equivalent,
    ref: nodes.py:61-127; defaults guidance=0.0 / num_steps=15 / seed=42
    match nodes.py:123-125).

    With checkpoint paths: loads + converts the torch weights, or restores
    a native orbax directory produced by the CLI `convert` subcommand
    directly (quantization baked in — the production boot path).  Without:
    random-initialized weights at the given model_type's architecture (for
    testing and benchmarking).
    """
    from .checkpoint import is_native_checkpoint, load_dit_checkpoint

    if dit_checkpoint is not None and is_native_checkpoint(dit_checkpoint):
        # CLI `convert` writes a sidecar next to the dit/vae dirs; use it
        # to fail fast on a model-type mismatch (a forward checkpoint under
        # model_type="inverse" would otherwise surface as an opaque shape
        # error at trace time).
        meta_path = os.path.join(os.path.dirname(os.path.abspath(
            dit_checkpoint)), "convert_meta.json")
        if os.path.exists(meta_path):
            import json as _json

            with open(meta_path) as f:
                meta = _json.load(f)
            if meta.get("model_type") and meta["model_type"] != model_type:
                raise ValueError(
                    f"native checkpoint {dit_checkpoint} was converted for "
                    f"model_type={meta['model_type']!r} but load_pipeline "
                    f"was called with model_type={model_type!r}"
                )

    if net_config is not None:
        net_cfg = net_config
    elif model_type == "inverse":
        net_cfg = DiTConfig(additional_concat_ch=16, use_context_embedding=True)
    else:
        net_cfg = DiTConfig(additional_concat_ch=17 * 8,
                            use_context_embedding=False)
    if dit_checkpoint is not None:
        dit_params = load_dit_checkpoint(dit_checkpoint, net_cfg, dtype,
                                         quantize_int8=quantize_int8,
                                         act_quant=act_quant,
                                         group_size=quant_group_size,
                                         keep_bf16=quant_keep_bf16,
                                         mse_clip=quant_mse_clip,
                                         hadamard=quant_hadamard)
    else:
        dit_params = init_dit_params(jax.random.key(0), net_cfg, dtype)
        if quantize_int8:
            from .models.quant import quantize_dit_params

            dit_params = quantize_dit_params(
                dit_params, act_quant=act_quant,
                group_size=quant_group_size, keep_bf16=quant_keep_bf16,
                mse_clip=quant_mse_clip, hadamard=quant_hadamard)

    vae_cfg = vae_config if vae_config is not None else VAEConfig()
    if vae_checkpoint is not None:
        from .checkpoint_vae import load_vae_checkpoint

        vae_params = load_vae_checkpoint(vae_checkpoint, vae_cfg, dtype)
    else:
        vae_params = init_vae_params(jax.random.key(1), vae_cfg, dtype)
    if vae_config_json is not None:
        import json

        with open(vae_config_json) as f:
            vc = json.load(f)
        vae_params = load_latent_stats(
            vae_params, vc["latents_mean"], vc["latents_std"], vae_cfg
        )
    if vae_checkpoint is not None:
        # Identity stats on a real flagship checkpoint produce silently
        # wrong latents (diffusers applies latents_mean/std inside
        # encode/decode; ref VAE_config.json:21-535).  Diffusers loads fall
        # back to the bundled table (checkpoint_vae.ensure_latent_stats);
        # the only way to get here is a native checkpoint that was saved
        # with identity stats — refuse rather than mis-render.
        from .checkpoint_vae import _is_flagship_vae

        if _is_flagship_vae(vae_cfg) and bool(
            np.all(np.asarray(vae_params["latents_mean"]) == 0.0)
            and np.all(np.asarray(vae_params["latents_std"]) == 1.0)
        ):
            raise ValueError(
                f"VAE checkpoint {vae_checkpoint!r} has identity "
                "latents_mean/std at the flagship CV8x8x8 architecture — "
                "this silently corrupts every latent.  Re-convert the "
                "checkpoint (the converter now bundles the statistics "
                "table), or pass vae_config_json pointing at the diffusers "
                "config.json."
            )

    return DiffusionRendererPipeline(
        dit_params,
        vae_params,
        model_type=model_type,
        guidance=guidance,
        num_steps=num_steps,
        seed=seed,
        compute_dtype=compute_dtype,
        net_config=net_config,
        vae_config=vae_config,
    )


def _prep_input_video(image) -> np.ndarray:
    """Host-side input prep for a pixel condition video.

    uint8 stays uint8: the pipeline uploads it RAW (quarter the fp32 bytes
    over the transfer link) and range-maps [0,255] -> [-1,1] on device
    (pipeline._cond_to_ncdhw).  Float input is range-mapped [0,1] -> [-1,1]
    on the host via torch (ref: nodes.py:183; this host's numpy runs
    elementwise kernels ~100x slower, utils/hostops.py)."""
    from .utils.hostops import to_float32, to_signed_range

    arr = np.asarray(image)
    if arr.dtype == np.uint8:
        return np.asarray(to_5d_video(arr))
    return to_signed_range(np.asarray(to_5d_video(to_float32(arr))))


def _job_fingerprint(video: np.ndarray, pipeline, seed: int,
                     guidance: float) -> Dict[str, Any]:
    """Identity of a multi-pass job for resume-safety checks.

    The input digest hashes shape/dtype plus a ~1 MiB stride-sample of the
    raw bytes — a full sha256 of a 616 MB flagship video costs seconds on
    this class of host, and the sample plus exact shape/dtype/params is
    ample to refuse resuming a *different* job (the failure mode guarded
    against is operator error, not adversarial collisions)."""
    import hashlib

    h = hashlib.sha256()
    h.update(repr((video.shape, str(video.dtype))).encode())
    flat = video.reshape(-1).view(np.uint8)  # view: _prep output is contiguous
    step = max(1, flat.size // (1 << 20))
    h.update(np.ascontiguousarray(flat[::step]).tobytes())
    return {
        "input": h.hexdigest(),
        "seed": int(seed),
        "guidance": float(guidance),
        "num_steps": int(pipeline.num_steps),
        "model_type": "inverse",
    }


def inverse_render(
    pipeline: DiffusionRendererPipeline,
    image,
    guidance: float = 0.0,
    seed: int = 42,
    passes: Sequence[str] = INVERSE_PASSES,
    batch_passes: bool = True,
    resume_dir: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """RGB video -> G-buffers (Cosmos1InverseRenderer equivalent,
    ref: nodes.py:130-215).

    batch_passes=True runs all requested G-buffer passes as ONE batched
    diffusion (distinct context_index per batch row) — the reference loops
    them serially (ref: nodes.py:187-213).  Returns {pass: (B*T, H, W, C)
    float32 in [0,1]}.

    resume_dir makes the job durable against preemption (the flagship
    5-pass job is ~5 minutes of chip time): each completed pass's raw
    uint8 output is written atomically to <resume_dir>/<pass>.npy, and a
    re-run with the same arguments loads finished passes from disk and
    computes only the rest.  A manifest records the job identity (input
    digest, seed, guidance, steps); resuming with a mismatched job raises
    instead of silently mixing outputs.  Forces the serial path — the
    batched variant is one all-or-nothing dispatch with nothing to resume.
    """
    pipeline.set_model_type("inverse")
    pipeline.guidance = guidance
    pipeline.seed = seed

    # All full-res math stays on the host: the pipeline uploads conditions
    # NCTHW (lane-pad-safe); an eager device NTHWC video would occupy ~42x
    # its nominal bytes (see pipeline._generate_inner).
    video = _prep_input_video(image)
    b, t, h, w, c = video.shape

    indices = [GBUFFER_INDEX_MAPPING[p] for p in passes]
    outputs: Dict[str, np.ndarray] = {}

    done: Dict[str, np.ndarray] = {}
    if resume_dir is not None:
        import json

        batch_passes = False
        fp = _job_fingerprint(video, pipeline, seed, guidance)
        os.makedirs(resume_dir, exist_ok=True)
        manifest_path = os.path.join(resume_dir, "manifest.json")
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                existing = json.load(f)
            if existing != fp:
                mismatch = [k for k in fp if existing.get(k) != fp[k]]
                raise ValueError(
                    f"resume_dir {resume_dir!r} holds a different job "
                    f"(mismatched: {mismatch}); point at a fresh directory "
                    "or delete the stale one"
                )
        else:
            tmp = manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(fp, f)
            os.replace(tmp, manifest_path)
        for p in passes:
            path = os.path.join(resume_dir, f"{p}.npy")
            if os.path.exists(path):
                done[p] = np.load(path)

    if batch_passes and len(passes) > 1:
        # One upload + ONE VAE encode for all n pass rows: the latent is
        # replicated on device (generate(batch_tile=n)); the reference
        # re-encodes the same video every pass (nodes.py:187-213).
        n = len(passes)
        vid_dev = pipeline.prepare_pixel_input(video)
        ctx = np.repeat(np.asarray(indices, np.int32), b)
        normal_mask = np.repeat(
            np.asarray([float(p == "normal") for p in passes]), b
        )
        out = pipeline.generate(
            {"rgb": vid_dev, "video": vid_dev, "context_index": ctx},
            normalize_normal=normal_mask,
            seed=seed,
            noise_tile=n,
            batch_tile=n,
        )
        from .utils.hostops import u8_to_unit_float

        unit = u8_to_unit_float(out)
        for i, p in enumerate(passes):
            outputs[p] = unit[i * b : (i + 1) * b].reshape(b * t, h, w, c)
    else:
        # One upload, 5 passes: the serial loop reads the same video per
        # pass (ref loops it too, nodes.py:187-213).
        from .utils.hostops import u8_to_unit_float
        from .utils.profiling import phase_timer

        todo = [p for p in passes if p not in done]
        raw: Dict[str, Any] = {}
        if todo:
            with phase_timer("api/upload_input"):
                vid_dev = pipeline.prepare_pixel_input(video)
            for p in todo:
                ctx = jnp.full((b,), GBUFFER_INDEX_MAPPING[p], jnp.int32)
                with phase_timer("api/generate_pass"):
                    # defer_fetch: pass p's device->host readback overlaps
                    # pass p+1's compute (dispatches are async).
                    raw[p] = pipeline.generate(
                        {"rgb": vid_dev, "video": vid_dev,
                         "context_index": ctx},
                        normalize_normal=(p == "normal"),
                        seed=seed,
                        defer_fetch=True,
                    )
        for p in passes:
            with phase_timer("api/fetch_convert_output"):
                if p in done:
                    raw_u8 = done[p]
                else:
                    raw_u8 = np.asarray(raw.pop(p))
                    if resume_dir is not None:
                        # Atomic per-pass durability: a job killed mid-write
                        # resumes from the last fully-written pass.
                        path = os.path.join(resume_dir, f"{p}.npy")
                        np.save(path + ".tmp.npy", raw_u8)
                        os.replace(path + ".tmp.npy", path)
                outputs[p] = u8_to_unit_float(raw_u8).reshape(b * t, h, w, c)
    return outputs


def forward_render(
    pipeline: DiffusionRendererPipeline,
    depth,
    normal,
    roughness,
    metallic,
    base_color,
    env_map,
    guidance: float = 0.0,
    seed: int = 42,
    env_format: str = "proj",
    env_brightness: float = 1.0,
    env_flip_horizontal: bool = False,
    env_rotation: float = 180.0,
) -> np.ndarray:
    """G-buffers + HDR environment -> relit RGB video
    (Cosmos1ForwardRenderer equivalent, ref: nodes.py:218-310).
    Returns (B*T, H, W, 3) float32 in [0,1].

    env_format: 'proj' (panorama -> cubemap -> projection, reference path),
    'proj_direct' (single-resample equirect projection), or 'ball'
    (pre-rendered chrome ball, tonemap only).
    """
    pipeline.set_model_type("forward")
    pipeline.guidance = guidance
    pipeline.seed = seed

    gbuffers = {
        "depth": depth,
        "normal": normal,
        "roughness": roughness,
        "metallic": metallic,
        "basecolor": base_color,
    }
    # Host-side prep throughout: the pipeline uploads conditions NCTHW
    # (lane-pad-safe); eager device NTHWC videos would be ~42x padded.
    # uint8 G-buffers ride the raw-upload fast path (_prep_input_video).
    from .utils.hostops import to_signed_range, u8_to_unit_float

    data_batch: Dict[str, Any] = {}
    shape = None
    for name, g in gbuffers.items():
        g5 = _prep_input_video(g)  # (ref: nodes.py:278)
        data_batch[name] = g5
        shape = g5.shape
    b, t, h, w, _ = shape
    data_batch["video"] = data_batch["depth"]  # (ref: nodes.py:281)

    # The env projection is static across frames (the reference repeats one
    # projection per frame, preprocess_envmap.py); compute ONE frame on
    # device, pull it to the host, and broadcast there.
    if env_format in ("proj", "proj_direct"):
        env = render_projection_from_panorama(
            env_map,
            resolution=(h, w),
            env_brightness=env_brightness,
            env_flip=env_flip_horizontal,
            env_rot=env_rotation,
            num_frames=1,
            mode="cubemap" if env_format == "proj" else "direct",
        )
    elif env_format == "ball":
        env = tonemap_image_direct(env_map, resolution=(h, w), num_frames=1)
    else:
        raise ValueError(f"Unknown env_format {env_format!r}")

    # env_ldr/env_log map to [-1,1]; env_nrm is the raw direction field
    # (NOT rescaled) (ref: nodes.py:298-304).
    env_ldr = to_signed_range(np.asarray(env["env_ldr"], np.float32)[0])
    env_log = to_signed_range(np.asarray(env["env_log"], np.float32)[0])
    env_nrm = np.asarray(latlong_vec(h, w), np.float32)

    # Single-frame (B, 1, H, W, 3): the env projections are constant per
    # frame, so the time broadcast happens ON DEVICE inside the condition
    # encode (pipeline._prepare_latent_conditions) — the reference expands
    # on the host (nodes.py:298-304), which here would cost 3 extra full-res
    # uploads (~1.9 GiB) that tipped the flagship forward job over HBM.
    def bc(x):
        return np.broadcast_to(x[None, None], (b, 1, h, w, 3))

    data_batch["env_ldr"] = bc(env_ldr)
    data_batch["env_log"] = bc(env_log)
    data_batch["env_nrm"] = bc(env_nrm)

    out = pipeline.generate(data_batch, seed=seed)
    return u8_to_unit_float(out).reshape(b * t, h, w, 3)


def load_hdr(path: str) -> np.ndarray:
    """LoadHDRImage equivalent (ref: nodes.py:312-332): (1, H, W, 3) float32,
    values may exceed 1."""
    return load_hdr_image(path)
