"""Drop-in ComfyUI node surface over the TPU framework.

The reference package IS a ComfyUI plugin: four node classes registered via
NODE_CLASS_MAPPINGS (ref: nodes.py:335-347).  This module reproduces that
exact plugin surface — same node names, INPUT_TYPES, RETURN_TYPES/NAMES,
FUNCTION and CATEGORY — on top of the plain-function `api` layer, so an
existing reference workflow graph loads unchanged against the TPU backend.

ComfyUI conventions honored here (all visible in ref nodes.py):
  * IMAGE values are torch float tensors in [0, 1], channels last;
    3D (H,W,C) / 4D (B,H,W,C) / 5D (B,T,H,W,C) and lists are coerced the
    same way the reference coerces them (ref: nodes.py:154-179).
  * The loader resolves checkpoints through `folder_paths` when running
    inside ComfyUI; standalone (no ComfyUI install) it accepts plain paths,
    so the node layer is testable here without the host app.
  * HDR env maps flow between nodes as IMAGE tensors whose values may
    exceed 1 (ref LoadHDRImage, nodes.py:312-332).

torch is only needed at call time (ComfyUI always has it); importing this
module costs nothing extra for library users.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from . import api

try:  # Inside ComfyUI these exist; standalone they don't.
    import folder_paths  # type: ignore

    _HAS_COMFY = True
except Exception:  # pragma: no cover - exercised implicitly in this env
    folder_paths = None  # type: ignore
    _HAS_COMFY = False

# Deployment quant modes exposed on the loader node (shared grammar with the
# CLI / bench surfaces via models.quant.parse_quant_mode; the measured
# accuracy/speed ladder for each is in BASELINE.md).  "bf16" matches the
# reference's lossless default (ref: nodes.py:76) and needs TP>=2 chips at
# the 7B flagship; "w8a8" is the recommended single-chip speed mode.
QUANT_MODES = (
    "bf16",
    "w8a8",
    "w8",
    "w8a8_g128",
    "w8a8_g32",
    "w8_g32_keepres_keepattn",
)


def _torch():
    import torch

    return torch


def _coerce_5d_torch(value: Any, name: str) -> "Any":
    """List/3D/4D/5D IMAGE input -> 5D (B,T,H,W,C) torch tensor, with the
    reference's exact fallbacks (ref: nodes.py:156-179)."""
    torch = _torch()
    if isinstance(value, list):
        try:
            return torch.stack(value, dim=0)
        except Exception:
            # Ragged list: the reference processes the first item only.
            return value[0].unsqueeze(0)
    if isinstance(value, torch.Tensor):
        if value.ndim == 3:
            return value.unsqueeze(0).unsqueeze(0)
        if value.ndim == 4:
            return value.unsqueeze(1)
        if value.ndim == 5:
            return value
        raise ValueError(
            f"Unsupported tensor dimension for {name!r}: {value.ndim}. "
            "Expected 3D, 4D, or 5D."
        )
    raise TypeError(
        f"Unsupported input type for {name!r}: {type(value)}. "
        "Expected torch.Tensor or list of Tensors."
    )


def _to_numpy(value: Any, name: str) -> np.ndarray:
    """IMAGE input -> host float32 (B,T,H,W,C) numpy, zero-copy when the
    torch tensor is already contiguous fp32 on CPU."""
    t = _coerce_5d_torch(value, name).detach()
    if t.device.type != "cpu":
        t = t.cpu()
    return t.float().contiguous().numpy()


def _from_numpy(arr: np.ndarray):
    """api output (frames, H, W, C) float32 in [0,1] -> ComfyUI IMAGE."""
    return _torch().from_numpy(np.ascontiguousarray(arr, np.float32))


class LoadDiffusionRendererModel:
    """Loader node (ref: nodes.py:61-127).

    Inside ComfyUI: `model` is a filename from models/diffusion_models and
    the VAE is found at models/vae/Cosmos-1.0-Tokenizer-CV8x8x8/vae exactly
    like the reference (ref: nodes.py:80-91).  Standalone: `model` and
    `vae_path` are plain paths (torch/safetensors checkpoints are converted
    on load; native orbax dirs from `cli convert` boot directly).
    """

    @classmethod
    def INPUT_TYPES(cls):
        if _HAS_COMFY:
            model_spec = (
                folder_paths.get_filename_list("diffusion_models"),
                {"tooltip":
                 "Models are loaded from 'ComfyUI/models/diffusion_models'"},
            )
        else:
            model_spec = ("STRING", {
                "tooltip": "Path to a DiT checkpoint "
                           "(.safetensors/.pt or native orbax dir)"})
        return {
            "required": {"model": model_spec},
            "optional": {
                "quant_mode": (list(QUANT_MODES), {"default": "w8a8"}),
                "vae_path": ("STRING", {"default": ""}),
            },
        }

    RETURN_TYPES = ("DIFFUSION_RENDERER_PIPELINE",)
    FUNCTION = "load_pipeline"
    CATEGORY = "Cosmos1"

    def load_pipeline(self, model: str, quant_mode: str = "w8a8",
                      vae_path: str = ""):
        dit_path = model
        if _HAS_COMFY:
            resolved = folder_paths.get_full_path("diffusion_models", model)
            if resolved is not None:
                dit_path = resolved
            if not vae_path:
                vae_path = os.path.join(
                    folder_paths.models_dir, "vae",
                    "Cosmos-1.0-Tokenizer-CV8x8x8", "vae",
                )
        kwargs: Dict[str, Any] = {}
        if quant_mode != "bf16":
            from .models.quant import parse_quant_mode

            qm = parse_quant_mode(quant_mode)
            if qm.needs_calibration:
                raise ValueError(
                    f"quant mode {quant_mode!r} needs calibration stats — "
                    "convert the checkpoint offline with the CLI and load "
                    "the native checkpoint instead")
            kwargs.update(quantize_int8=True, act_quant=qm.act_quant,
                          quant_group_size=qm.group_size,
                          quant_keep_bf16=qm.keep,
                          quant_mse_clip=qm.mse_clip,
                          quant_hadamard=qm.hadamard)
        # Defaults guidance=0.0 / num_steps=15 / seed=42 (ref: nodes.py:123-
        # 125); per-run guidance/seed are set by the renderer nodes below.
        pipeline = api.load_pipeline(
            dit_checkpoint=dit_path,
            vae_checkpoint=vae_path or None,
            model_type="inverse",
            guidance=0.0,
            num_steps=15,
            seed=42,
            **kwargs,
        )
        return (pipeline,)


class Cosmos1InverseRenderer:
    """RGB video -> 5 G-buffers (ref: nodes.py:130-215).

    Unlike the reference's serial 5-pass loop, the passes run as ONE
    batched diffusion with distinct context_index rows (api.inverse_render
    batch_passes) — same outputs, one VAE encode, one dispatch.
    """

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "pipeline": ("DIFFUSION_RENDERER_PIPELINE",),
                "image": ("IMAGE",),
            },
            "optional": {
                "guidance": ("FLOAT",
                             {"default": 0.0, "min": 0.0, "max": 10.0,
                              "step": 0.1}),
                "seed": ("INT", {"default": 42, "min": 0,
                                 "max": 0xFFFFFFFFFFFFFFFF}),
            },
        }

    RETURN_TYPES = ("IMAGE", "IMAGE", "IMAGE", "IMAGE", "IMAGE")
    RETURN_NAMES = ("base_color", "metallic", "roughness", "normal", "depth")
    FUNCTION = "run_inverse_pass"
    CATEGORY = "Cosmos1"

    def run_inverse_pass(self, pipeline, image, guidance: float = 0.0,
                         seed: int = 42):
        video = _to_numpy(image, "image")
        outputs = api.inverse_render(
            pipeline, video, guidance=guidance, seed=seed
        )
        return tuple(
            _from_numpy(outputs[p]) for p in api.INVERSE_PASSES
        )


class Cosmos1ForwardRenderer:
    """G-buffers + HDR env map -> relit RGB video (ref: nodes.py:218-310)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "pipeline": ("DIFFUSION_RENDERER_PIPELINE",),
                "depth": ("IMAGE",),
                "normal": ("IMAGE",),
                "roughness": ("IMAGE",),
                "metallic": ("IMAGE",),
                "base_color": ("IMAGE",),
                "env_map": ("IMAGE",),
            },
            "optional": {
                "guidance": ("FLOAT", {"default": 0.0, "min": 0.0,
                                       "max": 2.0, "step": 0.1}),
                "seed": ("INT", {"default": 42, "min": 0,
                                 "max": 0xFFFFFFFFFFFFFFFF}),
                "env_format": (["proj", "proj_direct", "ball"],
                               {"default": "proj"}),
                "env_brightness": ("FLOAT", {"default": 1.0, "min": 0.0,
                                             "max": 2.0, "step": 0.1}),
                "env_flip_horizontal": ("BOOLEAN", {"default": False}),
                "env_rotation": ("FLOAT", {"default": 180.0, "min": 0,
                                           "max": 360, "step": 1.0}),
            },
        }

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "run_forward_pass"
    CATEGORY = "Cosmos1"

    def run_forward_pass(self, pipeline, depth, normal, roughness, metallic,
                         base_color, env_map, guidance: float = 0.0,
                         seed: int = 42, env_format: str = "proj",
                         env_brightness: float = 1.0,
                         env_flip_horizontal: bool = False,
                         env_rotation: float = 180.0):
        torch = _torch()
        env = env_map
        if isinstance(env, torch.Tensor):
            # HDR panorama as an IMAGE tensor (values may exceed 1);
            # envmap._load_env_input takes (H,W,C) or (1,H,W,C) numpy.
            env = env.detach().cpu().float().numpy()
        out = api.forward_render(
            pipeline,
            depth=_to_numpy(depth, "depth"),
            normal=_to_numpy(normal, "normal"),
            roughness=_to_numpy(roughness, "roughness"),
            metallic=_to_numpy(metallic, "metallic"),
            base_color=_to_numpy(base_color, "base_color"),
            env_map=env,
            guidance=guidance,
            seed=seed,
            env_format=env_format,
            env_brightness=env_brightness,
            env_flip_horizontal=env_flip_horizontal,
            env_rotation=env_rotation,
        )
        return (_from_numpy(out),)


class LoadHDRImage:
    """Load a .hdr/.exr/.pfm file as an IMAGE whose values may exceed 1
    (ref: nodes.py:312-332; decoding via io.py's 3-tier loader, which
    includes the first-party C++ codecs)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "path": ("STRING",
                         {"tooltip": "Path to HDR image (.hdr, .exr)"}),
            }
        }

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "load_hdr"
    CATEGORY = "Cosmos1"

    def load_hdr(self, path: str):
        return (_from_numpy(api.load_hdr(path)),)


NODE_CLASS_MAPPINGS = {
    "LoadDiffusionRendererModel": LoadDiffusionRendererModel,
    "Cosmos1InverseRenderer": Cosmos1InverseRenderer,
    "Cosmos1ForwardRenderer": Cosmos1ForwardRenderer,
    "LoadHDRImage": LoadHDRImage,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "LoadDiffusionRendererModel": "Load Diffusion Renderer Model (TPU)",
    "Cosmos1InverseRenderer": "Cosmos1 Inverse Renderer (TPU)",
    "Cosmos1ForwardRenderer": "Cosmos1 Forward Renderer (TPU)",
    "LoadHDRImage": "Load HDR Image (TPU)",
}
