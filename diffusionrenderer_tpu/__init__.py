"""diffusionrenderer_tpu — TPU-native NVIDIA Cosmos DiffusionRenderer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
eggsbenedicto/DiffusionRenderer-ComfyUI reference package: inverse rendering
(RGB video -> G-buffers) and forward rendering / relighting (G-buffers + HDR
environment -> RGB video) with the 7B GeneralDIT video diffusion transformer
and the Cosmos CV8x8x8 causal video tokenizer.
"""

from .config import (
    GBUFFER_INDEX_MAPPING,
    DiTConfig,
    RendererConfig,
    SchedulerConfig,
    VAEConfig,
    get_config_by_model_type,
    get_config_from_tensor_shape,
    get_forward_renderer_config,
    get_inverse_renderer_config,
    get_preset_config,
    validate_config,
)
from .pipeline import DiffusionRendererPipeline

__version__ = "0.1.0"


def __getattr__(name):
    # ComfyUI discovers plugins by reading NODE_CLASS_MAPPINGS off the
    # package (ref: __init__.py:1-3 re-exporting nodes.py:335-347).  Lazy so
    # library users never pay for the node layer (or torch) on import.
    if name in ("NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"):
        from . import comfy_nodes

        return getattr(comfy_nodes, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
