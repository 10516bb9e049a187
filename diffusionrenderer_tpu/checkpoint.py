"""Checkpoint I/O: torch/safetensors -> JAX pytree conversion + orbax native.

The production Cosmos DiffusionRenderer checkpoint is a torch state dict for
CleanDiffusionRendererModel (ref: nodes.py:98-110, loaded with strict=True).
Its parameter names are determined by the reference module tree
(/root/reference/CleanGeneralDIT.py, model_diffusion_renderer.py:99-117):

    net.x_embedder.proj.1.weight                 (D, patch_dim)
    net.t_embedder.1.linear_1.weight             (D, D)
    net.t_embedder.1.linear_2.weight             (3D, D)
    net.affline_norm.weight                      (D,)
    net.context_embedding.weight                 (16, 1024)   [inverse only]
    net.blocks.block{i}.blocks.{j}.adaLN_modulation.1.weight  (r, D)
    net.blocks.block{i}.blocks.{j}.adaLN_modulation.2.weight  (kD, r)
    net.blocks.block{i}.blocks.{0|1}.block.attn.to_{q,k,v}.0.weight
    net.blocks.block{i}.blocks.{0|1}.block.attn.to_{q,k}.1.weight   (head_dim,)
    net.blocks.block{i}.blocks.{0|1}.block.attn.to_out.0.weight
    net.blocks.block{i}.blocks.2.block.layer{1,2}.weight
    net.final_layer.adaLN_modulation.{1,2}.weight
    net.final_layer.linear.weight                (p_out, D)
    logvar.0.freqs / logvar.0.phases / logvar.1.weight   [training-time logvar
        head, discarded — ref: model_diffusion_renderer.py:9-14,114-117]

Conversion rules:
* torch Linear weights are (out, in); we store (in, out) for `x @ W`;
* the 28 per-block tensors are STACKED along a new leading axis so the DiT
  runs them under `lax.scan`;
* strict coverage both ways, the JAX equivalent of load_state_dict(strict=True)
  (ref: nodes.py:110) — unexpected or missing keys raise.

Native checkpoints (our own format) go through orbax with sharding-aware
restore.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .config import DiTConfig

Params = Dict[str, Any]

_SUB_NAMES = ("fa", "ca", "mlp")


def _np(x) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (host, fp32-preserving)."""
    if isinstance(x, np.ndarray):
        return x
    # torch tensor without importing torch at module scope.
    if hasattr(x, "detach"):
        x = x.detach()
        if x.dtype is not None and str(x.dtype) == "torch.bfloat16":
            x = x.float()
        return x.cpu().numpy()
    return np.asarray(x)


def convert_dit_state_dict(
    state_dict: Mapping[str, Any],
    cfg: DiTConfig,
    dtype: jnp.dtype = jnp.bfloat16,
    prefix: str = "net.",
    quantize_int8: bool = False,
    act_quant: bool = False,
    group_size=None,
    keep_bf16=(),
    mse_clip: bool = False,
    hadamard: bool = False,
) -> Params:
    """Convert a reference-format torch state dict into our DiT pytree.

    Raises KeyError on missing parameters and ValueError on unconsumed ones
    (strict in both directions).

    quantize_int8=True quantizes the stacked per-block matmul weights to
    int8 ON THE HOST (numpy) before device placement — the single-chip
    deployment path for the 7B model (models/quant.py); act_quant=True
    additionally marks them for runtime int8 activation quantization (W8A8,
    the MXU's 2x-throughput int8 path).  group_size selects per-group weight
    scales (the accuracy-preserving int8 mode); keep_bf16 names matmuls
    ("wo", "w2", or "mlp.w2" forms) left unquantized.
    """
    sd = {k: v for k, v in state_dict.items()}
    consumed = set()

    def take(name: str) -> np.ndarray:
        full = prefix + name
        if full not in sd:
            raise KeyError(f"Checkpoint missing parameter: {full}")
        consumed.add(full)
        return _np(sd[full])

    def linear(name: str) -> np.ndarray:
        return take(name).T  # (out, in) -> (in, out)

    nb = cfg.num_blocks

    def stack_linear(fmt: str) -> jnp.ndarray:
        return jnp.asarray(
            np.stack([take(fmt.format(i=i)).T for i in range(nb)]), dtype
        )

    keep = set(keep_bf16)

    def stack_matmul(fmt: str, qname: str = ""):
        """Big matmul weights: optionally host-quantized to int8.
        qname is the "sub.name" id checked against keep_bf16."""
        stacked = np.stack([take(fmt.format(i=i)).T for i in range(nb)])
        name = qname.split(".")[-1]
        if quantize_int8 and not (name in keep or qname in keep):
            from .models.quant import quantize_tensor_host

            return quantize_tensor_host(stacked, act_quant=act_quant,
                                        group_size=group_size,
                                        mse_clip=mse_clip,
                                        hadamard=hadamard)
        return jnp.asarray(stacked, dtype)

    def stack_vec(fmt: str) -> jnp.ndarray:
        return jnp.asarray(
            np.stack([take(fmt.format(i=i)) for i in range(nb)]), dtype
        )

    def attn_sub(j: int, ctx_in: bool) -> Params:
        base = f"blocks.block{{i}}.blocks.{j}."
        sub = "fa" if j == 0 else "ca"
        return {
            "adaln_w1": stack_linear(base + "adaLN_modulation.1.weight"),
            "adaln_w2": stack_linear(base + "adaLN_modulation.2.weight"),
            "wq": stack_matmul(base + "block.attn.to_q.0.weight", f"{sub}.wq"),
            "wk": stack_matmul(base + "block.attn.to_k.0.weight", f"{sub}.wk"),
            "wv": stack_matmul(base + "block.attn.to_v.0.weight", f"{sub}.wv"),
            "wo": stack_matmul(base + "block.attn.to_out.0.weight", f"{sub}.wo"),
            "q_norm": stack_vec(base + "block.attn.to_q.1.weight"),
            "k_norm": stack_vec(base + "block.attn.to_k.1.weight"),
        }

    params: Params = {
        "x_embedder": {
            "weight": jnp.asarray(linear("x_embedder.proj.1.weight"), dtype)
        },
        "t_embedder": {
            "w1": jnp.asarray(linear("t_embedder.1.linear_1.weight"), dtype),
            "w2": jnp.asarray(linear("t_embedder.1.linear_2.weight"), dtype),
        },
        "affline_norm": {
            "weight": jnp.asarray(take("affline_norm.weight"), dtype)
        },
        "blocks": {
            "fa": attn_sub(0, ctx_in=False),
            "ca": attn_sub(1, ctx_in=True),
            "mlp": {
                "adaln_w1": stack_linear(
                    "blocks.block{i}.blocks.2.adaLN_modulation.1.weight"
                ),
                "adaln_w2": stack_linear(
                    "blocks.block{i}.blocks.2.adaLN_modulation.2.weight"
                ),
                "w1": stack_matmul("blocks.block{i}.blocks.2.block.layer1.weight", "mlp.w1"),
                "w2": stack_matmul("blocks.block{i}.blocks.2.block.layer2.weight", "mlp.w2"),
            },
        },
        "final": {
            "adaln_w1": jnp.asarray(
                linear("final_layer.adaLN_modulation.1.weight"), dtype
            ),
            "adaln_w2": jnp.asarray(
                linear("final_layer.adaLN_modulation.2.weight"), dtype
            ),
            "linear": jnp.asarray(linear("final_layer.linear.weight"), dtype),
        },
    }
    if cfg.patch_embed_bias:
        params["x_embedder"]["bias"] = jnp.asarray(
            take("x_embedder.proj.1.bias"), dtype
        )
    if cfg.use_context_embedding:
        params["context_embedding"] = {
            "weight": jnp.asarray(take("context_embedding.weight"), dtype)
        }

    # Training-time logvar head: present in the checkpoint, unused at
    # inference (ref: model_diffusion_renderer.py:9-14,114-117).  The RoPE
    # position buffer is a persistent arange(max(512, head_dim)) table — pure
    # derived data, recomputed on our side (ref: CleanGeneralDIT.py:91).
    for k in list(sd):
        if k.startswith("logvar.") or k == prefix + "pos_embedder.seq":
            consumed.add(k)

    leftovers = set(sd) - consumed
    if leftovers:
        raise ValueError(
            f"Unconsumed checkpoint parameters ({len(leftovers)}): "
            f"{sorted(leftovers)[:8]}..."
        )
    return params


def export_dit_state_dict(params: Params, cfg: DiTConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_dit_state_dict (JAX pytree -> reference-named
    numpy state dict), used for round-trip testing and interop export."""
    if isinstance(params.get("blocks"), (tuple, list)):
        raise ValueError(
            "export_dit_state_dict: '_mixN' segmented (mixed-precision) "
            "params cannot be exported to the reference torch layout — "
            "export the unquantized source checkpoint instead")
    out: Dict[str, np.ndarray] = {}

    def put(name: str, arr, transpose=True):
        a = np.asarray(jnp.asarray(arr, jnp.float32))
        # ascontiguousarray: safetensors' save_file serializes the raw
        # buffer, so a strided .T view would export transposed-content
        # garbage (caught by test_cli.py::test_convert_to_native_and_load).
        out["net." + name] = np.ascontiguousarray(a.T) if transpose else a

    put("x_embedder.proj.1.weight", params["x_embedder"]["weight"])
    if "bias" in params["x_embedder"]:
        put("x_embedder.proj.1.bias", params["x_embedder"]["bias"], False)
    put("t_embedder.1.linear_1.weight", params["t_embedder"]["w1"])
    put("t_embedder.1.linear_2.weight", params["t_embedder"]["w2"])
    put("affline_norm.weight", params["affline_norm"]["weight"], False)
    if "context_embedding" in params:
        put("context_embedding.weight", params["context_embedding"]["weight"], False)

    for j, sub in enumerate(_SUB_NAMES):
        bp = params["blocks"][sub]
        for i in range(cfg.num_blocks):
            base = f"blocks.block{i}.blocks.{j}."
            put(base + "adaLN_modulation.1.weight", bp["adaln_w1"][i])
            put(base + "adaLN_modulation.2.weight", bp["adaln_w2"][i])
            if sub == "mlp":
                put(base + "block.layer1.weight", bp["w1"][i])
                put(base + "block.layer2.weight", bp["w2"][i])
            else:
                put(base + "block.attn.to_q.0.weight", bp["wq"][i])
                put(base + "block.attn.to_k.0.weight", bp["wk"][i])
                put(base + "block.attn.to_v.0.weight", bp["wv"][i])
                put(base + "block.attn.to_out.0.weight", bp["wo"][i])
                put(base + "block.attn.to_q.1.weight", bp["q_norm"][i], False)
                put(base + "block.attn.to_k.1.weight", bp["k_norm"][i], False)

    put("final_layer.adaLN_modulation.1.weight", params["final"]["adaln_w1"])
    put("final_layer.adaLN_modulation.2.weight", params["final"]["adaln_w2"])
    put("final_layer.linear.weight", params["final"]["linear"])
    return out


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt / .pth / .safetensors checkpoint to host numpy arrays.

    Mirrors comfy.utils.load_torch_file(safe_load=True) semantics including
    the optional {"model": ...} unwrap (ref: nodes.py:98-101).
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = dict(load_file(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
        sd = {k: _np(v) for k, v in sd.items()}
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return sd


def is_native_checkpoint(path: str) -> bool:
    """True if `path` is an orbax checkpoint directory written by
    save_native (detected by orbax's own metadata files)."""
    return os.path.isdir(path) and any(
        os.path.exists(os.path.join(path, marker))
        for marker in ("_CHECKPOINT_METADATA", "manifest.ocdbt")
    )


def load_dit_checkpoint(
    path: str,
    cfg: DiTConfig,
    dtype: jnp.dtype = jnp.bfloat16,
    quantize_int8: bool = False,
    act_quant: bool = False,
    group_size=None,
    keep_bf16=(),
    mse_clip: bool = False,
    hadamard: bool = False,
) -> Params:
    """Load a DiT checkpoint from disk.

    Torch `.pt`/safetensors files are converted (and optionally quantized)
    on load; a native orbax directory (produced by `save_native` / the CLI
    `convert` subcommand) restores directly — the convert-once path, so
    serving starts skip the torch parse + transpose + host quantization.
    Quantization flags are ignored for native checkpoints: the saved pytree
    self-describes (int8 'q' + scale leaves)."""
    if is_native_checkpoint(path):
        return restore_native(path)
    return convert_dit_state_dict(
        load_torch_file(path), cfg, dtype, quantize_int8=quantize_int8,
        act_quant=act_quant, group_size=group_size, keep_bf16=keep_bf16,
        mse_clip=mse_clip, hadamard=hadamard,
    )


# ---------------------------------------------------------------------------
# Native (orbax) checkpoints — sharded save/restore for our own pytrees.
# ---------------------------------------------------------------------------

def save_native(path: str, params: Params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, params, force=True)
    ckpt.wait_until_finished()


def restore_native(path: str, like: Params | None = None) -> Params:
    """Restore an orbax checkpoint; if `like` is given (abstract arrays with
    shardings), the restore places shards directly on the mesh."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None)),
            like,
        )
        return ckpt.restore(path, abstract)
    return ckpt.restore(path)
