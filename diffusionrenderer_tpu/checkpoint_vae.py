"""VAE checkpoint I/O.

Two formats:

1. **Native** — a flat safetensors file of this framework's own parameter
   tree (keys are '/'-joined pytree paths).  Round-trips exactly.
2. **Diffusers AutoencoderKLCosmos** — the Cosmos-1.0-Tokenizer-CV8x8x8
   directory the reference loads via from_pretrained (ref: CleanVAE.py:18).
   Conversion maps the torch conv weights (Cout, Cin, kt, kh, kw) to our
   DHWIO layout and walks the block structure.  The mapping is strict: any
   unmatched key raises with the full diff so drift against a real
   checkpoint is loud, mirroring the reference's strict load contract
   (ref: nodes.py:110).

latents_mean/std come from the config JSON in the same directory
(VAE_config.json:21-535) via models.vae.load_latent_stats.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .config import VAEConfig
from .models.vae import init_vae_params, load_latent_stats

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Native flat format
# ---------------------------------------------------------------------------

def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Params:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_vae_native(path: str, params: Params) -> None:
    from safetensors.numpy import save_file

    flat = {
        k: np.asarray(jnp.asarray(v, jnp.float32))
        for k, v in _flatten(params).items()
    }
    save_file(flat, path)


def load_vae_native(path: str, dtype: jnp.dtype = jnp.bfloat16) -> Params:
    from safetensors.numpy import load_file

    flat = load_file(path)
    params = _unflatten(flat)

    def cast(x):
        x = jnp.asarray(x)
        # Keep norm/stat parameters fp32; weights in the requested dtype.
        return x if x.ndim <= 1 else x.astype(dtype)

    return jax.tree.map(cast, params)


# ---------------------------------------------------------------------------
# Diffusers conversion
# ---------------------------------------------------------------------------

def _t_conv(w: np.ndarray) -> np.ndarray:
    """(Cout, Cin, kt, kh, kw) -> (kt, kh, kw, Cin, Cout)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def convert_diffusers_vae_state_dict(
    sd: Mapping[str, Any], cfg: VAEConfig, dtype: jnp.dtype = jnp.bfloat16
) -> Params:
    """Convert a diffusers AutoencoderKLCosmos state dict to our pytree.

    Key map validated end-to-end against the torch restatement of the
    diffusers module tree (tests/torch_vae_oracle.py + tests/test_vae_parity.py):
    factorized convs are `<conv>.conv_s` / `<conv>.conv_t`
    (CosmosConvProjection3d), norms nest a GroupNorm as `<norm>.norm`,
    hybrid down/upsamplers expose conv1/conv2/conv3, mid-block attention is
    diffusers Attention (group_norm / to_q / to_k / to_v / to_out.0).
    Strict: raises listing unmatched keys (the JAX analog of the reference's
    load_state_dict(strict=True), ref: nodes.py:110).
    """
    sd = {k: np.asarray(v.float().numpy() if hasattr(v, "float") else v)
          for k, v in sd.items()}
    params = init_vae_params(jax.random.key(0), cfg, dtype)
    consumed = set()

    def take(key):
        if key not in sd:
            raise KeyError(f"diffusers VAE checkpoint missing: {key}")
        consumed.add(key)
        return sd[key]

    def conv(dst, key):
        w = take(key + ".weight")
        dst["w"] = jnp.asarray(_t_conv(w), dtype)
        dst["b"] = jnp.asarray(take(key + ".bias"), dtype)

    def conv_proj(dst, key):
        conv(dst["conv_s"], key + ".conv_s")
        conv(dst["conv_t"], key + ".conv_t")

    def norm(dst, key):
        dst["scale"] = jnp.asarray(take(key + ".norm.weight"), jnp.float32)
        dst["bias"] = jnp.asarray(take(key + ".norm.bias"), jnp.float32)

    def resblock(dst, key):
        norm(dst["norm1"], key + ".norm1")
        conv_proj(dst["conv1"], key + ".conv1")
        norm(dst["norm2"], key + ".norm2")
        conv_proj(dst["conv2"], key + ".conv2")
        if "shortcut" in dst:
            conv(dst["shortcut"], key + ".conv_shortcut")

    def sampler(dst, key):
        conv(dst["conv1"], key + ".conv1")
        conv(dst["conv2"], key + ".conv2")
        conv(dst["conv3"], key + ".conv3")

    def attn(dst, key):
        dst["norm"]["scale"] = jnp.asarray(
            take(key + ".group_norm.weight"), jnp.float32)
        dst["norm"]["bias"] = jnp.asarray(
            take(key + ".group_norm.bias"), jnp.float32)
        for ours, theirs in (("wq", "to_q"), ("wk", "to_k"),
                             ("wv", "to_v"), ("wo", "to_out.0")):
            w = take(f"{key}.{theirs}.weight")
            dst[ours]["w"] = jnp.asarray(w.T, dtype)
            dst[ours]["b"] = jnp.asarray(take(f"{key}.{theirs}.bias"), dtype)

    for side in ("encoder", "decoder"):
        p = params[side]
        conv_proj(p["conv_in"], f"{side}.conv_in")
        conv_proj(p["conv_out"], f"{side}.conv_out")
        norm(p["norm_out"], f"{side}.norm_out")
        blocks_name = "down_blocks" if side == "encoder" else "up_blocks"
        for li, level in enumerate(p["levels"]):
            for ri, rb in enumerate(level["resblocks"]):
                resblock(rb, f"{side}.{blocks_name}.{li}.resnets.{ri}")
            if "downsample" in level:
                sampler(level["downsample"],
                        f"{side}.{blocks_name}.{li}.downsamplers.0")
            if "upsample" in level:
                sampler(level["upsample"],
                        f"{side}.{blocks_name}.{li}.upsamplers.0")
        mid = p["mid"]
        resblock(mid["res1"], f"{side}.mid_block.resnets.0")
        resblock(mid["res2"], f"{side}.mid_block.resnets.1")
        attn(mid["attn_s"], f"{side}.mid_block.attentions.0")
        attn(mid["attn_t"], f"{side}.mid_block.temp_attentions.0")

    leftovers = sorted(set(sd) - consumed)
    if leftovers:
        raise ValueError(
            f"Unconsumed diffusers VAE keys ({len(leftovers)}): {leftovers[:10]}..."
        )
    return params


def load_vae_checkpoint(
    path: str, cfg: VAEConfig, dtype: jnp.dtype = jnp.bfloat16
) -> Params:
    """Load a VAE checkpoint — orbax native directory, native flat file,
    diffusers directory, or diffusers safetensors file."""
    from .checkpoint import is_native_checkpoint, restore_native

    if is_native_checkpoint(path):
        return restore_native(path)
    if os.path.isdir(path):
        import json

        weight_file = None
        for name in (
            "diffusion_pytorch_model.safetensors",
            "model.safetensors",
        ):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                weight_file = cand
                break
        if weight_file is None:
            raise FileNotFoundError(f"No weights found under {path}")
        from safetensors.numpy import load_file

        params = convert_diffusers_vae_state_dict(load_file(weight_file), cfg, dtype)
        cfg_json = os.path.join(path, "config.json")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                vc = json.load(f)
            if "latents_mean" in vc:
                params = load_latent_stats(
                    params, vc["latents_mean"], vc["latents_std"], cfg
                )
        return params

    from safetensors.numpy import load_file

    flat = load_file(path)
    if any("/" in k for k in flat):
        return load_vae_native(path, dtype)
    return convert_diffusers_vae_state_dict(flat, cfg, dtype)
