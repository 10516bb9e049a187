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

# The flagship Cosmos-1.0-Tokenizer-CV8x8x8 architecture (VAE_config.json),
# i.e. the only checkpoint family whose latent statistics we ship.
_FLAGSHIP_ENC_CHANNELS = (128, 256, 512, 512)


def bundled_latent_stats() -> Dict[str, Any]:
    """The shipped per-(channel, latent-frame) CV8x8x8 latent statistics.

    Constant model metadata (256 mean + 256 std entries) from the published
    diffusers config (ref: VAE_config.json:21-535), bundled in-package so a
    production pipeline never depends on the user's checkpoint directory
    carrying a config.json."""
    import json

    path = os.path.join(
        os.path.dirname(__file__), "data", "cosmos_cv8x8x8_latent_stats.json"
    )
    with open(path) as f:
        return json.load(f)


def _is_flagship_vae(cfg: VAEConfig) -> bool:
    return (
        cfg.latent_channels == 16
        and cfg.max_latent_frames == 16
        and tuple(cfg.encoder_block_out_channels) == _FLAGSHIP_ENC_CHANNELS
    )


def ensure_latent_stats(params: Params, cfg: VAEConfig) -> Params:
    """Install the bundled CV8x8x8 stats when a flagship-config load left
    them identity (missing or stats-less config.json).

    Identity stats silently produce wrong latents — the one failure mode the
    strict key converter cannot catch, since latents_mean/std live in the
    config JSON, not the state dict.  Non-flagship (scaled test) configs
    pass through untouched: we have no table for them and identity is the
    correct default for random-init models."""
    if not _is_flagship_vae(cfg):
        return params
    mean = np.asarray(params.get("latents_mean"))
    std = np.asarray(params.get("latents_std"))
    if not (np.all(mean == 0.0) and np.all(std == 1.0)):
        return params  # real stats already installed
    from .utils.profiling import logger

    logger.info(
        "VAE checkpoint carried no latents_mean/std; installing the "
        "bundled CV8x8x8 statistics table"
    )
    stats = bundled_latent_stats()
    return load_latent_stats(
        params, stats["latents_mean"], stats["latents_std"], cfg
    )


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
        # CosmosCausalGroupNorm key convention (VAEConfig.norm_nesting):
        # 'nested' = the GroupNorm lives at '<mod>.norm.*'; 'flat' = the
        # affine params sit directly on the module.
        nested = cfg.norm_nesting == "nested"
        want = f"{key}{'.norm' if nested else ''}.weight"
        other = f"{key}{'' if nested else '.norm'}.weight"
        if want not in sd and other in sd:
            raise KeyError(
                f"checkpoint has {other!r} where norm_nesting="
                f"{cfg.norm_nesting!r} expects {want!r} — this checkpoint "
                f"uses the {'flat' if nested else 'nested'!r} convention; "
                f"pass VAEConfig(norm_nesting="
                f"{'flat' if nested else 'nested'!r})"
            )
        infix = ".norm" if nested else ""
        dst["scale"] = jnp.asarray(take(f"{key}{infix}.weight"), jnp.float32)
        dst["bias"] = jnp.asarray(take(f"{key}{infix}.bias"), jnp.float32)

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


class VAECalibrationError(ValueError):
    """A convert-time VAE convention check failed (see the VAEConfig
    dwt_rescale / norm_nesting / stats_location switches)."""


def calibrate_vae_conventions(
    params: Params,
    cfg: VAEConfig,
    *,
    tol: float = 0.15,
    size: int = 64,
    encode_fn=None,
    decode_fn=None,
) -> Dict[str, float]:
    """Convert-time convention calibration against a REAL (trained)
    checkpoint: encode->decode of constant frames must reproduce them.

    A trained autoencoder reconstructs constants near-exactly (DC gain ~1).
    The conventions this framework reconstructed from the diffusers config
    rather than observed (NOTES.md item 1) each break that invariant
    measurably when wrong:

    * dwt_rescale — a per-level scale mismatch multiplies the patcher
      output 8x (two levels of sqrt8) relative to what the trained conv_in
      weights expect, and the synthesis side divides the decoder output the
      same way: the reconstruction's DC gain lands far from 1;
    * stats_location — stats applied in the wrong place feed the decoder
      un-normalized (or doubly-normalized) latents: constant frames come
      back shifted/scaled per channel;
    * norm_nesting — caught earlier, at key-mapping time (strict converter).

    Returns {input_value: mean_abs_error} on success; raises
    VAECalibrationError naming the suspect switch otherwise.  Only
    meaningful for trained weights — random-init models fail by design
    (the CLI skips calibration for --tiny converts).

    encode_fn/decode_fn override the bound vae_encode/vae_decode (tests
    inject mocks; production uses the defaults).
    """
    from .models.vae import vae_decode, vae_encode

    enc = encode_fn or (lambda x: vae_encode(params, x, cfg))
    dec = decode_fn or (lambda z: vae_decode(params, z, cfg))

    errs: Dict[str, float] = {}
    latent_rms = []
    for v in (-0.5, 0.0, 0.5):
        x = jnp.full((1, 1, size, size, cfg.in_channels), v, jnp.float32)
        z = enc(x)
        latent_rms.append(float(jnp.sqrt(jnp.mean(
            jnp.square(z.astype(jnp.float32))))))
        y = np.asarray(dec(z), np.float32)
        errs[str(v)] = float(np.abs(y - v).mean())
    worst = max(errs.values())
    if worst <= tol:
        return errs
    rms = max(latent_rms)
    # Name the suspect: normalized latents of a trained model are ~N(0,1);
    # an order-of-magnitude-off RMS points at a uniform scale error (DWT
    # convention or misapplied stats), an O(1) RMS with a bad roundtrip
    # points at the stats being applied in the wrong place.
    if rms > 8.0 or rms < 0.125:
        suspect = (
            f"latent RMS {rms:.3g} is far from the ~1 a trained model "
            f"produces — consistent with a DWT rescale convention mismatch "
            f"(try VAEConfig(dwt_rescale="
            f"{'orthonormal' if cfg.dwt_rescale == 'gain1' else 'gain1'!r}))"
            f" or latent statistics applied at the wrong place "
            f"(stats_location={cfg.stats_location!r})"
        )
    else:
        suspect = (
            f"latent RMS {rms:.3g} looks calibrated, so the DWT scale is "
            f"likely right — check stats_location "
            f"(currently {cfg.stats_location!r}) and that latents_mean/std "
            f"match this checkpoint"
        )
    raise VAECalibrationError(
        f"constant-frame roundtrip failed: mean abs error {worst:.4f} > "
        f"tol {tol} (per-input {errs}).  {suspect}.  If these weights are "
        f"untrained/random this check is meaningless — skip it."
    )


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
        # Missing/stats-less config.json must not silently leave identity
        # stats on a flagship checkpoint — fall back to the bundled table.
        return ensure_latent_stats(params, cfg)

    from safetensors.numpy import load_file

    flat = load_file(path)
    if any("/" in k for k in flat):
        return load_vae_native(path, dtype)
    # A bare safetensors file has no config.json at all; same fallback.
    return ensure_latent_stats(
        convert_diffusers_vae_state_dict(flat, cfg, dtype), cfg
    )
