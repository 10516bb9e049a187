"""Quantization calibration capture: per-(block, site) activation statistics.

The calibrated quantizers (models/quant.py `_awq` scale migration and
`_gptq` error-compensating rounding) need to know what activations each
quantized matmul actually sees.  The reference has no quantization at all
(bf16-only on an 80 GB A100, /root/reference/nodes.py:76); this capture
exists so a 16 GiB v5e can run the 7B model with the least possible
accuracy loss.

Design: the DiT executes its 28 stacked blocks through a pluggable
`block_executor` (models/dit.py).  Capture plugs in a host-loop executor
that runs ONE jitted block function per layer — built with
`make_block_apply(capture_sites=True)`, which returns the dense-input
tensors at each quantization site — and reduces them to statistics ON
DEVICE before fetching:

* `amean`: per-input-channel mean |x| over the calibration tokens, (K,)
  fp32 — the AWQ migration statistic; captured for every site, ~free.
* `h`: the GPTQ Hessian Σ xᵀx, (K, K) fp32 — captured only for requested
  sites (64 MB per block at K=4096; the 16384-dim mlp.w2 H is 1 GiB/block
  and is OFF by default — w2 falls back to RTN under gptq modes).

Statistics are accumulated on host across blocks (and across multiple
calibration batches via `accumulate_stats`), so device memory holds only
one block's stats at a time next to the resident weights — the capture
runs fine with the quantized (int8) model resident, which is also the
statistically proper choice: GPTQ-style methods calibrate against the
quantization-perturbed activations the deployed model will actually see.

Typical use (the PSNR harness, scripts/psnr_w8a8.py):

    stats = capture_dit_stats(w8_params, cfg, x, sigma, cond, ctx_idx,
                              hessian_sites=("mlp.w1", "fa.qkv", "fa.wo"))
    qparams = quantize_dit_params_host(host_params, "w8_gptq_g32", stats)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DiTConfig
from .dit import dit_forward, make_block_apply

# Sites captured for amean by default — everything LEAF_SITE references.
ALL_SITES = ("fa.qkv", "fa.wo", "ca.wv", "ca.wo", "mlp.w1", "mlp.w2")
DEFAULT_HESSIAN_SITES = ("fa.qkv", "fa.wo", "mlp.w1")


def _make_capture_executor(cfg: DiTConfig, hessian_sites: Sequence[str],
                           out: Dict[str, Dict[str, list]],
                           attn_backend="auto"):
    """Host-loop block executor that fetches per-block stats as it goes."""
    apply_c = make_block_apply(cfg, attn_backend, mlp_token_chunks=1,
                               capture_sites=True)
    hset = frozenset(hessian_sites)

    @functools.partial(jax.jit, static_argnames=())
    def blk(bp, x, emb, lora, context, cos, sin):
        y, sites = apply_c(bp, x, emb, lora, context, cos, sin)
        stats = {}
        for name, t in sites.items():
            tf = t.reshape(-1, t.shape[-1]).astype(jnp.float32)
            s = {"amean": jnp.mean(jnp.abs(tf), axis=0),
                 "count": jnp.array(tf.shape[0], jnp.float32)}
            if name in hset:
                s["h"] = tf.T @ tf
            stats[name] = s
        return y, stats

    def executor(blocks, tokens, emb, lora, context, cos, sin, _apply):
        nb = jax.tree_util.tree_leaves(blocks)[0].shape[0]
        for b in range(nb):
            bp = jax.tree.map(lambda leaf: leaf[b], blocks)
            tokens, stats = blk(bp, tokens, emb, lora, context, cos, sin)
            for name, s in stats.items():
                slot = out.setdefault(name, {"amean": [], "h": [],
                                             "count": []})
                slot["amean"].append(np.asarray(s["amean"]))
                slot["count"].append(float(s["count"]))
                if "h" in s:
                    slot["h"].append(np.asarray(s["h"]))
        return tokens

    return executor


def capture_dit_stats(
    params: Dict[str, Any],
    cfg: DiTConfig,
    x: jax.Array,
    sigma: jax.Array,
    latent_condition: jax.Array,
    context_index: Optional[jax.Array],
    *,
    hessian_sites: Sequence[str] = DEFAULT_HESSIAN_SITES,
    crossattn_emb: Optional[jax.Array] = None,
    prev: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Run ONE denoiser forward and return per-site calibration stats.

    x / sigma / latent_condition / context_index: exactly dit_forward's
    inputs — callers should pass preconditioned inputs matching what the
    pipeline feeds at inference (e.g. scale_model_input(σ·ε, σ) at a few
    schedule sigmas batched on the batch axis, see sampling/edm.py).

    Returns {"amean": {site: (nb, K) np}, "h": {site: (nb, K, K) np},
    "count": {site: float}} — directly consumable by
    quant.quantize_dit_params_host.  Pass a previous result as `prev` to
    accumulate over multiple calibration batches (token-weighted for
    amean, summed for H).
    """
    raw: Dict[str, Dict[str, list]] = {}
    executor = _make_capture_executor(cfg, hessian_sites, raw)
    dit_forward(params, x, sigma, latent_condition, context_index, cfg,
                crossattn_emb=crossattn_emb, block_executor=executor)
    stats: Dict[str, Any] = {"amean": {}, "h": {}, "count": {}}
    for name, slot in raw.items():
        stats["amean"][name] = np.stack(slot["amean"])
        stats["count"][name] = float(slot["count"][0])
        if slot["h"]:
            stats["h"][name] = np.stack(slot["h"])
    if prev is not None:
        stats = accumulate_stats(prev, stats)
    return stats


def accumulate_stats(a: Dict[str, Any], b: Dict[str, Any]) -> Dict[str, Any]:
    """Merge two capture results: amean token-weighted, H summed."""
    out: Dict[str, Any] = {"amean": {}, "h": {}, "count": {}}
    for site in set(a["amean"]) | set(b["amean"]):
        if site in a["amean"] and site in b["amean"]:
            na, nb_ = a["count"][site], b["count"][site]
            out["amean"][site] = (
                a["amean"][site] * (na / (na + nb_))
                + b["amean"][site] * (nb_ / (na + nb_)))
            out["count"][site] = na + nb_
        else:
            src = a if site in a["amean"] else b
            out["amean"][site] = src["amean"][site]
            out["count"][site] = src["count"][site]
        ha, hb = a["h"].get(site), b["h"].get(site)
        if ha is not None and hb is not None:
            out["h"][site] = ha + hb
        elif ha is not None or hb is not None:
            out["h"][site] = ha if ha is not None else hb
    return out
