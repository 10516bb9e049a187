"""Benchmark: per-denoise-step DiT latency on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology notes (see BASELINE.md):
* the axon TPU tunnel neither blocks on block_until_ready nor re-executes
  value-identical computations, so every timed call uses distinct inputs and
  forces a device->host fetch;
* vs_baseline compares against the estimated per-step latency of the torch
  reference on A100 for the same shape: the reference runs its attention/MLP
  block bodies under fp32 autocast (ref: CleanGeneralDIT.py:509), which on
  A100 means TF32 tensor-core matmuls at best — estimated at 40% MFU of
  156 TFLOP/s peak = 62 TFLOP/s effective.  vs_baseline > 1 means this
  framework on one v5e beats that estimate.

Shape ladder (largest that fits the chip wins):
1. full 7B (28 blocks), flagship 57f x 704x1280 latent -> 28,160 tokens
2. full 7B, single-frame 512x512 latent -> 1,024 tokens (BASELINE config #1)
3. CPU fallback: structurally identical scaled model (CI smoke only)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_EFFECTIVE_FLOPS = 62e12  # TF32 @ 40% MFU (see module docstring)


def dit_step_flops(p_params: float, l_tokens: int, d_model: int,
                   num_blocks: int) -> float:
    """2*P*L dense matmul FLOPs + 4*L^2*D attention FLOPs."""
    return 2.0 * p_params * l_tokens + 4.0 * l_tokens**2 * d_model * num_blocks / 28.0


def _init_bf16(cfg, key, dtype):
    """Benchmark weights: small tensors random, the big stacked block tensors
    zero-filled — identical FLOPs/latency, but no RNG temporaries (the
    `normal * scale` pattern transiently doubles each tensor, which OOMs when
    weights ~fill HBM; usable ceiling measured at ~14.5 GiB on this v5e)."""
    d, dh, r = cfg.model_channels, cfg.head_dim, cfg.adaln_lora_dim
    hid, ctx, nb = cfg.hidden_dim, cfg.crossattn_emb_channels, cfg.num_blocks
    keys = iter(jax.random.split(key, 64))
    w = lambda shape: jax.random.normal(next(keys), shape, dtype) * 0.02
    st = lambda shape: jnp.zeros((nb, *shape), dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    params = {
        "x_embedder": {"weight": w((cfg.patch_dim, d))},
        "t_embedder": {"w1": w((d, d)), "w2": w((d, 3 * d))},
        "affline_norm": {"weight": ones((d,))},
        "blocks": {
            "fa": {"adaln_w1": st((d, r)), "adaln_w2": st((r, 3 * d)),
                   "wq": st((d, d)), "wk": st((d, d)), "wv": st((d, d)),
                   "wo": st((d, d)), "q_norm": ones((nb, dh)),
                   "k_norm": ones((nb, dh))},
            "ca": {"adaln_w1": st((d, r)), "adaln_w2": st((r, 3 * d)),
                   "wq": st((d, d)), "wk": st((ctx, d)), "wv": st((ctx, d)),
                   "wo": st((d, d)), "q_norm": ones((nb, dh)),
                   "k_norm": ones((nb, dh))},
            "mlp": {"adaln_w1": st((d, r)), "adaln_w2": st((r, 3 * d)),
                    "w1": st((d, hid)), "w2": st((hid, d))},
        },
        "final": {"adaln_w1": w((d, r)), "adaln_w2": w((r, 2 * d)),
                  "linear": w((d, cfg.patch_spatial**2 * cfg.patch_temporal
                               * cfg.out_channels))},
        "context_embedding": {"weight": w((16, ctx))},
    }
    return params


HBM_BUDGET_BYTES = 15.2 * 2**30  # v5e 16 GB minus runtime reservations


def _fits_hbm(cfg, tokens: int, dtype) -> bool:
    """Cheap fit check so we never start a doomed multi-minute compile.
    Working-set estimate: ~10 live (L, D) activation tensors + one
    double-buffered block-weight slice from the lax.scan."""
    from diffusionrenderer_tpu.models.dit import dit_param_count

    itemsize = jnp.dtype(dtype).itemsize
    weights = dit_param_count(cfg) * itemsize
    act = 10 * tokens * cfg.model_channels * itemsize
    block_slice = 2 * weights / max(cfg.num_blocks, 1)
    return weights + act + block_slice < HBM_BUDGET_BYTES


def _bench_config(cfg, t, h, w, dtype, n_iters=3):
    from diffusionrenderer_tpu.models.dit import dit_forward

    params = _init_bf16(cfg, jax.random.key(0), dtype)
    b = 1
    cond = jax.random.normal(jax.random.key(2),
                             (b, t, h, w, cfg.additional_concat_ch), dtype)
    sig = jnp.full((b,), 7.5, dtype)
    ci = jnp.zeros((b,), jnp.int32)
    fwd = jax.jit(lambda p, x: dit_forward(p, x, sig, cond, ci, cfg))

    xs = [
        jax.random.normal(jax.random.key(10 + i), (b, t, h, w, cfg.in_channels),
                          dtype)
        for i in range(n_iters + 1)
    ]
    out = fwd(params, xs[0])
    _ = np.asarray(out[0, -1, -1, -1])  # compile + first run
    t0 = time.perf_counter()
    for i in range(n_iters):
        _ = np.asarray(fwd(params, xs[i + 1])[0, -1, -1, -1])
    return (time.perf_counter() - t0) / n_iters


def main() -> None:
    from diffusionrenderer_tpu.config import DiTConfig
    from diffusionrenderer_tpu.models.dit import dit_param_count

    on_tpu = jax.devices()[0].platform == "tpu"

    if on_tpu:
        ladder = [
            ("dit_step_ms_7b_flagship_28160tok", DiTConfig(), (8, 88, 160),
             jnp.bfloat16),
            ("dit_step_ms_7b_512x512_1024tok", DiTConfig(), (1, 64, 64),
             jnp.bfloat16),
        ]
    else:
        tiny = DiTConfig(model_channels=128, num_blocks=2, num_heads=4,
                         adaln_lora_dim=16, crossattn_emb_channels=32)
        ladder = [("dit_step_ms_tiny_cpu", tiny, (1, 16, 16), jnp.float32)]

    last_err = None
    for metric, cfg, (t, h, w), dtype in ladder:
        tokens = (t // cfg.patch_temporal) * (h // cfg.patch_spatial) * (
            w // cfg.patch_spatial
        )
        if on_tpu and not _fits_hbm(cfg, tokens, dtype):
            print(f"# rung {metric} skipped: exceeds single-chip HBM budget "
                  f"(needs TP>=2 or int8 weights)", file=sys.stderr)
            continue
        try:
            dt = _bench_config(cfg, t, h, w, dtype)
            tokens = (t // cfg.patch_temporal) * (h // cfg.patch_spatial) * (
                w // cfg.patch_spatial
            )
            flops = dit_step_flops(dit_param_count(cfg), tokens,
                                   cfg.model_channels, cfg.num_blocks)
            baseline_s = flops / A100_EFFECTIVE_FLOPS
            print(json.dumps({
                "metric": metric,
                "value": round(dt * 1e3, 2),
                "unit": "ms",
                "vs_baseline": round(baseline_s / dt, 3),
            }))
            print(
                f"# {tokens} tokens, {flops/1e12:.1f} TFLOP/step, "
                f"achieved {flops/dt/1e12:.1f} TFLOP/s; baseline = estimated "
                f"A100 TF32 reference {baseline_s*1e3:.0f} ms",
                file=sys.stderr,
            )
            return
        except Exception as e:  # OOM at this rung -> try the next
            last_err = e
            print(f"# rung {metric} failed: {str(e)[:120]}", file=sys.stderr)
    raise SystemExit(f"all bench rungs failed: {last_err}")


if __name__ == "__main__":
    main()
