"""Compile-only memory_analysis of the 56,320-token denoise program
(VERDICT r3 item 3): is long-video W8A8 memory-safe with the fused kernel?

Round 2 measured the XLA W8A8 path at 8.19 GiB program temp vs 6.13 GiB
weight-only at this shape (the L-sized int8/int32 temporaries) — +2.06 GiB
that OOM'd the 121-frame job next to the 6.74 GiB weights.  The fused
Pallas kernel keeps the int32 matmul result in VMEM scratch; the only new
HBM artifact is the int8 activation copy (M*K bytes).  This script compiles
the flagship DiT forward at 121-frame latent shape (16x88x160 latent ->
56,320 tokens) for w8a8 / w8 / w8a8-g128 and prints each program's
memory_analysis — no device execution, so it can run without owning the
chip.

Usage: python scripts/mem_w8a8_longvideo.py [w8a8 w8 w8a8_g128 ...]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp

from bench import _init_bf16
from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.dit import dit_forward

MODES = sys.argv[1:] or ["w8a8", "w8", "w8a8_g128"]
cfg = DiTConfig()
t, h, w = 16, 88, 160  # latent frames for 121 input frames @ 704x1280


def _params(mode):
    base = "w8a8" if mode.startswith("w8a8") else "w8"
    params = _init_bf16(cfg, jax.random.key(0), jnp.bfloat16, quant=base)
    if mode.endswith("_g128"):
        # Rebuild the quantized leaves with grouped scales (G = in/128).
        def regroup(leaf):
            if isinstance(leaf, dict) and "q" in leaf:
                skey = "sa" if "sa" in leaf else "s"
                nb, k, n = leaf["q"].shape
                return {"q": leaf["q"],
                        skey: jnp.full((nb, k // 128, n), 0.01, jnp.float32)}
            return leaf
        params = jax.tree.map(regroup, params,
                              is_leaf=lambda x: isinstance(x, dict) and "q" in x)
    return params


for mode in MODES:
    params = _params(mode)
    # dit_forward takes LATENT-grid inputs (as bench.py._bench_config does):
    # (16, 88, 160) -> 56,320 tokens after the 1x2x2 patchify.
    x = jax.ShapeDtypeStruct((1, t, h, w, cfg.in_channels), jnp.bfloat16)
    cond = jax.ShapeDtypeStruct((1, t, h, w, cfg.additional_concat_ch),
                                jnp.bfloat16)
    sig = jnp.full((1,), 7.5, jnp.bfloat16)
    ci = jnp.zeros((1,), jnp.int32)
    fwd = jax.jit(lambda p, xx, cc: dit_forward(p, xx, sig, cc, ci, cfg))
    compiled = fwd.lower(params, x, cond).compile()
    ma = compiled.memory_analysis()
    gib = 2.0**30
    print(f"{mode}: temp {ma.temp_size_in_bytes/gib:.2f} GiB, "
          f"args {ma.argument_size_in_bytes/gib:.2f} GiB, "
          f"output {ma.output_size_in_bytes/gib:.3f} GiB, "
          f"peak(temp+args) "
          f"{(ma.temp_size_in_bytes+ma.argument_size_in_bytes)/gib:.2f} GiB",
          flush=True)
