"""Single-chip flagship-denoise memory_analysis for ANY quant mode string,
including the round-5 '_mixN' blockwise mixed-precision rungs.

AOT-compiles the flagship dit_forward (57-frame 704x1280 job: latent
8x88x160 -> 28,160 tokens) against a DEVICELESS v5e topology
(jax.experimental.topologies, 1-device mesh) with abstract params following
the exact leaf contract of models/quant.quantize_dit_params_host — int8
{q, s|sa[, di, hs]} leaves at the mode's group size, bf16 kept leaves, and
for '_mixN' a TUPLE of stacked segments (boundary split; segment layout is
memory-equivalent to the damage-ranked split) — and prints per-chip
memory_analysis.  No chip time, no weight materialization: this is how a
mix-N candidate is sized BEFORE paying a 7B upload for its PSNR rung.

Usage: python scripts/mem_flagship.py [mode ...] [--frames=57]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = 57
MODES = []
for a in sys.argv[1:]:
    if a.startswith("--frames="):
        FRAMES = int(a.split("=", 1)[1])
    else:
        MODES.append(a)
MODES = MODES or ["w8_g32_keepres_keepattn",
                  "w8_g32_keepres_keepattn_mix8"]

import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh

from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.dit import dit_forward, init_dit_params
from diffusionrenderer_tpu.models.quant import (
    QUANTIZED_BLOCK_WEIGHTS, parse_quant_mode,
)
from diffusionrenderer_tpu.parallel import dit_param_shardings
from diffusionrenderer_tpu.parallel.sharding import (
    AXIS_DATA, AXIS_SEQ, AXIS_TENSOR,
)

cfg = DiTConfig()
t = (FRAMES - 1) // 8 + 1
h, w = 88, 160
tokens = t * (h // cfg.patch_spatial) * (w // cfg.patch_spatial)

topo = topologies.get_topology_desc("v5e:2x4", platform="tpu")
mesh = Mesh(np.array(topo.devices[:1]).reshape(1, 1, 1),
            (AXIS_DATA, AXIS_SEQ, AXIS_TENSOR))
print(f"topology v5e ({topo.devices[0].device_kind}), 1-device mesh; "
      f"frames={FRAMES} latent ({t},{h},{w}) = {tokens} tokens", flush=True)


def _quant_stack(shapes_sub, names, mode, seg=None):
    """Abstract quantized block stack (optionally resized to `seg` blocks)."""
    skey = "sa" if mode.act_quant else "s"
    bp = {}
    for name, s in shapes_sub.items():
        shape = s.shape
        if seg is not None and len(shape) >= 1:
            shape = (seg, *shape[1:])
        if name not in names or name in mode.keep:
            bp[name] = jax.ShapeDtypeStruct(shape, s.dtype)
            continue
        nb, k, n = shape
        gsz = mode.group_size if (mode.group_size
                                  and k % mode.group_size == 0) else None
        sshape = (nb, k // gsz, n) if gsz else (nb, n)
        leaf = {"q": jax.ShapeDtypeStruct((nb, k, n), jnp.int8),
                skey: jax.ShapeDtypeStruct(sshape, jnp.float32)}
        if mode.awq:
            leaf["di"] = jax.ShapeDtypeStruct((nb, k), jnp.float32)
        if mode.hadamard:
            leaf["hs"] = jax.ShapeDtypeStruct((nb, k), jnp.float32)
        bp[name] = leaf
    return bp


def _abstract_params(mode_str):
    mode = parse_quant_mode(mode_str) if mode_str != "bf16" else None
    shapes = jax.eval_shape(
        lambda k: init_dit_params(k, cfg, dtype=jnp.bfloat16),
        jax.random.key(0),
    )
    out = dict(shapes)
    if mode is None:
        return out
    nb = cfg.num_blocks

    def q_stack(seg=None):
        return {sub: _quant_stack(shapes["blocks"][sub],
                                  QUANTIZED_BLOCK_WEIGHTS[sub], mode, seg)
                for sub in shapes["blocks"]}

    def bf16_stack(seg):
        return {sub: {name: jax.ShapeDtypeStruct((seg, *s.shape[1:]),
                                                 s.dtype)
                      for name, s in shapes["blocks"][sub].items()}
                for sub in shapes["blocks"]}

    if mode.mix_blocks:
        n = min(mode.mix_blocks, nb)
        half = (n + 1) // 2
        segs = []
        if half:
            segs.append(bf16_stack(half))
        segs.append(q_stack(nb - n))
        if n - half:
            segs.append(bf16_stack(n - half))
        out["blocks"] = tuple(segs)
    else:
        out["blocks"] = q_stack()
    return out


def _with_shardings(tree, stree):
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        tree, stree,
    )


gib = 2.0**30
for mode_str in MODES:
    params = _abstract_params(mode_str)
    params = _with_shardings(params, dit_param_shardings(params, mesh))
    rep = jax.NamedSharding(mesh, jax.sharding.PartitionSpec())
    x = jax.ShapeDtypeStruct((1, t, h, w, cfg.in_channels), jnp.bfloat16,
                             sharding=rep)
    cond = jax.ShapeDtypeStruct((1, t, h, w, cfg.additional_concat_ch),
                                jnp.bfloat16, sharding=rep)
    sig = jax.ShapeDtypeStruct((1,), jnp.bfloat16, sharding=rep)
    ci = jax.ShapeDtypeStruct((1,), jnp.int32, sharding=rep)

    def fwd(p, xx, s, cc, cci):
        return dit_forward(p, xx, s, cc, cci, cfg, attn_backend="pallas")

    compiled = jax.jit(fwd).lower(params, x, sig, cond, ci).compile()
    ma = compiled.memory_analysis()
    args, temp = ma.argument_size_in_bytes, ma.temp_size_in_bytes
    print(f"{mode_str}: weights+args {args/gib:.2f} GiB, temp "
          f"{temp/gib:.2f} GiB, output {ma.output_size_in_bytes/gib:.3f} "
          f"GiB, peak(temp+args) {(temp+args)/gib:.2f} GiB", flush=True)
