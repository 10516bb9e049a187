"""Per-chip memory_analysis of the 121-frame W8A8 denoise program UNDER A
MESH (VERDICT r4 item 5): is the XLA activation-quant fallback — the path
multi-chip W8A8 actually takes, since the fused Pallas kernel is disabled
under an active mesh (models/quant.py:_use_fused_kernel) — memory-safe once
`seq` sharding shrinks the per-chip token count?

Single-chip round-4 evidence (scripts/mem_w8a8_longvideo.py): XLA W8A8 at
56,320 tokens costs 8.19 GiB program temp (the L-sized int8/int32
activation temporaries) vs 6.13 GiB weight-only — which OOM'd next to the
6.74 GiB weights.  Under `seq` sharding each chip sees L/seq tokens, so the
L-sized temporaries shrink proportionally; this script AOT-compiles the
flagship dit_forward at the 121-frame latent shape (16x88x160 -> 56,320
tokens) against a DEVICELESS v5e TPU TOPOLOGY (jax.experimental.topologies,
'v5e:2x4' by default) with the real Megatron/seq shardings and the
shard_map'd sequence-parallel flash-attention, and prints the PER-CHIP
memory_analysis.  Real v5e compilation — not the CPU backend, whose
memory_analysis was measured 12x pessimistic at this shape (no TPU-style
buffer reuse) and is unusable as evidence.

Abstract lowering (jax.ShapeDtypeStruct + sharding): the 7B weights are
never materialized, so this needs no chip time at all.

Usage: python scripts/mem_w8a8_mesh.py [w8a8 w8 w8a8_g128 ...]
           [--mesh=1x8x1] [--topo=v5e:2x4] [--attn=flash_sp|xla]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MESH = "1x8x1"
TOPO = "v5e:2x4"
ATTN = "flash_sp"
MODES = []
for a in sys.argv[1:]:
    if a.startswith("--mesh="):
        MESH = a.split("=", 1)[1]
    elif a.startswith("--topo="):
        TOPO = a.split("=", 1)[1]
    elif a.startswith("--attn="):
        ATTN = a.split("=", 1)[1]
    else:
        MODES.append(a)
MODES = MODES or ["w8a8", "w8", "w8a8_g128"]
DATA, SEQ, TP = (int(v) for v in MESH.split("x"))
N_DEV = DATA * SEQ * TP

import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh

from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.dit import dit_forward, init_dit_params
from diffusionrenderer_tpu.models.quant import QUANTIZED_BLOCK_WEIGHTS
from diffusionrenderer_tpu.parallel import (
    batch_sharding,
    dit_param_shardings,
    token_sharding_constraint,
)
from diffusionrenderer_tpu.parallel.sharding import (
    AXIS_DATA,
    AXIS_SEQ,
    AXIS_TENSOR,
)

cfg = DiTConfig()
t, h, w = 16, 88, 160  # latent frames for 121 input frames @ 704x1280

topo = topologies.get_topology_desc(TOPO, platform="tpu")
assert len(topo.devices) >= N_DEV, (TOPO, N_DEV)
mesh = Mesh(
    np.array(topo.devices[:N_DEV]).reshape(DATA, SEQ, TP),
    (AXIS_DATA, AXIS_SEQ, AXIS_TENSOR),
)
print(f"topology {TOPO} ({topo.devices[0].device_kind}); mesh "
      f"{dict(zip(mesh.axis_names, mesh.devices.shape))}; attn={ATTN}",
      flush=True)


def _abstract_params(mode):
    """Flagship params as ShapeDtypeStructs with the int8 leaf contract of
    quantize_dit_params_host (q int8 + s/sa scales), no materialization."""
    shapes = jax.eval_shape(
        lambda k: init_dit_params(k, cfg, dtype=jnp.bfloat16),
        jax.random.key(0),
    )
    act = mode.startswith("w8a8")
    grouped = mode.endswith("_g128")
    skey = "sa" if act else "s"

    out = dict(shapes)
    blocks = {}
    for sub, names in QUANTIZED_BLOCK_WEIGHTS.items():
        bp = dict(shapes["blocks"][sub])
        for name in names:
            nb, k, n = bp[name].shape
            sshape = (nb, k // 128, n) if grouped else (nb, n)
            bp[name] = {
                "q": jax.ShapeDtypeStruct((nb, k, n), jnp.int8),
                skey: jax.ShapeDtypeStruct(sshape, jnp.float32),
            }
        blocks[sub] = bp
    out["blocks"] = blocks
    return out


def _with_shardings(tree, stree):
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        tree,
        stree,
    )


gib = 2.0**30
for mode in MODES:
    params = _abstract_params(mode)
    params = _with_shardings(params, dit_param_shardings(params, mesh))
    bs = batch_sharding(mesh)
    x = jax.ShapeDtypeStruct((1, t, h, w, cfg.in_channels), jnp.bfloat16,
                             sharding=bs)
    cond = jax.ShapeDtypeStruct(
        (1, t, h, w, cfg.additional_concat_ch), jnp.bfloat16, sharding=bs
    )
    sig = jax.ShapeDtypeStruct((1,), jnp.bfloat16)
    ci = jax.ShapeDtypeStruct((1,), jnp.int32)

    def fwd(p, xx, s, cc, cci):
        return dit_forward(
            p, xx, s, cc, cci, cfg,
            seq_sharding_constraint=token_sharding_constraint(mesh),
            attn_backend=ATTN, mesh=mesh,
        )

    # `with mesh:` matches how pipeline.generate runs sharded (mesh_ctx):
    # it is what flips models/quant._use_fused_kernel to the XLA path —
    # exactly the program whose memory this script is evidencing.
    with mesh:
        compiled = jax.jit(fwd).lower(params, x, sig, cond, ci).compile()
    ma = compiled.memory_analysis()
    # Under SPMD every chip runs the same partitioned program; memory
    # analysis sizes are per-chip.
    print(
        f"{mode} @ {MESH}: per-chip temp {ma.temp_size_in_bytes/gib:.2f} "
        f"GiB, args {ma.argument_size_in_bytes/gib:.2f} GiB, output "
        f"{ma.output_size_in_bytes/gib:.3f} GiB, peak(temp+args) "
        f"{(ma.temp_size_in_bytes+ma.argument_size_in_bytes)/gib:.2f} GiB",
        flush=True,
    )
