"""Sequence-parallel attention that keeps the Pallas flash kernel under SPMD.

A `pallas_call` does not auto-partition under pjit, so the multi-chip DiT
path previously fell back to XLA attention.  Here the kernel is wrapped in
`jax.shard_map` over the (data, seq, tensor) mesh: every device holds its
token shard of q and all-gathers KV over the `seq` axis (SURVEY.md section 5:
at L = 28,160 the gather — ~few hundred MB bf16 per layer on ICI — is cheap
against the O(L^2) attention FLOPs it unlocks), then runs the flash kernel
on its local (L/seq, L) tile.  Exact; non-causal; heads ride the `tensor`
axis, batch rides `data`.

For contexts where the gathered KV no longer fits, `impl='ring'` dispatches
to parallel/ring_attention.py instead (ppermute KV rotation, nothing global
ever materialized).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_attention import flash_attention
from .ring_attention import ring_attention_local
from .sharding import AXIS_DATA, AXIS_SEQ, AXIS_TENSOR


def make_sp_attention(mesh: Mesh, impl: str = "flash",
                      interpret: bool | None = None):
    """(B, L, H, Dh) q/k/v -> (B, L, H, Dh), sharded P(data, seq, tensor).

    impl: 'flash' — all-gather KV over `seq`, Pallas flash kernel per shard;
          'ring'  — ppermute KV ring with cross-step online-softmax merge.
    interpret: forwarded to the Pallas kernel (tests run it on CPU meshes).
    """
    if impl not in ("flash", "ring"):
        raise ValueError(f"unknown sequence-parallel attention impl {impl!r}")

    spec = P(AXIS_DATA, AXIS_SEQ, AXIS_TENSOR, None)

    def local(q, k, v):
        if impl == "ring":
            return ring_attention_local(q, k, v, AXIS_SEQ)
        k = jax.lax.all_gather(k, AXIS_SEQ, axis=1, tiled=True)
        v = jax.lax.all_gather(v, AXIS_SEQ, axis=1, tiled=True)
        return flash_attention(q, k, v, interpret=interpret)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so the (default) vma check rejects it.
    return jax.shard_map(local, mesh=mesh, in_specs=(spec,) * 3,
                         out_specs=spec, check_vma=False)
