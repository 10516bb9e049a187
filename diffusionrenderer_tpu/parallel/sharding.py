"""Mesh + sharding layout for multi-chip execution.

The reference is strictly single-GPU (SURVEY.md section 2d: no torch.distributed,
no NCCL, hardcoded cuda device at diffusion_renderer_pipeline.py:81).  Here
parallelism is first-class and entirely XLA-compiled: we declare a
(data, seq, tensor) mesh and NamedShardings; XLA inserts the all-gathers /
reduce-scatters over ICI.

Axes:
* data   — batch of videos; the 5 inverse G-buffer passes batch here too.
* seq    — token axis of the (B, L, D) DiT activations (sequence parallel).
  Self-attention KV is all-gathered across `seq` — at L=28,160 the gather is
  ~440 MB bf16 per layer group, cheap on ICI relative to the O(L^2) attention
  FLOPs it unlocks (SURVEY.md section 5: all-gather beats ring at this L).
* tensor — Megatron-style sharding of the 4096-wide matmuls: qkv / MLP-in
  column-sharded (heads split), out / MLP-out row-sharded, AdaLN + norms +
  embedders replicated.

Param shardings operate on the STACKED block tensors (leading num_blocks
axis unsharded so lax.scan slices locally).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_TENSOR = "tensor"


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    seq: Optional[int] = None,
    tensor: Optional[int] = None,
) -> Mesh:
    """Build a (data, seq, tensor) mesh over the first n devices.

    With no explicit factors: tensor gets up to 2, seq up to 2, remainder to
    data — a balanced default for inference; override for real deployments.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"Requested a {n}-device mesh but only {len(devices)} device(s) "
            f"are visible; for CPU testing set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n}."
        )
    if data is None or seq is None or tensor is None:
        tensor = tensor or (2 if n % 2 == 0 else 1)
        rem = n // tensor
        seq = seq or (2 if rem % 2 == 0 else 1)
        data = data or rem // seq
    assert data * seq * tensor == n, (
        f"mesh {data}x{seq}x{tensor} != {n} devices"
    )
    dev_array = np.asarray(devices[:n]).reshape(data, seq, tensor)
    return Mesh(dev_array, (AXIS_DATA, AXIS_SEQ, AXIS_TENSOR))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def dit_param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """NamedSharding pytree matching a DiT params pytree.

    Megatron TP: column-parallel into attention/MLP, row-parallel out.
    """
    rep = _ns(mesh)
    col3 = _ns(mesh, None, None, AXIS_TENSOR)  # (nb, in, out): shard out
    row3 = _ns(mesh, None, AXIS_TENSOR, None)  # (nb, in, out): shard in
    scale_col = _ns(mesh, None, AXIS_TENSOR)   # (nb, out) int8 dequant scales
    # Per-GROUP int8 scales are (nb, G, out): column-parallel shards `out`,
    # row-parallel shards the input axis — i.e. the GROUP axis (each shard
    # owns K/tp input rows = G/tp whole groups).
    gscale_col = _ns(mesh, None, None, AXIS_TENSOR)
    gscale_row = _ns(mesh, None, AXIS_TENSOR, None)

    # Input-space transform leaves ('di' migration multipliers, 'hs'
    # Hadamard signs) are (nb, K): column-parallel weights replicate them
    # (their K axis is unsharded); row-parallel weights shard them with the
    # input axis they multiply.  Both transforms are position-wise on K
    # (the Hadamard rotation is block-128-local and K/tp is 128-aligned for
    # the production dims), so sharding them with K is exact.
    tvec_row = _ns(mesh, None, AXIS_TENSOR)  # (nb, K) row-sharded

    def map_blocks(blocks, sub: str, name: str):
        leaf = blocks[sub][name]
        quantized = isinstance(leaf, dict)  # {'q','s'|'sa',...} int8 leaves
        if quantized:
            grouped = (leaf["sa"] if "sa" in leaf else leaf["s"]).ndim == 3
        if name in ("wq", "wk", "wv", "w1"):
            if quantized:
                scale = gscale_col if grouped else scale_col
                return {k: (col3 if k == "q" else
                            rep if k in ("di", "hs") else scale)
                        for k in leaf}
            return col3
        if name in ("wo", "w2"):
            if quantized:
                # Row-sharded: out axis replicated; per-channel scales are
                # replicated, per-group scales shard their group axis.
                scale = gscale_row if grouped else rep
                return {k: (row3 if k == "q" else
                            tvec_row if k in ("di", "hs") else scale)
                        for k in leaf}
            return row3
        return rep

    def map_block_stack(blocks):
        return {sub: {name: map_blocks(blocks, sub, name)
                      for name in blocks[sub]}
                for sub in blocks}

    # '_mixN' mixed precision: blocks arrive as a tuple of stacked segments
    # (models/quant.py) — every segment gets the same per-leaf specs.
    blk = params["blocks"]
    out: Dict[str, Any] = {
        "x_embedder": {k: rep for k in params["x_embedder"]},
        "t_embedder": {k: rep for k in params["t_embedder"]},
        "affline_norm": {"weight": rep},
        "blocks": (tuple(map_block_stack(s) for s in blk)
                   if isinstance(blk, (tuple, list))
                   else map_block_stack(blk)),
        "final": {k: rep for k in params["final"]},
    }
    if "context_embedding" in params:
        out["context_embedding"] = {"weight": rep}
    return out


def vae_param_shardings(params: Any, mesh: Mesh) -> Any:
    """VAE weights are small (~100M); replicate everywhere."""
    rep = _ns(mesh)
    return jax.tree.map(lambda _: rep, params)


def shard_params(params: Any, shardings: Any) -> Any:
    """Place a host/param pytree onto the mesh per the sharding pytree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


def token_sharding_constraint(mesh: Mesh):
    """Constraint callable for (B, L, D) activations: batch over data,
    tokens over seq (passed to dit_forward as seq_sharding_constraint)."""

    def constrain(x):
        return jax.lax.with_sharding_constraint(
            x, _ns(mesh, AXIS_DATA, AXIS_SEQ, None)
        )

    return constrain


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, H, W, C) video tensors: shard batch over data."""
    return _ns(mesh, AXIS_DATA, None, None, None, None)


def initialize_distributed(**kwargs) -> None:
    """Multi-host entry: initialize the JAX distributed runtime.

    Call once per process before any device use on a multi-host deployment
    (TPU pods / multi-slice).  On TPU pods all arguments are auto-detected
    from the environment; kwargs pass through to jax.distributed.initialize
    (coordinator_address/num_processes/process_id) for manual setups.
    Idempotent: a second call is a no-op.
    """
    try:
        from jax._src.distributed import global_state

        if global_state.client is not None:
            return  # already initialized
    except Exception:  # private API: any drift (moved module, renamed
        pass           # field) falls back to the try/except below
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # double-init race
        if "already initialized" not in str(e):
            raise


def make_hybrid_mesh(
    dcn_data: int,
    data: int = 1,
    seq: int = 1,
    tensor: int = 1,
) -> Mesh:
    """(data, seq, tensor) mesh spanning multiple slices over DCN.

    Multi-slice TPU deployments have two interconnect tiers: ICI within a
    slice (fast) and DCN between slices (orders slower).  The communication-
    heavy axes (`seq`: per-layer KV all-gathers; `tensor`: per-matmul
    reduce-scatters) must stay on ICI; only `data` — which communicates
    nothing during inference and one gradient psum per step during training
    — may cross DCN.  create_hybrid_device_mesh places the DCN factor
    outermost, so here it composes into the data axis:

        global data axis = dcn_data (across slices) x data (within slice)

    and `seq`/`tensor` factor the within-slice devices.  The result is a
    plain (data, seq, tensor) Mesh — every sharding/constraint helper in
    this module applies unchanged; XLA routes each collective over the
    correct tier from the device coordinates.

    Single-slice processes (or CPU test meshes) should use make_mesh.
    """
    from jax.experimental import mesh_utils

    per_slice = data * seq * tensor
    devices = jax.devices()
    if len(devices) != dcn_data * per_slice:
        raise ValueError(
            f"hybrid mesh {dcn_data}x({data}x{seq}x{tensor}) needs "
            f"{dcn_data * per_slice} devices, {len(devices)} visible"
        )
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if None not in slice_ids and len(slice_ids) == dcn_data:
        # Real multi-slice TPU: topology-aware placement (DCN outermost).
        devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data, seq, tensor),
            dcn_mesh_shape=(dcn_data, 1, 1),
            devices=devices,
        )
    elif None not in slice_ids and len(slice_ids) > 1:
        # Devices DO report a real multi-slice topology, but it does not
        # match the requested dcn_data.  A contiguous fallback here would
        # silently let the seq/tensor axes (per-layer all-gathers,
        # per-matmul reduce-scatters) span DCN — a severe, hard-to-diagnose
        # slowdown on exactly the deployment this function targets — so
        # refuse instead.  (All-devices-report-slice-0 — single slice or
        # multi-process CPU — still takes the modeled fallback below.)
        raise ValueError(
            f"make_hybrid_mesh(dcn_data={dcn_data}) but the visible devices "
            f"span {len(slice_ids)} real slices ({sorted(slice_ids)}); pass "
            f"dcn_data={len(slice_ids)} so seq/tensor collectives stay on ICI"
        )
    else:
        # No real slice topology matching the request — CPU test devices, or
        # multi-process CPU where every device reports slice 0 (discovered
        # by tests/test_multiprocess.py: hasattr(slice_index) alone is NOT a
        # multi-slice signal).  Contiguous groups of per_slice devices stand
        # in for slices; jax.devices() orders by process, so on multi-process
        # CPU each group == one process == one modeled DCN domain.
        devs = np.asarray(devices).reshape(
            dcn_data, data, seq, tensor
        ).reshape(dcn_data * data, seq, tensor)
    assert devs.shape == (dcn_data * data, seq, tensor), devs.shape
    return Mesh(devs, (AXIS_DATA, AXIS_SEQ, AXIS_TENSOR))
