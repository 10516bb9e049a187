"""Pipeline parallelism over the stacked DiT blocks (GPipe schedule).

The reference is single-GPU (SURVEY.md §2d); this closes the one parallelism
axis the framework had deferred.  TPU-native formulation:

* the 28 transformer blocks are already STACKED on a leading axis
  (models/dit.py), so a stage is a contiguous slice — sharding that axis over
  a `pipe` mesh axis gives each device `nb/S` blocks with zero re-layout;
* the whole schedule is ONE `shard_map` body: a `lax.scan` over
  `M + S - 1` ticks (M microbatches, S stages).  Every tick each stage runs
  its blocks on its current microbatch and hands the activation to the next
  stage with a single `ppermute` hop over ICI — the only communication in
  the schedule.  No host involvement, fully differentiable (scan + ppermute
  both have transposes), so the same executor serves training;
* composes with data parallelism: microbatch rows ride the mesh's `data`
  axis; tensor/seq axes are untouched (attention inside a stage is local).

Bubble fraction is the GPipe (S-1)/(M+S-1); pick M >= 4*S for >80%
utilisation.  Use `pp_block_shardings` to place checkpoint weights
stage-contiguously so the in-jit reshape is a local view.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_PIPE = "pipe"


def make_pp_mesh(num_stages: int, data: int = 1) -> Mesh:
    """A (data, pipe) mesh over the first data*num_stages visible devices."""
    import numpy as np

    devices = jax.devices()
    n = data * num_stages
    if n > len(devices):
        raise ValueError(
            f"Requested a {data}x{num_stages} (data, pipe) mesh but only "
            f"{len(devices)} device(s) are visible; for CPU testing set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n}."
        )
    return Mesh(np.asarray(devices[:n]).reshape(data, num_stages),
                ("data", AXIS_PIPE))


def pp_block_shardings(mesh: Mesh):
    """NamedSharding for the stacked (nb, ...) block leaves: stage-contiguous
    split of the block axis over `pipe` (axis 0), everything else replicated.

    Apply with jax.tree.map over params['blocks'] before calling the
    executor so the in-executor (S, nb/S, ...) reshape is a local view.
    Quantized {'q','s'} leaves share the same leading block axis and take
    the same spec.
    """
    return NamedSharding(mesh, P(AXIS_PIPE))


def make_pp_executor(
    mesh: Mesh,
    num_microbatches: int,
    *,
    axis: str = AXIS_PIPE,
    data_axis: Optional[str] = "data",
    remat: bool = False,
):
    """Build a block-executor for dit_forward(block_executor=...).

    executor(blocks, tokens, emb, lora, context, cos, sin, apply_block)
      blocks:  stacked pytree, leaves (nb, ...); nb % S == 0
      tokens:  (B, L, D);  B % num_microbatches == 0, and the microbatch
               rows (B / M) divide the mesh's data axis if present
      emb/lora/context: per-sample conditioning, leading axis B
      apply_block: pure fn from models.dit.make_block_apply — must not
               itself be a shard_map'd/sequence-parallel callable (attention
               runs stage-local; use 'xla' or the single-chip Pallas kernel)

    Schedule (tick t = 0 .. M+S-2): stage s processes microbatch (t - s);
    stage 0 feeds microbatch t in, stage S-1 records its finished microbatch,
    one ppermute rotates activations s -> s+1.  Out-of-range ticks (the
    pipeline bubble) compute on don't-care data and are masked out of the
    output buffer.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    use_data = data_axis is not None and data_axis in mesh.axis_names
    batch_spec = P(None, data_axis) if use_data else P(None)

    def executor(blocks, tokens, emb, lora, context, cos, sin, apply_block):
        nb = jax.tree.leaves(blocks)[0].shape[0]
        if nb % S != 0:
            raise ValueError(f"{nb} blocks not divisible by {S} stages")
        b, l, d = tokens.shape
        if b % M != 0:
            raise ValueError(f"batch {b} not divisible by {M} microbatches")
        mb = b // M

        blocks_st = jax.tree.map(
            lambda x: x.reshape(S, nb // S, *x.shape[1:]), blocks
        )
        tokens_mb = tokens.reshape(M, mb, l, d)
        emb_mb = emb.reshape(M, mb, *emb.shape[1:])
        lora_mb = lora.reshape(M, mb, *lora.shape[1:])
        ctx_mb = context.reshape(M, mb, *context.shape[1:])

        def per_device(blocks_local, x_mb, e_mb, lo_mb, c_mb, cos_, sin_):
            blocks_local = jax.tree.map(lambda t: t[0], blocks_local)
            stage = jax.lax.axis_index(axis)

            def stage_fn(x, e, lo, c):
                def body(carry, bp):
                    return apply_block(bp, carry, e, lo, c, cos_, sin_), None

                y, _ = jax.lax.scan(body, x, blocks_local)
                return y

            if remat:
                stage_fn = jax.checkpoint(stage_fn)

            mb_l = x_mb.shape[1]  # local microbatch rows (mb / data)
            out_buf = jnp.zeros((M, mb_l, l, d), x_mb.dtype)
            act0 = jnp.zeros((mb_l, l, d), x_mb.dtype)

            def tick(carry, t):
                act, buf = carry
                idx_in = jnp.clip(t, 0, M - 1)
                feed = jax.lax.dynamic_index_in_dim(
                    x_mb, idx_in, keepdims=False
                )
                x_in = jnp.where(stage == 0, feed, act)
                # Stage s is working on microbatch (t - s): fetch its
                # conditioning (clamped — bubble ticks are don't-care).
                idx_c = jnp.clip(t - stage, 0, M - 1)
                e = jax.lax.dynamic_index_in_dim(e_mb, idx_c, keepdims=False)
                lo = jax.lax.dynamic_index_in_dim(lo_mb, idx_c, keepdims=False)
                c = jax.lax.dynamic_index_in_dim(c_mb, idx_c, keepdims=False)

                y = stage_fn(x_in, e, lo, c)

                idx_out = jnp.clip(t - (S - 1), 0, M - 1)
                write = jnp.logical_and(stage == S - 1, t >= S - 1)
                buf = jnp.where(
                    write,
                    jax.lax.dynamic_update_index_in_dim(buf, y, idx_out, 0),
                    buf,
                )
                # Rotate activations one stage forward.  The wrap-around
                # (last -> 0) carries don't-care data: stage 0 always reads
                # from the feed, never from `act`.
                act = jax.lax.ppermute(
                    y, axis, [(s, (s + 1) % S) for s in range(S)]
                )
                return (act, buf), None

            (_, out_buf), _ = jax.lax.scan(
                tick, (act0, out_buf), jnp.arange(M + S - 1)
            )
            return out_buf

        result = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(axis), batch_spec, batch_spec, batch_spec,
                      batch_spec, P(), P()),
            out_specs=P(axis, data_axis) if use_data else P(axis),
            check_vma=False,
        )(blocks_st, tokens_mb, emb_mb, lora_mb, ctx_mb, cos, sin)
        # (S*M, mb, L, D): stage blocks concatenated on axis 0; only the
        # last stage's M-slab holds the pipeline's true output.
        return result[(S - 1) * M:].reshape(b, l, d)

    return executor
