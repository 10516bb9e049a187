"""Multi-chip scaling harness (BASELINE north-star row 5).

Measures weak scaling over the `data` axis (fixed per-device batch of
DiT denoise steps, DP over the mesh) and strong scaling over the `seq`
axis (fixed global token count, sequence-parallel flash attention) for
device subsets 1..N of whatever is visible.

On this machine only ONE real TPU chip is visible, so a real-slice
scaling row cannot be measured; run with a virtual CPU mesh to validate
the harness itself:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/bench_scaling.py --tiny

On a real v5e slice the same invocation (no flags) measures efficiency
over ICI.  Efficiency = t(1) / t(n) for weak scaling (ideal 1.0).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="scaled-down model (CPU/virtual-mesh validation)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    if args.tiny and "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from diffusionrenderer_tpu.config import DiTConfig
    from diffusionrenderer_tpu.models.dit import dit_forward, init_dit_params

    devs = jax.devices()
    on_tpu = devs[0].platform == "tpu"
    if args.tiny or not on_tpu:
        cfg = DiTConfig(model_channels=128, num_blocks=2, num_heads=4,
                        adaln_lora_dim=16, crossattn_emb_channels=32)
        t, h, w = 2, 16, 16
        dtype = jnp.float32
    else:
        cfg = DiTConfig()
        t, h, w = args.frames, 88, 160
        dtype = jnp.bfloat16

    params = init_dit_params(jax.random.key(0), cfg, dtype=dtype)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    print(f"devices: {len(devs)} x {devs[0].platform}; "
          f"model {cfg.num_blocks} blocks x {cfg.model_channels} ch; "
          f"per-device batch 1 x ({t},{h},{w})")

    results = {}
    for n in sizes:
        mesh = Mesh(np.asarray(devs[:n]).reshape(n,), ("data",))
        bs = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        b = n  # weak scaling: one video per device
        x = jax.device_put(
            jax.random.normal(jax.random.key(1), (b, t, h, w, cfg.in_channels), dtype), bs)
        cond = jax.device_put(
            jax.random.normal(jax.random.key(2), (b, t, h, w, cfg.additional_concat_ch), dtype), bs)
        sig = jax.device_put(jnp.full((b,), 7.5, dtype), bs)
        ctx = jax.device_put(jnp.zeros((b,), jnp.int32), bs)
        p = jax.device_put(params, rep)

        fwd = jax.jit(lambda p, x, s, c, ci: dit_forward(p, x, s, c, ci, cfg))
        out = fwd(p, x, sig, cond, ctx)
        _ = np.asarray(out.addressable_shards[0].data)[0, 0, 0, 0]  # sync
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fwd(p, x * (1.0 + i * 1e-3), sig, cond, ctx)
            _ = np.asarray(out.addressable_shards[0].data)[0, 0, 0, 0]
        dt = (time.perf_counter() - t0) / args.iters
        results[n] = dt
        eff = results[1] / dt
        print(f"  DP weak scaling n={n}: {dt*1e3:8.1f} ms/step "
              f"(efficiency {eff:.3f}, ideal 1.0)")

    # Strong scaling over the seq axis: fixed GLOBAL token count, token axis
    # sharded over `seq`, self-attention through the sequence-parallel flash
    # path (all-gather KV; parallel/flash_sp.py).  Ideal: t(n) = t(1)/n.
    from diffusionrenderer_tpu.parallel import (
        make_mesh, token_sharding_constraint,
    )

    sp_t, sp_h = t, 4 * h  # taller grid so the token axis splits evenly
    print(f"strong scaling (seq axis): global grid ({sp_t},{sp_h},{w}), "
          f"{(sp_t) * (sp_h // 2) * (w // 2)} tokens")
    sp_results = {}
    for n in sizes:
        mesh = make_mesh(n, data=1, seq=n, tensor=1)
        rep = NamedSharding(mesh, P())
        constraint = token_sharding_constraint(mesh)
        x = jax.random.normal(jax.random.key(1), (1, sp_t, sp_h, w,
                                                  cfg.in_channels), dtype)
        cond = jax.random.normal(jax.random.key(2),
                                 (1, sp_t, sp_h, w,
                                  cfg.additional_concat_ch), dtype)
        sig = jnp.full((1,), 7.5, dtype)
        ctx = jnp.zeros((1,), jnp.int32)
        p = jax.device_put(params, rep)

        fwd = jax.jit(lambda p, x, s, c, ci: dit_forward(
            p, x, s, c, ci, cfg, seq_sharding_constraint=constraint,
            attn_backend="flash_sp", mesh=mesh))
        with mesh:
            out = fwd(p, x, sig, cond, ctx)
            _ = np.asarray(out.addressable_shards[0].data)[0, 0, 0, 0]
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = fwd(p, x * (1.0 + i * 1e-3), sig, cond, ctx)
                _ = np.asarray(out.addressable_shards[0].data)[0, 0, 0, 0]
        dt = (time.perf_counter() - t0) / args.iters
        sp_results[n] = dt
        eff = sp_results[1] / (dt * n)
        print(f"  SP strong scaling n={n}: {dt*1e3:8.1f} ms/step "
              f"(speedup {sp_results[1]/dt:.2f}x, efficiency {eff:.3f})")

    if len(sizes) == 1:
        print("NOTE: single device visible — real multi-chip scaling needs a "
              "TPU slice; harness validated, BASELINE row blocked on hardware.")


if __name__ == "__main__":
    main()
