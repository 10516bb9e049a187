"""Microbench: fused W8A8 Pallas quantize-matmul vs the XLA W8A8 path.

Measures the three flagship matmul shapes (SA/CA projections d->d, MLP
up d->4d, MLP down 4d->d) at the flagship token count (28,160) and the
long-video count (56,320), per-channel and per-group(g128) scales, and
reports kernel vs XLA wall + effective int8 TFLOP/s.  This is the evidence
behind the dense_maybe_quantized routing decision (models/quant.py
_use_fused_kernel) — the kernel exists for MEMORY (no L-sized int8/int32
temps, NOTES item 7); this script checks what it costs/buys in TIME.

Usage: python scripts/bench_quant_matmul.py [M ...]   (default 28160 56320)
       python scripts/bench_quant_matmul.py --sweep [M]
The sweep mode times the kernel across (block_m, block_n, block_k)
candidates at the three shapes to pick the shipped defaults.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax, jax.numpy as jnp, numpy as np

from diffusionrenderer_tpu.models import quant
from diffusionrenderer_tpu.ops.quant_matmul import quant_matmul_w8a8

D = 4096
SHAPES = [("proj_dxd", D, D), ("mlp_up_dx4d", D, 4 * D),
          ("mlp_dn_4dxd", 4 * D, D)]
SWEEP = "--sweep" in sys.argv
MS = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or (
    [28160] if SWEEP else [28160, 56320])


def _time(fn, *args, iters=5, **kwargs):
    out = fn(*args, **kwargs)    # compile
    np.asarray(out[0, :8])       # force fetch (axon: block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
        np.asarray(out[0, :8])
    return (time.perf_counter() - t0) / iters


def xla_path(x, w):
    # The reference here is the raw XLA W8A8 math (quantize + int8 einsum +
    # rescale) — NOT dense_maybe_quantized, whose router would bounce
    # flagship shapes back to the kernel under test.
    xq, dequant = quant._quantize_activation(x)
    if quant._is_grouped(w):
        k = xq.shape[-1]
        g = w["sa"].shape[-2]
        xg = xq.reshape(*xq.shape[:-1], g, k // g)
        wg = w["q"].reshape(g, k // g, w["q"].shape[-1])
        y = jnp.einsum("...gk,gko->...go", xg, wg,
                       preferred_element_type=jnp.int32)
        y = jnp.sum(y.astype(jnp.float32) * w["sa"], axis=-2)
        return (y * dequant).astype(x.dtype)
    y = jnp.einsum("...i,io->...o", xq, w["q"],
                   preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * dequant * w["sa"]).astype(x.dtype)


rng = np.random.default_rng(0)

if SWEEP:
    # Block-size sweep at per-channel scales: pick the shipped defaults.
    CANDS = [(256, 512, 512), (512, 512, 512), (512, 1024, 512),
             (1024, 512, 512), (512, 512, 1024), (512, 1024, 1024),
             (1024, 1024, 512), (256, 1024, 512), (1024, 256, 512)]
    for m in MS:
        for name, k, n in SHAPES:
            x = jnp.asarray(rng.standard_normal((m, k), np.float32),
                            jnp.bfloat16)
            wq = jnp.asarray(rng.integers(-127, 128, (k, n), np.int32),
                             jnp.int8)
            scale = jnp.full((n,), 0.01, jnp.float32)
            flops = 2 * m * k * n
            for bm, bn, bk in CANDS:
                if bn > n or bk > k:
                    continue
                try:
                    tk = _time(quant_matmul_w8a8, x, wq, scale,
                               block_m=bm, block_n=bn, block_k=bk)
                except Exception as e:  # noqa: BLE001 — report and keep sweeping
                    print(f"M={m} {name} bm={bm} bn={bn} bk={bk}: "
                          f"FAILED {type(e).__name__}", flush=True)
                    continue
                print(f"M={m} {name} bm={bm} bn={bn} bk={bk}: "
                      f"{tk*1e3:7.2f} ms ({flops/tk/1e12:6.1f} TF/s)",
                      flush=True)
    sys.exit(0)

for m in MS:
    for name, k, n in SHAPES:
        x = jnp.asarray(rng.standard_normal((m, k), np.float32),
                        jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n), np.int32), jnp.int8)
        flops = 2 * m * k * n
        for tag, scale in [("chan", jnp.full((n,), 0.01, jnp.float32)),
                           ("g128", jnp.full((k // 128, n), 0.01,
                                             jnp.float32))]:
            w = {"q": wq, "sa": scale}
            tk = _time(quant_matmul_w8a8, x, wq, scale)
            try:
                tx = _time(jax.jit(xla_path), x, w)
            except Exception as e:  # noqa: BLE001
                # The XLA grouped path materializes an f32 (G, N, L) partial
                # — 59 GB at the flagship MLP-up shape, a guaranteed
                # compile-time OOM.  Report it as such: the kernel is the
                # only viable grouped path at these shapes.
                print(f"M={m} {name} {tag}: kernel {tk*1e3:7.2f} ms "
                      f"({flops/tk/1e12:6.1f} TF/s)  xla FAILED "
                      f"({type(e).__name__}: compile-time OOM on the "
                      f"(G,N,L) partial)", flush=True)
                continue
            print(f"M={m} {name} {tag}: kernel {tk*1e3:7.2f} ms "
                  f"({flops/tk/1e12:6.1f} TF/s)  xla {tx*1e3:7.2f} ms "
                  f"({flops/tx/1e12:6.1f} TF/s)  kernel/xla "
                  f"{tk/tx:.2f}x", flush=True)
