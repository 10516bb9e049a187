"""Benchmark: per-denoise-step DiT latency on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology notes (see BASELINE.md):
* the axon TPU tunnel neither blocks on block_until_ready nor re-executes
  value-identical computations, so every timed call uses distinct inputs and
  forces a device->host fetch;
* vs_baseline is an ESTIMATE BAND, not a measurement (no GPU exists in this
  environment).  Two comparators are emitted per metric:
  - "reference-as-written": the torch reference runs its attention/MLP block
    bodies under fp32 autocast (ref: CleanGeneralDIT.py:509), which on A100
    means TF32 tensor-core matmuls at best — estimated at 40% MFU of
    156 TFLOP/s TF32 peak = 62 TFLOP/s effective.  The primary vs_baseline
    divides by this.
  - "strong-A100-port": a competent port of the same architecture to bf16
    flash-attention on A100 — 312 TFLOP/s bf16 peak x ~50% MFU =
    156 TFLOP/s effective (reported as vs_strong_port).  The honest upper
    bound for "what would the reference cost if someone tuned it";
    vs_strong_port > 1 means one v5e beats even that.

Shape ladder (largest that fits the chip wins):
1. full 7B (28 blocks), flagship 57f x 704x1280 latent -> 28,160 tokens
2. full 7B, single-frame 512x512 latent -> 1,024 tokens (BASELINE config #1)
3. CPU fallback: structurally identical scaled model (CI smoke only)
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Comparator band (see module docstring): reference-as-written vs a strong
# bf16 port.  Both are estimates; every report names which one it divides by.
A100_REF_AS_WRITTEN_FLOPS = 62e12    # TF32 @ 40% MFU
A100_STRONG_PORT_FLOPS = 156e12      # bf16 flash-attention @ ~50% MFU


def dit_step_flops(cfg, l_tokens: int) -> tuple[float, float]:
    """Per-step FLOPs: (executed by this framework, executed by the torch
    reference for the same job).

    Matmul side counts only *per-token* matmuls (AdaLN-LoRA / t-embedder run
    per batch element, not per token).  Cross-attention executes NO per-token
    matmuls here: with a single-token context softmax == 1 and the whole CA
    block collapses to two per-batch matmuls broadcast over L
    (models/dit.py _cross_attention_block; derivation in
    ops/attention.cross_attention_single_kv).  The torch reference runs the
    CA q and output projections over every token (CleanGeneralDIT.py:205-313)
    — that work is charged to the baseline, not to us.

    Attention is 4*L^2*d_model per block (QK^T + PV over all heads), summed
    over ALL blocks.  [Round-2 correction: the earlier formula counted
    attention for one block only — a 28x undercount at the flagship shape,
    understating both achieved TFLOP/s and the baseline step time.]
    """
    d, hid, nb = cfg.model_channels, cfg.hidden_dim, cfg.num_blocks
    per_token = (
        nb * (4 * d * d + 2 * d * hid)          # FA q/k/v/o + MLP per block
        + cfg.patch_dim * d                      # patch embed
        + d * (cfg.patch_spatial ** 2 * cfg.patch_temporal * cfg.out_channels)
    )
    attn = 4.0 * float(l_tokens) ** 2 * d * nb
    flops_exec = 2.0 * per_token * l_tokens + attn
    flops_ref = flops_exec + 2.0 * (nb * 2 * d * d) * l_tokens  # CA q/out proj
    return flops_exec, flops_ref


def _init_bf16(cfg, key, dtype, quant=None):
    """Benchmark weights: small tensors random, the big stacked block tensors
    zero-filled — identical FLOPs/latency, but no RNG temporaries (the
    `normal * scale` pattern transiently doubles each tensor, which OOMs when
    weights ~fill HBM; usable ceiling measured at ~14.5 GiB on this v5e).
    quant='w8'/'w8a8' builds the int8 representation directly (production
    checkpoints are quantized host-side during conversion); 'w8a8' marks the
    leaves for runtime int8 activation quantization (models/quant.py).

    The whole pytree is built inside ONE jit: the axon tunnel pays a remote
    compile round-trip per distinct-shape eager op (~50 leaves were ~8 min
    of init wall-clock; one fused program is seconds)."""
    return jax.jit(
        functools.partial(_init_bf16_build, cfg, dtype=dtype, quant=quant)
    )(key)


def _init_bf16_build(cfg, key, dtype, quant=None):
    d, dh, r = cfg.model_channels, cfg.head_dim, cfg.adaln_lora_dim
    hid, ctx, nb = cfg.hidden_dim, cfg.crossattn_emb_channels, cfg.num_blocks
    keys = iter(jax.random.split(key, 64))
    w = lambda shape: jax.random.normal(next(keys), shape, dtype) * 0.02
    st = lambda shape: jnp.zeros((nb, *shape), dtype)
    if quant:
        # Big matmul weights only (AdaLN stays bf16, as in models/quant.py).
        # quant is any models/quant.parse_quant_mode string, e.g. 'w8a8',
        # 'w8_g128', 'w8a8_g128_keepres' (mixed-precision deployment modes).
        from diffusionrenderer_tpu.models.quant import (
            hadamard_block, parse_quant_mode,
        )

        qm = parse_quant_mode(quant)
        gsz, keep = qm.group_size, qm.keep
        skey = "sa" if qm.act_quant else "s"
        def stq(name, shape):
            if name in keep:
                return st(shape)
            k, n = shape[-2], shape[-1]
            if gsz and k % gsz == 0:
                sshape = (nb, k // gsz, n)
            else:  # narrow inputs (CA wk/wv): per-channel, as models/quant
                sshape = (nb, n)
            leaf = {"q": jnp.zeros((nb, *shape), jnp.int8),
                    skey: jnp.full(sshape, 0.01, jnp.float32)}
            # Transform leaves (values don't matter for step TIMING, the
            # runtime multiply/rotate cost is shape-determined):
            if qm.awq:
                leaf["di"] = jnp.ones((nb, k), jnp.float32)
            if qm.hadamard and hadamard_block(k) > 1:
                leaf["hs"] = jnp.ones((nb, k), jnp.float32)
            return leaf
    else:
        stq = lambda name, shape: st(shape)
    ones = lambda shape: jnp.ones(shape, dtype)
    mix_n = 0
    if quant:
        mix_n = min(qm.mix_blocks, nb)
    params = {
        "x_embedder": {"weight": w((cfg.patch_dim, d))},
        "t_embedder": {"w1": w((d, d)), "w2": w((d, 3 * d))},
        "affline_norm": {"weight": ones((d,))},
        "blocks": {
            "fa": {"adaln_w1": st((d, r)), "adaln_w2": st((r, 3 * d)),
                   "wq": stq("wq", (d, d)), "wk": stq("wk", (d, d)),
                   "wv": stq("wv", (d, d)), "wo": stq("wo", (d, d)),
                   "q_norm": ones((nb, dh)), "k_norm": ones((nb, dh))},
            "ca": {"adaln_w1": st((d, r)), "adaln_w2": st((r, 3 * d)),
                   "wq": stq("wq", (d, d)), "wk": stq("wk", (ctx, d)),
                   "wv": stq("wv", (ctx, d)), "wo": stq("wo", (d, d)),
                   "q_norm": ones((nb, dh)), "k_norm": ones((nb, dh))},
            "mlp": {"adaln_w1": st((d, r)), "adaln_w2": st((r, 3 * d)),
                    "w1": stq("w1", (d, hid)), "w2": stq("w2", (hid, d))},
        },
        "final": {"adaln_w1": w((d, r)), "adaln_w2": w((r, 2 * d)),
                  "linear": w((d, cfg.patch_spatial**2 * cfg.patch_temporal
                               * cfg.out_channels))},
        "context_embedding": {"weight": w((16, ctx))},
    }
    if mix_n:
        # '_mixN' blockwise mixed precision: segment layout matches the
        # boundary split (timing is segment-layout-invariant — same op mix).
        half = (mix_n + 1) // 2

        def seg(blocks, s, e, bf16):
            def leaf(v):
                if isinstance(v, dict):
                    return {k: x[s:e] for k, x in v.items()}
                return v[s:e]

            out = {sub: {n_: leaf(v) for n_, v in blocks[sub].items()}
                   for sub in blocks}
            if bf16:
                out = {sub: {n_: (jnp.zeros((e - s, *v["q"].shape[1:]),
                                            dtype)
                                  if isinstance(v, dict) else v)
                             for n_, v in out[sub].items()}
                       for sub in out}
            return out

        b = params["blocks"]
        segs = []
        if half:
            segs.append(seg(b, 0, half, True))
        segs.append(seg(b, half, nb - (mix_n - half), False))
        if mix_n - half:
            segs.append(seg(b, nb - (mix_n - half), nb, True))
        params["blocks"] = tuple(segs)
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


def _bench_config(cfg, t, h, w, dtype, n_iters=3, quant=None):
    from diffusionrenderer_tpu.models.dit import dit_forward

    params = _init_bf16(cfg, jax.random.key(0), dtype, quant=quant)
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


def run_rung(metric, cfg, thw, dtype, quant) -> None:
    """Execute a single rung and print its JSON line (subprocess entry)."""
    t, h, w = thw
    dt = _bench_config(cfg, t, h, w, dtype, quant=quant)
    tokens = (t // cfg.patch_temporal) * (h // cfg.patch_spatial) * (
        w // cfg.patch_spatial
    )
    flops_exec, flops_ref = dit_step_flops(cfg, tokens)
    # Both comparators are charged the FLOPs the reference actually executes
    # (incl. its per-token cross-attn projections, which this framework's CA
    # collapse eliminates).  Estimates, not measurements: no GPU exists in
    # this environment (see BASELINE.md).
    base_ref_s = flops_ref / A100_REF_AS_WRITTEN_FLOPS
    base_strong_s = flops_ref / A100_STRONG_PORT_FLOPS
    print(json.dumps({
        "metric": metric,
        "value": round(dt * 1e3, 2),
        "unit": "ms",
        "vs_baseline": round(base_ref_s / dt, 3),
        "baseline_note": "estimated A100 reference-as-written (TF32 @ 40% "
                         "MFU, 62 TFLOP/s)",
        "vs_strong_port": round(base_strong_s / dt, 3),
        "strong_port_note": "estimated strong A100 port (bf16 flash @ ~50% "
                            "MFU, 156 TFLOP/s)",
    }))
    print(
        f"# {tokens} tokens, {flops_exec/1e12:.1f} TFLOP/step executed "
        f"(ref executes {flops_ref/1e12:.1f}), achieved "
        f"{flops_exec/dt/1e12:.1f} TFLOP/s; comparator band: "
        f"reference-as-written {base_ref_s*1e3:.0f} ms "
        f"(vs_baseline {base_ref_s/dt:.2f}x), strong A100 port "
        f"{base_strong_s*1e3:.0f} ms (vs_strong_port {base_strong_s/dt:.2f}x)",
        file=sys.stderr,
    )


def run_shardcheck() -> None:
    """COMPILED Pallas flash under shard_map on a real 1-device TPU mesh.

    Off-TPU meshes run the kernel in interpret mode, so without this the
    compiled-kernel-under-shard_map combination would be untested on real
    hardware anywhere (BASELINE.md virtual-mesh caveat).  Checks numerics
    against the directly-called kernel."""
    from diffusionrenderer_tpu.ops.flash_attention import flash_attention
    from diffusionrenderer_tpu.parallel.flash_sp import make_sp_attention
    from diffusionrenderer_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(1, data=1, seq=1, tensor=1)
    attn = make_sp_attention(mesh)
    b, l, h, d = 1, 1024, 32, 128
    q, k, v = (
        jax.random.normal(jax.random.key(i), (b, l, h, d), jnp.bfloat16)
        for i in range(3)
    )
    with mesh:
        out = attn(q, k, v)
    ref = flash_attention(q, k, v)
    err = float(np.asarray(jnp.max(jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32)))))
    assert err < 1e-2, f"shard_map flash drifted {err} from direct kernel"
    print(f"# shard_map(flash) single-chip TPU check OK "
          f"(max |delta| vs direct kernel: {err:.3g})", file=sys.stderr)


def run_qmmcheck() -> None:
    """COMPILED fused W8A8 kernel integer-exactness on the real chip.

    Interpret-mode tests can't catch Mosaic lowering bugs (round 4 found the
    grouped-scale BlockSpec was illegal on real TPU while interpret mode
    passed), so the compiled kernel is checked here: per-token scales are
    forced to exactly 1.0 (row amax 127) so per-channel output must equal an
    int64 host matmul exactly, and grouped folds must match an fp64 oracle to
    1 fp32 ULP of the accumulator with power-of-two scales."""
    from diffusionrenderer_tpu.ops.quant_matmul import quant_matmul_w8a8

    rng = np.random.default_rng(0)
    m, k, n = 512, 2048, 512
    q = rng.integers(-127, 128, (k, n), dtype=np.int8)
    xi = rng.integers(-126, 127, (m, k)).astype(np.float32)
    xi[:, 0] = 127.0  # amax exactly 127 -> inv == 1.0, codes == x
    x, wq = jnp.asarray(xi), jnp.asarray(q)
    ref = xi.astype(np.int64) @ q.astype(np.int64)
    got = np.asarray(quant_matmul_w8a8(x, wq, jnp.ones((n,), jnp.float32),
                                       interpret=False), np.float64)
    assert np.array_equal(got, ref), "per-channel compiled kernel not exact"
    for gsz in (128, 512, 1024):
        sg = (2.0 ** rng.integers(-3, 3, (k // gsz, n))).astype(np.float32)
        got = np.asarray(quant_matmul_w8a8(x, wq, jnp.asarray(sg),
                                           interpret=False), np.float64)
        yg = np.einsum("lgk,gko->lgo",
                       xi.astype(np.int64).reshape(m, k // gsz, gsz),
                       q.astype(np.int64).reshape(k // gsz, gsz, n))
        refg = (yg * sg.astype(np.float64)[None]).sum(1)
        tol = np.abs(refg).max() * 2.0**-23  # 1 fp32 ULP of the accumulator
        err = np.abs(got - refg).max()
        assert err <= tol, f"g{gsz} compiled kernel fold drift {err} > {tol}"
    print("# compiled W8A8 kernel on-chip check OK (per-channel exact; "
          "grouped folds within 1 fp32 ULP)", file=sys.stderr)


def main() -> None:
    from diffusionrenderer_tpu.config import DiTConfig
    from diffusionrenderer_tpu.models.dit import dit_param_count

    on_tpu = jax.devices()[0].platform == "tpu"

    if on_tpu:
        ladder = [
            # bf16 weights at flagship tokens do not fit one v5e
            # (13.48 GiB + activations > ~14.5 GiB usable) — int8
            # quantization is the single-chip flagship path; W8A8 runs the
            # dense matmuls on the MXU's 2x-throughput int8 path.
            ("dit_step_ms_7b_flagship_28160tok_w8a8", DiTConfig(),
             (8, 88, 160), jnp.bfloat16, "w8a8"),
            # Grouped-scale / mixed-precision deployment modes (accuracy
            # ladder, BASELINE.md); not the headline — run explicitly with
            # --rung=1 / --rung=2.
            ("dit_step_ms_7b_flagship_28160tok_w8a8_g128", DiTConfig(),
             (8, 88, 160), jnp.bfloat16, "w8a8_g128"),
            ("dit_step_ms_7b_flagship_28160tok_w8a8_g128_keepres",
             DiTConfig(), (8, 88, 160), jnp.bfloat16, "w8a8_g128_keepres"),
            ("dit_step_ms_7b_flagship_28160tok_int8w", DiTConfig(),
             (8, 88, 160), jnp.bfloat16, "w8"),
            ("dit_step_ms_7b_512x512_1024tok", DiTConfig(), (1, 64, 64),
             jnp.bfloat16, None),
        ]
    else:
        tiny = DiTConfig(model_channels=128, num_blocks=2, num_heads=4,
                         adaln_lora_dim=16, crossattn_emb_channels=32)
        ladder = [("dit_step_ms_tiny_cpu", tiny, (1, 16, 16), jnp.float32,
                   None)]

    if len(sys.argv) > 1 and sys.argv[1] == "--shardcheck":
        run_shardcheck()
        return

    if len(sys.argv) > 1 and sys.argv[1] == "--qmmcheck":
        run_qmmcheck()
        return

    if len(sys.argv) > 1 and sys.argv[1].startswith("--rung="):
        # Subprocess mode: run exactly one rung by index.
        idx = int(sys.argv[1].split("=")[1])
        metric, cfg, thw, dtype, quant = ladder[idx]
        run_rung(metric, cfg, thw, dtype, quant)
        return

    if len(sys.argv) > 1 and sys.argv[1].startswith("--mode="):
        # Ad-hoc rung: step-time ANY accuracy-ladder quant mode (w8a8_g32,
        # w8_g32_keepres_keepattn, ...) at the flagship shape without
        # growing the permanent rung list.
        from diffusionrenderer_tpu.models.quant import parse_quant_mode
        mode = sys.argv[1].split("=", 1)[1]
        parse_quant_mode(mode)  # validate before paying the compile
        run_rung(f"dit_step_ms_7b_flagship_28160tok_{mode}", DiTConfig(),
                 (8, 88, 160), jnp.bfloat16, mode)
        return

    # Parent mode: try rungs in isolated subprocesses — a failed (OOM) rung
    # must not poison device memory for the next one.
    import subprocess

    last_err = "no rung attempted"
    for idx, (metric, cfg, (t, h, w), dtype, quant) in enumerate(ladder):
        tokens = (t // cfg.patch_temporal) * (h // cfg.patch_spatial) * (
            w // cfg.patch_spatial
        )
        eff_dtype = jnp.int8 if quant else dtype
        if on_tpu and not _fits_hbm(cfg, tokens, eff_dtype):
            print(f"# rung {metric} skipped: exceeds single-chip HBM budget "
                  f"(needs TP>=2 or int8 weights)", file=sys.stderr)
            continue
        try:
            # Axon remote compiles of the 28-block flagship program are
            # minutes and vary run to run; give each rung a wide margin.
            proc = subprocess.run(
                [sys.executable, __file__, f"--rung={idx}"],
                capture_output=True, text=True, timeout=2700,
            )
        except subprocess.TimeoutExpired:
            last_err = f"rung {metric} timed out"
            print(f"# {last_err}", file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr[-2000:])
        if proc.returncode == 0 and proc.stdout.strip():
            sys.stdout.write(proc.stdout)
            if on_tpu:
                # Exercise the compiled kernel-under-shard_map and compiled
                # fused-W8A8-kernel paths on the real chip (advisory:
                # logged, never fails the bench).
                for flag in ("--shardcheck", "--qmmcheck"):
                    try:
                        # Remote compiles vary minutes run-to-run; 600 s
                        # timed out on a slow day (round 4) with the check
                        # itself healthy.
                        sc = subprocess.run(
                            [sys.executable, __file__, flag],
                            capture_output=True, text=True, timeout=1200,
                        )
                        sys.stderr.write(sc.stderr[-1000:])
                        if sc.returncode != 0:
                            print(f"# {flag} failed (advisory)",
                                  file=sys.stderr)
                    except subprocess.TimeoutExpired:
                        print(f"# {flag} timed out (advisory)",
                              file=sys.stderr)
            return
        last_err = f"rung {metric} rc={proc.returncode}"
        print(f"# {last_err}", file=sys.stderr)
    raise SystemExit(f"all bench rungs failed: {last_err}")



if __name__ == "__main__":
    main()
