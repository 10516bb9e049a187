"""GeneralDIT — the 7B video diffusion transformer, TPU-native.

Functionally equivalent to the reference CleanGeneralDIT /
CleanDiffusionRendererGeneralDIT (/root/reference/CleanGeneralDIT.py:593-751)
but designed for XLA rather than translated from torch:

* params are a plain pytree; the 28 transformer blocks are STACKED along a
  leading axis and executed with `lax.scan` — one traced block instead of 28
  (fast compiles, natural pipeline-parallel chunking later);
* batch-first (B, L, D) token layout (the reference uses (L, B, D), a
  transformer_engine artifact);
* cross-attention context is a single token, for which softmax over the key
  axis is identically 1 — the CA block collapses exactly to a broadcast of
  to_out(W_v @ context) (see ops/attention.cross_attention_single_kv);
* fp32 islands preserved deliberately: RMSNorm / LayerNorm statistics, AdaLN
  modulation, rope tables (ref: CleanGeneralDIT.py:23-33,481,509);
* matmuls run in the params' dtype (bf16 in production) with fp32
  accumulation via preferred_element_type.

Block sub-structure (FA -> CA -> MLP, ref: CleanGeneralDIT.py:519-545):
  each sub-block is AdaLN(shift, scale, gate = SiLU->Lin->Lin(emb) + shared
  lora) -> LayerNorm -> modulate -> body -> x + gate * out
  (ref: CleanGeneralDIT.py:492-517).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import DiTConfig
from ..ops.attention import attention, attention_xla
from ..ops.norms import adaln_modulation, layer_norm_no_affine, modulate, rms_norm
from ..ops.patch import patch_embed, unpatchify
from ..ops.rope import rope_3d_angles
from ..ops.timestep import timestep_embedding

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def init_dit_params(
    key: jax.Array,
    cfg: DiTConfig,
    dtype: jnp.dtype = jnp.bfloat16,
    scale: float = 0.02,
) -> Params:
    """Random-normal init with the checkpoint's exact tensor shapes.

    Production weights come from the converted Cosmos checkpoint
    (checkpoint.py); this init exists for tests and benchmarks.  Built
    inside ONE jit: remote runtimes (axon tunnel) pay a compile round-trip
    per distinct-shape eager op."""
    build = functools.partial(
        _init_dit_params_build, cfg=cfg, dtype=dtype, scale=scale
    )
    return jax.jit(build)(key)


def _init_dit_params_build(
    key: jax.Array,
    cfg: DiTConfig,
    dtype: jnp.dtype = jnp.bfloat16,
    scale: float = 0.02,
) -> Params:
    d = cfg.model_channels
    dh = cfg.head_dim
    r = cfg.adaln_lora_dim
    hid = cfg.hidden_dim
    ctx = cfg.crossattn_emb_channels
    nb = cfg.num_blocks

    keys = iter(jax.random.split(key, 64))

    def w(shape, k=None):
        k = next(keys) if k is None else k
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    def stacked(shape):
        return w((nb, *shape))

    params: Params = {
        "x_embedder": {"weight": w((cfg.patch_dim, d))},
        "t_embedder": {"w1": w((d, d)), "w2": w((d, 3 * d))},
        "affline_norm": {"weight": jnp.ones((d,), dtype)},
        "blocks": {
            "fa": {
                "adaln_w1": stacked((d, r)),
                "adaln_w2": stacked((r, 3 * d)),
                "wq": stacked((d, d)),
                "wk": stacked((d, d)),
                "wv": stacked((d, d)),
                "wo": stacked((d, d)),
                "q_norm": jnp.ones((nb, dh), dtype),
                "k_norm": jnp.ones((nb, dh), dtype),
            },
            "ca": {
                "adaln_w1": stacked((d, r)),
                "adaln_w2": stacked((r, 3 * d)),
                "wq": stacked((d, d)),
                "wk": stacked((ctx, d)),
                "wv": stacked((ctx, d)),
                "wo": stacked((d, d)),
                "q_norm": jnp.ones((nb, dh), dtype),
                "k_norm": jnp.ones((nb, dh), dtype),
            },
            "mlp": {
                "adaln_w1": stacked((d, r)),
                "adaln_w2": stacked((r, 3 * d)),
                "w1": stacked((d, hid)),
                "w2": stacked((hid, d)),
            },
        },
        "final": {
            "adaln_w1": w((d, r)),
            "adaln_w2": w((r, 2 * d)),
            "linear": w(
                (d, cfg.patch_spatial**2 * cfg.patch_temporal * cfg.out_channels)
            ),
        },
    }
    if cfg.patch_embed_bias:
        params["x_embedder"]["bias"] = jnp.zeros((d,), dtype)
    if cfg.use_context_embedding:
        params["context_embedding"] = {
            "weight": w((cfg.num_context_embeddings, ctx))
        }
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _dense(x: jax.Array, w) -> jax.Array:
    """x @ w with fp32 accumulation, output in x.dtype.  Transparently
    supports weight-only int8 ({'q','s'} leaves from models/quant.py)."""
    from .quant import dense_maybe_quantized

    return dense_maybe_quantized(x, w)


def _adaln(x, emb, lora, bp, n_chunks=3):
    """Compute (chunks..., modulated_x) for one sub-block."""
    mod = adaln_modulation(emb, bp["adaln_w1"], bp["adaln_w2"], lora)
    chunks = jnp.split(mod, n_chunks, axis=-1)
    chunks = [c.astype(x.dtype) for c in chunks]
    shift, scale = chunks[0], chunks[1]
    xm = modulate(layer_norm_no_affine(x), shift, scale)
    return chunks, xm


def _self_attention_block(
    x: jax.Array,
    emb: jax.Array,
    lora: jax.Array,
    bp: Params,
    cos_sin: tuple[jax.Array, jax.Array],
    num_heads: int,
    attn_backend: str,
    sites: dict | None = None,
) -> jax.Array:
    (_, _, gate), xm = _adaln(x, emb, lora, bp)
    b, l, d = xm.shape
    dh = d // num_heads

    if sites is not None:
        sites["fa.qkv"] = xm
    q = _dense(xm, bp["wq"]).reshape(b, l, num_heads, dh)
    k = _dense(xm, bp["wk"]).reshape(b, l, num_heads, dh)
    v = _dense(xm, bp["wv"]).reshape(b, l, num_heads, dh)
    # Per-head q/k RMSNorm, identity on v — the "RRI" scheme
    # (ref: CleanGeneralDIT.py:218,241-252).
    q = rms_norm(q, bp["q_norm"])
    k = rms_norm(k, bp["k_norm"])

    cos, sin = cos_sin
    q = _apply_rope_cached(q, cos, sin)
    k = _apply_rope_cached(k, cos, sin)

    if callable(attn_backend):  # sequence-parallel shard_map'd kernel
        o = attn_backend(q, k, v)
    else:
        o = attention(q, k, v, backend=attn_backend)
    o_flat = o.reshape(b, l, d)
    if sites is not None:
        sites["fa.wo"] = o_flat
    o = _dense(o_flat, bp["wo"])
    return x + gate[:, None, :] * o


def _apply_rope_cached(x, cos, sin):
    """Rotate-half rope application with precomputed cos/sin (L, Dh)."""
    cos = cos.astype(x.dtype)[None, :, None, :]
    sin = sin.astype(x.dtype)[None, :, None, :]
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos + rotated * sin


def _cross_attention_block(
    x: jax.Array,
    emb: jax.Array,
    lora: jax.Array,
    bp: Params,
    context: jax.Array,
    num_heads: int,
    sites: dict | None = None,
) -> jax.Array:
    (_, _, gate), xm = _adaln(x, emb, lora, bp)
    b, l, d = xm.shape
    dh = d // num_heads
    m = context.shape[1]

    if m == 1:
        # Exact single-KV identity: softmax over one key == 1, output == v
        # (see ops.attention.cross_attention_single_kv for the derivation).
        if sites is not None:
            sites["ca.wv"] = context
        v = _dense(context, bp["wv"])  # (B, 1, D)
        if sites is not None:
            sites["ca.wo"] = v
        o = _dense(v, bp["wo"])  # (B, 1, D)
        return x + gate[:, None, :] * o  # broadcast over L
    # General path (kept for multi-token contexts).
    q = _dense(xm, bp["wq"]).reshape(b, l, num_heads, dh)
    k = _dense(context, bp["wk"]).reshape(b, m, num_heads, dh)
    v = _dense(context, bp["wv"]).reshape(b, m, num_heads, dh)
    q = rms_norm(q, bp["q_norm"])
    k = rms_norm(k, bp["k_norm"])
    o = attention_xla(q, k, v)
    o = _dense(o.reshape(b, l, d), bp["wo"])
    return x + gate[:, None, :] * o


def make_block_apply(
    cfg: DiTConfig,
    attn_backend="auto",
    mlp_token_chunks: int = 1,
    capture_sites: bool = False,
):
    """One FA-CA-MLP block as a pure function of explicit inputs.

    apply(bp, x, emb, lora, context, cos, sin) -> x'
    (with capture_sites: -> (x', sites) where sites maps the quantization
    calibration site names of models/quant.LEAF_SITE to the dense-input
    tensors observed by this block — consumed by models/calibrate.py.)

    No tracers are closed over (cfg / backend / chunking are static), so the
    returned callable is safe to use inside `shard_map` bodies — this is the
    unit the pipeline-parallel executor (parallel/pipeline_parallel.py)
    schedules per stage.
    """

    def apply(bp, x, emb, lora, context, cos, sin):
        sites: dict | None = {} if capture_sites else None
        y = _self_attention_block(
            x, emb, lora, bp["fa"], (cos, sin), cfg.num_heads, attn_backend,
            sites=sites,
        )
        y = _cross_attention_block(
            y, emb, lora, bp["ca"], context, cfg.num_heads, sites=sites
        )
        y = _mlp_block(y, emb, lora, bp["mlp"],
                       token_chunks=mlp_token_chunks, sites=sites)
        return (y, sites) if capture_sites else y

    return apply


def _mlp_block(x, emb, lora, bp, token_chunks: int = 1,
               sites: dict | None = None):
    (_, _, gate), xm = _adaln(x, emb, lora, bp)
    if sites is not None:
        sites["mlp.w1"] = xm

    def ff(xc):
        h = _dense(xc, bp["w1"])
        # torch nn.GELU default is the exact erf form (ref:
        # CleanGeneralDIT.py:442-462); jax defaults to tanh approx, so be
        # explicit.
        h = jax.nn.gelu(h, approximate=False)
        if sites is not None and token_chunks <= 1:
            # (chunked ff runs under lax.map — a dict write there would
            # leak tracers; calibration uses token_chunks=1)
            sites["mlp.w2"] = h
        return _dense(h, bp["w2"])

    b, l, d = xm.shape
    if token_chunks > 1 and l % token_chunks == 0:
        # Bound the (L, 4*D) hidden activation: process the token axis in
        # chunks.  Memory, not math — each token's MLP is independent.
        xc = xm.reshape(b, token_chunks, l // token_chunks, d)
        o = jax.lax.map(ff, xc.transpose(1, 0, 2, 3)).transpose(1, 0, 2, 3)
        o = o.reshape(b, l, d)
    else:
        o = ff(xm)
    return x + gate[:, None, :] * o


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def dit_forward(
    params: Params,
    x: jax.Array,
    sigma: jax.Array,
    latent_condition: jax.Array,
    context_index: Optional[jax.Array],
    cfg: DiTConfig,
    *,
    crossattn_emb: Optional[jax.Array] = None,
    attn_backend: str = "auto",
    seq_sharding_constraint=None,
    mesh=None,
    mlp_token_chunks: int = 1,
    block_executor=None,
) -> jax.Array:
    """One denoiser evaluation F(x; sigma, condition).

    Args:
      params: pytree from init_dit_params / checkpoint converter.
      x: (B, T, H, W, C_in) channels-last noised latent (already c_in-scaled).
      sigma: (B,) noise levels — the DiT is conditioned on raw sigma
        (ref: model_diffusion_renderer.py:224-227).
      latent_condition: (B, T, H, W, C_cond) encoded conditions.
      context_index: (B,) int32 G-buffer selector for the inverse renderer,
        embedded via a 16-entry table (ref: CleanGeneralDIT.py:728-737);
        ignored when cfg.use_context_embedding is False (forward renderer
        uses a zero context, ref: CleanGeneralDIT.py:738-742).
      crossattn_emb: optional explicit (B, M, C_ctx) context overriding the
        embedding lookup.
      seq_sharding_constraint: optional callable applied to the (B, L, D)
        activations to pin a sequence-parallel layout.

    Returns (B, T, H, W, C_out).
    """
    b, t, h, w, _ = x.shape
    d = cfg.model_channels
    compute_dtype = x.dtype

    # 1. Timestep embedding: main emb is the raw sinusoid; the MLP output is
    # the shared AdaLN-LoRA vector (ref: CleanGeneralDIT.py:362-370).
    t_emb, lora = timestep_embedding(
        sigma.astype(compute_dtype),
        params["t_embedder"]["w1"],
        params["t_embedder"]["w2"],
        d,
    )
    affline_emb = rms_norm(t_emb, params["affline_norm"]["weight"])

    # 2. Cross-attention context.
    if crossattn_emb is not None:
        context = crossattn_emb.astype(compute_dtype)
    elif cfg.use_context_embedding:
        table = params["context_embedding"]["weight"]
        context = table[context_index.reshape(b).astype(jnp.int32)][:, None, :]
        context = context.astype(compute_dtype)
    else:
        context = jnp.zeros((b, 1, cfg.crossattn_emb_channels), compute_dtype)

    # 3. Concat [x, latent_condition, padding-mask of ones] on channels
    # (ref: CleanGeneralDIT.py:669-675).
    parts = [x, latent_condition.astype(compute_dtype)]
    if cfg.concat_padding_mask:
        parts.append(jnp.ones((b, t, h, w, 1), compute_dtype))
    x_cond = jnp.concatenate(parts, axis=-1)

    # 4. Patchify + embed -> (B, L, D).
    xe = params["x_embedder"]
    x_patches = patch_embed(
        x_cond, xe["weight"], xe.get("bias"), cfg.patch_spatial, cfg.patch_temporal
    )
    _, tp, hp, wp, _ = x_patches.shape
    tokens = x_patches.reshape(b, tp * hp * wp, d)
    if seq_sharding_constraint is not None:
        tokens = seq_sharding_constraint(tokens)

    # 5. RoPE tables, precomputed once for all 28 blocks.
    angles = rope_3d_angles(
        tp, hp, wp, cfg.head_dim,
        h_ntk_factor=cfg.rope_h_extrapolation_ratio,
        w_ntk_factor=cfg.rope_w_extrapolation_ratio,
        t_ntk_factor=cfg.rope_t_extrapolation_ratio,
    )
    cos_sin = (jnp.cos(angles), jnp.sin(angles))

    # Multi-chip: a pallas_call does not auto-partition under SPMD, so the
    # sharded path routes attention through a shard_map'd kernel
    # (parallel/flash_sp.py: all-gather-KV flash, or ring attention).
    if seq_sharding_constraint is not None:
        if attn_backend in ("flash_sp", "ring") and mesh is not None:
            from ..parallel.flash_sp import make_sp_attention

            attn_backend = make_sp_attention(
                mesh, impl="ring" if attn_backend == "ring" else "flash"
            )
        elif attn_backend == "auto":
            l_tokens = tp * hp * wp
            divisible = mesh is not None and (
                l_tokens % mesh.shape.get("seq", 1) == 0
                and cfg.num_heads % mesh.shape.get("tensor", 1) == 0
                and b % mesh.shape.get("data", 1) == 0
            )
            if divisible and jax.devices()[0].platform == "tpu":
                from ..parallel.flash_sp import make_sp_attention

                attn_backend = make_sp_attention(mesh, impl="flash")
            else:
                # CPU meshes (tests/dryrun): interpreted Pallas is far slower
                # than XLA's partitioned einsum attention.
                attn_backend = "xla"

    # 6. Scan over the stacked FA-CA-MLP blocks (or hand the stacked blocks
    # to a pluggable executor — the pipeline-parallel scheduler plugs in
    # here, see parallel/pipeline_parallel.py).
    apply_block = make_block_apply(cfg, attn_backend, mlp_token_chunks)
    # '_mixN' blockwise mixed precision (models/quant.py) delivers the
    # blocks as a tuple of stacked segments (bf16 / int8 alternating in
    # block order) — one lax.scan per segment keeps each scan's carry
    # homogeneous.  The plain path is the 1-segment special case.
    segments = (params["blocks"]
                if isinstance(params["blocks"], (tuple, list))
                else (params["blocks"],))
    if block_executor is not None:
        if len(segments) != 1:
            raise ValueError(
                "block_executor (pipeline parallelism / calibration "
                "capture) does not support '_mixN' segmented blocks — "
                "use a uniform quant mode there")
        cos, sin = cos_sin
        tokens = block_executor(
            segments[0], tokens, affline_emb, lora, context, cos, sin,
            apply_block,
        )
    else:
        def block_fn(carry, bp):
            y = apply_block(bp, carry, affline_emb, lora, context, *cos_sin)
            if seq_sharding_constraint is not None:
                y = seq_sharding_constraint(y)
            return y, None

        for seg in segments:
            tokens, _ = jax.lax.scan(block_fn, tokens, seg)

    # 7. Final layer: 2-chunk AdaLN using the first 2D slice of the shared
    # lora vector (ref: CleanGeneralDIT.py:567-590).
    fin = params["final"]
    mod = adaln_modulation(
        affline_emb, fin["adaln_w1"], fin["adaln_w2"], lora[:, : 2 * d]
    )
    shift, scale = [c.astype(compute_dtype) for c in jnp.split(mod, 2, axis=-1)]
    xm = modulate(layer_norm_no_affine(tokens), shift, scale)
    out = _dense(xm, fin["linear"])  # (B, L, ph*pw*pt*C)

    # 8. Unpatchify back to (B, T, H, W, C_out).
    return unpatchify(
        out, tp, hp, wp, cfg.patch_spatial, cfg.patch_temporal, cfg.out_channels
    )


def dit_param_count(cfg: DiTConfig) -> int:
    """Analytic parameter count (for sanity checks; ~7.16B for FADITV2_7B)."""
    d, r, hid, ctx = (
        cfg.model_channels,
        cfg.adaln_lora_dim,
        cfg.hidden_dim,
        cfg.crossattn_emb_channels,
    )
    dh = cfg.head_dim
    per_adaln = d * r + r * 3 * d
    fa = per_adaln + 4 * d * d + 2 * dh
    ca = per_adaln + 2 * d * d + 2 * ctx * d + 2 * dh
    mlp = per_adaln + 2 * d * hid
    blocks = cfg.num_blocks * (fa + ca + mlp)
    stem = cfg.patch_dim * d + d * d + d * 3 * d + d
    final = d * r + r * 2 * d + d * (
        cfg.patch_spatial**2 * cfg.patch_temporal * cfg.out_channels
    )
    ctx_emb = cfg.num_context_embeddings * ctx if cfg.use_context_embedding else 0
    return blocks + stem + final + ctx_emb
