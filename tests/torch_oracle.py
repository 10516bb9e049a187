"""Compact torch oracle of the GeneralDIT forward pass for parity testing.

This re-states the reference network math (/root/reference/CleanGeneralDIT.py)
as ~100 lines of functional torch reading weights from a state dict that uses
the *checkpoint's* parameter names (see checkpoint.py docstring).  It is the
oracle both for dit_forward numerics and for the state-dict converter.

Everything runs in fp32 on CPU.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F

from diffusionrenderer_tpu.config import DiTConfig


def make_oracle_state_dict(cfg: DiTConfig, seed: int = 0) -> dict:
    """Random state dict with exactly the reference checkpoint's names/shapes."""
    g = torch.Generator().manual_seed(seed)
    d, r, dh = cfg.model_channels, cfg.adaln_lora_dim, cfg.head_dim
    hid, ctx = cfg.hidden_dim, cfg.crossattn_emb_channels

    def w(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "net.x_embedder.proj.1.weight": w(d, cfg.patch_dim),
        "net.t_embedder.1.linear_1.weight": w(d, d),
        "net.t_embedder.1.linear_2.weight": w(3 * d, d),
        "net.affline_norm.weight": 1.0 + 0.1 * w(d),
        "net.final_layer.adaLN_modulation.1.weight": w(r, d),
        "net.final_layer.adaLN_modulation.2.weight": w(2 * d, r),
        "net.final_layer.linear.weight": w(
            cfg.patch_spatial**2 * cfg.patch_temporal * cfg.out_channels, d
        ),
        "logvar.0.freqs": torch.randn(128, generator=g),
        "logvar.0.phases": torch.randn(128, generator=g),
        "logvar.1.weight": w(1, 128),
    }
    if cfg.use_context_embedding:
        sd["net.context_embedding.weight"] = w(cfg.num_context_embeddings, ctx)
    if cfg.patch_embed_bias:
        sd["net.x_embedder.proj.1.bias"] = w(d)
    for i in range(cfg.num_blocks):
        for j, kind in enumerate(("fa", "ca", "mlp")):
            base = f"net.blocks.block{i}.blocks.{j}."
            sd[base + "adaLN_modulation.1.weight"] = w(r, d)
            sd[base + "adaLN_modulation.2.weight"] = w(3 * d, r)
            if kind == "mlp":
                sd[base + "block.layer1.weight"] = w(hid, d)
                sd[base + "block.layer2.weight"] = w(d, hid)
            else:
                cin = d if kind == "fa" else ctx
                sd[base + "block.attn.to_q.0.weight"] = w(d, d)
                sd[base + "block.attn.to_k.0.weight"] = w(d, cin)
                sd[base + "block.attn.to_v.0.weight"] = w(d, cin)
                sd[base + "block.attn.to_out.0.weight"] = w(d, d)
                sd[base + "block.attn.to_q.1.weight"] = 1.0 + 0.1 * w(dh)
                sd[base + "block.attn.to_k.1.weight"] = 1.0 + 0.1 * w(dh)
    return sd


def _rms(x, weight, eps=1e-6):
    var = x.pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(var + eps) * weight


def _rope_table(t, h, w, head_dim, t_ntk=2.0):
    dim_h = head_dim // 6 * 2
    dim_t = head_dim - 2 * dim_h
    sp = torch.arange(0, dim_h, 2)[: dim_h // 2].float() / dim_h
    tp = torch.arange(0, dim_t, 2)[: dim_t // 2].float() / dim_t
    hf, wf = 1.0 / (10000.0**sp), 1.0 / (10000.0**sp)
    tf = 1.0 / ((10000.0 * t_ntk) ** tp)
    et = torch.outer(torch.arange(t).float(), tf)
    eh = torch.outer(torch.arange(h).float(), hf)
    ew = torch.outer(torch.arange(w).float(), wf)
    parts = [
        et[:, None, None, :].expand(t, h, w, -1),
        eh[None, :, None, :].expand(t, h, w, -1),
        ew[None, None, :, :].expand(t, h, w, -1),
    ]
    return torch.cat(parts * 2, dim=-1).reshape(t * h * w, head_dim)


def _apply_rope(x, angles):
    # x: (B, L, H, Dh); angles: (L, Dh)
    f = angles[None, :, None, :]
    x1, x2 = x.chunk(2, dim=-1)
    return x * f.cos() + torch.cat((-x2, x1), dim=-1) * f.sin()


def _attention(q, k, v):
    # (B, L, H, Dh) -> SDPA -> (B, L, H, Dh)
    out = F.scaled_dot_product_attention(
        q.permute(0, 2, 1, 3), k.permute(0, 2, 1, 3), v.permute(0, 2, 1, 3)
    )
    return out.permute(0, 2, 1, 3)


def oracle_forward(
    sd: dict,
    cfg: DiTConfig,
    x_ncthw: torch.Tensor,
    sigma: torch.Tensor,
    latent_condition_ncthw: torch.Tensor,
    context_index: torch.Tensor | None,
) -> torch.Tensor:
    """Full DiT forward, reference semantics, fp32, returns (B,C,T,H,W)."""
    b, c, t, h, w = x_ncthw.shape
    d, nh = cfg.model_channels, cfg.num_heads
    dh = d // nh
    ps, pt = cfg.patch_spatial, cfg.patch_temporal

    # Timestep embedding (ref: CleanGeneralDIT.py:316-372).
    half = d // 2
    exponent = torch.exp(
        -math.log(10000.0) * torch.arange(half).float() / half
    )
    ang = sigma.float()[:, None] * exponent[None, :]
    sinusoid = torch.cat([ang.cos(), ang.sin()], dim=-1)
    hdn = F.silu(sinusoid @ sd["net.t_embedder.1.linear_1.weight"].T)
    lora = hdn @ sd["net.t_embedder.1.linear_2.weight"].T
    emb = _rms(sinusoid, sd["net.affline_norm.weight"])

    # Context (ref: CleanGeneralDIT.py:731-742).
    if cfg.use_context_embedding:
        table = sd["net.context_embedding.weight"]
        context = table[context_index.reshape(b).long()][:, None, :]
    else:
        context = torch.zeros(b, 1, cfg.crossattn_emb_channels)

    # Concat + patchify (ref: CleanGeneralDIT.py:669-678,406-417).
    ones = torch.ones(b, 1, t, h, w)
    xc = torch.cat([x_ncthw, latent_condition_ncthw, ones], dim=1)
    tp_, hp, wp = t // pt, h // ps, w // ps
    patches = (
        xc.reshape(b, -1, tp_, pt, hp, ps, wp, ps)
        .permute(0, 2, 4, 6, 1, 3, 5, 7)
        .reshape(b, tp_, hp, wp, -1)
    )
    tokens = patches @ sd["net.x_embedder.proj.1.weight"].T
    if cfg.patch_embed_bias:
        tokens = tokens + sd["net.x_embedder.proj.1.bias"]
    tokens = tokens.reshape(b, tp_ * hp * wp, d)

    angles = _rope_table(tp_, hp, wp, dh, cfg.rope_t_extrapolation_ratio)

    for i in range(cfg.num_blocks):
        for j, kind in enumerate(("fa", "ca", "mlp")):
            base = f"net.blocks.block{i}.blocks.{j}."
            mod = (
                F.silu(emb)
                @ sd[base + "adaLN_modulation.1.weight"].T
                @ sd[base + "adaLN_modulation.2.weight"].T
                + lora
            )
            shift, scale, gate = mod.chunk(3, dim=-1)
            xm = F.layer_norm(tokens, (d,), eps=1e-6)
            xm = xm * (1 + scale[:, None, :]) + shift[:, None, :]
            if kind == "mlp":
                o = F.gelu(xm @ sd[base + "block.layer1.weight"].T)
                o = o @ sd[base + "block.layer2.weight"].T
            else:
                src = xm if kind == "fa" else context
                l_kv = src.shape[1]
                q = (xm @ sd[base + "block.attn.to_q.0.weight"].T).reshape(
                    b, -1, nh, dh
                )
                k = (src @ sd[base + "block.attn.to_k.0.weight"].T).reshape(
                    b, l_kv, nh, dh
                )
                v = (src @ sd[base + "block.attn.to_v.0.weight"].T).reshape(
                    b, l_kv, nh, dh
                )
                q = _rms(q, sd[base + "block.attn.to_q.1.weight"])
                k = _rms(k, sd[base + "block.attn.to_k.1.weight"])
                if kind == "fa":
                    q = _apply_rope(q, angles)
                    k = _apply_rope(k, angles)
                o = _attention(q, k, v).reshape(b, -1, d)
                o = o @ sd[base + "block.attn.to_out.0.weight"].T
            tokens = tokens + gate[:, None, :] * o

    # Final layer (ref: CleanGeneralDIT.py:548-590).
    mod = (
        F.silu(emb)
        @ sd["net.final_layer.adaLN_modulation.1.weight"].T
        @ sd["net.final_layer.adaLN_modulation.2.weight"].T
        + lora[:, : 2 * d]
    )
    shift, scale = mod.chunk(2, dim=-1)
    xm = F.layer_norm(tokens, (d,), eps=1e-6)
    xm = xm * (1 + scale[:, None, :]) + shift[:, None, :]
    out = xm @ sd["net.final_layer.linear.weight"].T  # (B, L, ps*ps*pt*C)

    # Unpatchify (ref: CleanGeneralDIT.py:709-717): channel order (ph,pw,pt,C).
    co = cfg.out_channels
    out = out.reshape(b, tp_, hp, wp, ps, ps, pt, co)
    out = out.permute(0, 7, 1, 6, 2, 4, 3, 5)  # b, C, tp, pt, hp, ph, wp, pw
    return out.reshape(b, co, tp_ * pt, hp * ps, wp * ps)
