"""Cosmos-1.0-Tokenizer-CV8x8x8 — causal 3D video VAE in JAX.

The reference consumes this model through diffusers' AutoencoderKLCosmos
(/root/reference/CleanVAE.py:18; architecture in VAE_config.json).  Here it
is rebuilt as a TPU-native channels-last (B, T, H, W, C) network whose math
matches the diffusers/NVIDIA implementation (validated against the torch
restatement in tests/torch_vae_oracle.py):

* 3D Haar wavelet patching, patch_size 4 = two levels
  (VAE_config.json:539-540).  Causal handling: the FIRST frame is
  repeat-interleaved patch_size times, then each level is an exact stride-2
  DWT; filters are rescaled so the DC gain is 1 (analysis kernel entries
  +-1/8 per level).  Unpatching inverts and drops the leading patch_size-1
  reconstructed frames;
* every main conv is FACTORIZED: spatial (1,3,3) then temporal (3,1,1)
  causal conv (diffusers CosmosConvProjection3d: conv_s / conv_t);
* causal temporal convolutions: time axis front-padded with the replicated
  first frame so frame t never sees frames > t;
* HYBRID stride-2 downsampling: strided conv + average pool summed, spatial
  group then temporal group, followed by a 1x1x1 conv;
* HYBRID upsampling: repeat-interleave (time drops the leading duplicate:
  T -> 2T-1) then conv with a RESIDUAL add per group, then a 1x1x1 conv;
* encoder channels 128/256/512/512, decoder 256/512/512/512 (walked
  reversed), 2 res layers per level, +1 in the decoder
  (VAE_config.json:7-18,536); the single down/upsample beyond the patcher
  gives the 8x8x8 total compression (VAE_config.json:542-544);
* mid block: resnet - spatial attention - causal temporal attention - resnet
  (single head at width C, biases everywhere, per-frame GroupNorm(1));
* per-(channel, latent-frame) latent mean/std normalization vectors — 256
  entries = 16 channels x 16 frames (VAE_config.json:21-535);
* encode is DETERMINISTIC: diffusers wraps the encoder output in an identity
  distribution whose .sample() returns the tensor itself, so the reference's
  latent_dist.sample() (CleanVAE.py:51) draws no noise.

Frame math matches CleanVAE.py:34-42: T_latent = (T-1)//8 + 1, single frames
stay single frames.  Supported pixel frame counts: T == 1 or
(T-1) % patch_size == 0 (the reference only ever feeds T = 8k+1 or 1).

The conv stack runs under XLA's native conv lowering (which maps 3D convs
onto the MXU).  The Haar ANALYSIS is a separable stride-2-slice butterfly
(see _haar_level): both the conv formulation (8.06 GiB peak — XLA pads the
C_in=3 operand) and an 8-D reshape butterfly (20 GB — (..., 2, C) minor
dims tile-pad) are memory-catastrophic at 57x704x1280; stride-2 slices keep
every intermediate's minor dimension large.  The SYNTHESIS stays a
conv_transpose: its operand is the 8C-wide latent-side tensor (compact) and
its channels-first output option avoids the padded pixel buffer.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VAEConfig

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# Haar wavelet patcher (causal, DC-gain-1 normalization)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _haar_kernel_np(c: int):
    """Dense (2, 2, 2, C, 8C) Haar analysis kernel, entries +-1/8.

    Output channel s*C + c_in carries subband s of input channel c_in;
    subbands ordered (LLL, LLH, LHL, LHH, HLL, HLH, HHL, HHH) with letters in
    (t, h, w) axis order, L=low/H=high — the diffusers/NVIDIA chunk order.
    The 1/8 scale is the diffusers rescale convention (per-axis 1/sqrt2
    filters divided by sqrt8 per level => DC gain exactly 1)."""
    w = np.zeros((2, 2, 2, c, 8 * c), np.float32)
    scale = 1.0 / 8.0
    for s in range(8):
        signs_t = (1, 1) if not (s & 4) else (1, -1)
        signs_h = (1, 1) if not (s & 2) else (1, -1)
        signs_w = (1, 1) if not (s & 1) else (1, -1)
        for dt in range(2):
            for dh in range(2):
                for dw in range(2):
                    val = signs_t[dt] * signs_h[dh] * signs_w[dw] * scale
                    for ci in range(c):
                        w[dt, dh, dw, ci, s * c + ci] = val
    return w


def _haar_level(x: jax.Array, in_layout: str = "NDHWC",
                out_layout: str = "NDHWC", scale: float = 0.125) -> jax.Array:
    """One exact stride-2 Haar level; all of (T, H, W) must be even.

    (B, T, H, W, C) -> (B, T/2, H/2, W/2, 8C) (layouts per in/out_layout).

    Computed as a separable sum/diff butterfly over stride-2 slices, NOT a
    convolution: XLA:TPU canonicalizes a C_in=3 conv at 57f x 704x1280 into
    a lane-padded form whose buffer assignment peaks at 8.06 GiB (measured
    via compiled memory_analysis; either layout) — on a 16 GB chip that
    cannot coexist with the 7.3 GiB int8 DiT weights.  Every slice here
    keeps a large minor dimension (W/2 >= 320 at flagship), so the whole
    level fits in ~1.5 GiB of fused elementwise temporaries.

    Subband order matches _haar_kernel_np: s = (t_high<<2)|(h_high<<1)|
    w_high, output channel s*C + c_in, overall scale 1/8 (DC gain 1).
    Combines run fp32 (the conv accumulated fp32), cast back to x.dtype."""
    if in_layout == "NCDHW":
        ax_t, ax_h, ax_w, ax_c = 2, 3, 4, 1
    else:
        ax_t, ax_h, ax_w, ax_c = 1, 2, 3, 4

    def halves(u, axis):
        i0 = tuple(
            slice(0, None, 2) if a == axis else slice(None)
            for a in range(u.ndim)
        )
        i1 = tuple(
            slice(1, None, 2) if a == axis else slice(None)
            for a in range(u.ndim)
        )
        u0, u1 = u[i0], u[i1]
        return u0 + u1, u0 - u1  # (low, high)

    xw = x.astype(jnp.float32)
    lw, hw = halves(xw, ax_w)
    subs_hw = []
    for uw in (lw, hw):
        lh, hh = halves(uw, ax_h)
        subs_hw.append((lh, hh))
    # subbands[s]: bits (t, h, w)
    subbands = [None] * 8
    for w_bit in range(2):
        for h_bit in range(2):
            u = subs_hw[w_bit][h_bit]
            lt, ht = halves(u, ax_t)
            subbands[(0 << 2) | (h_bit << 1) | w_bit] = lt
            subbands[(1 << 2) | (h_bit << 1) | w_bit] = ht
    out = jnp.concatenate(subbands, axis=ax_c) * scale
    out = out.astype(x.dtype)
    if in_layout == "NCDHW" and out_layout == "NDHWC":
        return jnp.transpose(out, (0, 2, 3, 4, 1))
    if in_layout == "NDHWC" and out_layout == "NCDHW":
        return jnp.transpose(out, (0, 4, 1, 2, 3))
    return out


def _interleave2(a: jax.Array, b: jax.Array, axis: int) -> jax.Array:
    """out[..., 2i, ...] = a[..., i, ...]; out[..., 2i+1, ...] = b[..., i, ...]
    along `axis`, via interior padding + add — no scatter, no (..., n, 2)
    small-minor reshape (which would tile-pad 2 -> 128 lanes when the pair
    axis lands minor)."""
    zero = jnp.zeros((), a.dtype)
    cfg_a = [(0, 0, 0)] * a.ndim
    cfg_a[axis] = (0, 1, 1)  # even slots, one trailing zero
    cfg_b = [(0, 0, 0)] * b.ndim
    cfg_b[axis] = (1, 0, 1)  # odd slots, one leading zero
    return jax.lax.pad(a, zero, cfg_a) + jax.lax.pad(b, zero, cfg_b)


def _haar_level_inverse(x: jax.Array, out_layout: str = "NDHWC",
                        in_layout: str = "NDHWC",
                        scale: float = 1.0) -> jax.Array:
    """Inverse of _haar_level: (B, T2, H2, W2, 8C) -> (B, 2*T2, 2*H2, 2*W2, C)
    (or NCDHW per in/out_layout).  Analysis A = O/sqrt8 with O orthonormal,
    so synthesis is A^T * 8; with the forward's per-axis (sum, diff) pairs
    that is exactly x0 = a + d, x1 = a - d per axis, no scale.

    Computed as a separable butterfly in channels-first (the mirror of
    _haar_level): the conv_transpose formulation peaks at multi-GiB
    assignments at flagship scale (XLA pads the C_out=3 result and its
    C=24 channels-last operand), and a pixel-space channels-last output
    lane-pads 3 -> 128 (42x, ~6.5 GB at 57f x 704x1280).  Every buffer here
    is channels-first with (H, W) minor; interleaving is interior-pad + add
    (_interleave2).  Combines run fp32, cast back at the end."""
    if in_layout == "NDHWC":
        x = jnp.transpose(x, (0, 4, 1, 2, 3))
    c = x.shape[1] // 8
    ax_t, ax_h, ax_w = 2, 3, 4
    # Subband s at channel block s*C..(s+1)*C, bits s = (t<<2)|(h<<1)|w.
    subs = {
        s: x[:, s * c : (s + 1) * c].astype(jnp.float32) for s in range(8)
    }
    # Undo axes in reverse of the forward (w, h, t): t first, then h, then w.
    for bit, axis in ((4, ax_t), (2, ax_h), (1, ax_w)):
        nxt = {}
        for s in subs:
            if s & bit:
                continue
            a, d = subs[s], subs[s | bit]
            nxt[s] = _interleave2(a + d, a - d, axis)
        subs = nxt
    out = subs[0]
    if scale != 1.0:
        out = out * scale
    out = out.astype(x.dtype)  # (B, C, 2T2, 2H2, 2W2)
    if out_layout == "NDHWC":
        return jnp.transpose(out, (0, 2, 3, 4, 1))
    return out


def _check_frames(t: int, patch: int) -> None:
    if t != 1 and (t - 1) % patch != 0:
        raise ValueError(
            f"Unsupported frame count T={t}: the causal Haar patcher needs "
            f"T == 1 or (T-1) % {patch} == 0 (the reference feeds T = 8k+1)."
        )


def _dwt_scales(rescale: str):
    """Per-level (analysis, synthesis) multipliers for the raw sum/diff
    butterfly.  'gain1': analysis kernel entries +-1/8, DC gain exactly 1,
    synthesis needs no scale (the believed diffusers rescale=True
    convention).  'orthonormal': A = O with O orthonormal (per-axis
    (sum,diff)/sqrt2), i.e. analysis and synthesis both 1/sqrt8 per level."""
    if rescale == "gain1":
        return 0.125, 1.0
    if rescale == "orthonormal":
        s = 1.0 / math.sqrt(8.0)
        return s, s
    raise ValueError(f"unknown dwt_rescale convention {rescale!r}")


def haar_patch(x: jax.Array, levels: int,
               in_layout: str = "NDHWC", rescale: str = "gain1") -> jax.Array:
    """Causal patching: repeat the first frame 2^levels times, then exact
    halvings (diffusers CosmosPatchEmbed3d._haar_wavelet_transform).

    in_layout='NCDHW' accepts channels-first pixels and stays channels-first
    through the intermediate levels (channel counts 3, 24, ... would lane-pad
    heavily channels-last); the final level always emits NDHWC.
    rescale: the per-level DWT scale convention (VAEConfig.dwt_rescale)."""
    p = 2**levels
    ana, _ = _dwt_scales(rescale)
    if in_layout == "NCDHW":
        _check_frames(x.shape[2], p)
        x = jnp.concatenate(
            [jnp.repeat(x[:, :, :1], p, axis=2), x[:, :, 1:]], axis=2
        )
        for lvl in range(levels):
            last = lvl == levels - 1
            x = _haar_level(x, in_layout="NCDHW",
                            out_layout="NDHWC" if last else "NCDHW",
                            scale=ana)
        return x
    _check_frames(x.shape[1], p)
    x = jnp.concatenate([jnp.repeat(x[:, :1], p, axis=1), x[:, 1:]], axis=1)
    for _ in range(levels):
        x = _haar_level(x, scale=ana)
    return x


def haar_unpatch(
    x: jax.Array, levels: int, orig_t: int, out_layout: str = "NDHWC",
    rescale: str = "gain1",
) -> jax.Array:
    """Inverse recursive Haar; drops the leading 2^levels - 1 frames that the
    forward pass synthesized from the repeated first frame.  out_layout
    applies to the FINAL (pixel-space) level only."""
    p = 2**levels
    _, syn = _dwt_scales(rescale)
    _check_frames(orig_t, p)
    for lvl in reversed(range(levels)):
        # Channels-first between levels (shrinking channel counts 24, 192
        # would lane-pad channels-last); only the entry tensor is NDHWC.
        x = _haar_level_inverse(
            x,
            in_layout="NDHWC" if lvl == levels - 1 else "NCDHW",
            out_layout=out_layout if lvl == 0 else "NCDHW",
            scale=syn,
        )
    return x[:, :, p - 1:] if out_layout == "NCDHW" else x[:, p - 1:]


# ---------------------------------------------------------------------------
# Primitive layers (channels-last)
# ---------------------------------------------------------------------------

def causal_conv3d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array],
    stride: Sequence[int] = (1, 1, 1),
    spatial_pad: Optional[str] = "same",
) -> jax.Array:
    """3D conv, causal in time: front-pad (kt-1) replicated first frames.

    x: (B, T, H, W, Cin); w: (kt, kh, kw, Cin, Cout) [DHWIO].
    spatial_pad: 'same' pads kh//2 / kw//2 both sides; 'none' no spatial pad
    (callers pre-pad asymmetrically for stride-2 halving).

    For the stride-2 temporal conv the kt-1 = 2 front frames equal diffusers'
    explicit 1-frame cat plus the conv's own temporal_pad of 1
    (CosmosCausalConv3d: dilation*(kt-1) + (1-stride))."""
    kt, kh, kw = w.shape[:3]
    if kt > 1:
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    if spatial_pad == "same":
        pads = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    else:
        pads = [(0, 0), (0, 0)]
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding=[(0, 0), pads[0], pads[1]],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def _conv_proj(x: jax.Array, p: Params) -> jax.Array:
    """Factorized conv (diffusers CosmosConvProjection3d): spatial (1,3,3)
    then causal temporal (3,1,1)."""
    x = causal_conv3d(x, p["conv_s"]["w"], p["conv_s"]["b"])
    return causal_conv3d(x, p["conv_t"]["w"], p["conv_t"]["b"],
                         spatial_pad="none")


def group_norm_per_frame(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """GroupNorm(num_groups=1) over (H, W, C) independently per frame —
    per-frame statistics keep the network causal in time (diffusers
    CosmosCausalGroupNorm / NVIDIA CausalNormalize)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(orig_dtype)


def _resblock(x: jax.Array, p: Params) -> jax.Array:
    h = group_norm_per_frame(x, p["norm1"]["scale"], p["norm1"]["bias"])
    h = jax.nn.silu(h)
    h = _conv_proj(h, p["conv1"])
    h = group_norm_per_frame(h, p["norm2"]["scale"], p["norm2"]["bias"])
    h = jax.nn.silu(h)
    h = _conv_proj(h, p["conv2"])
    skip = x
    if "shortcut" in p:
        skip = causal_conv3d(x, p["shortcut"]["w"], p["shortcut"]["b"],
                             spatial_pad="none")
    return skip + h


def _attn_spatial(x: jax.Array, p: Params) -> jax.Array:
    """Single-head self-attention over (H*W) per frame.

    Routed through ops.attention's dispatcher: at flagship bottleneck
    resolution (88x160 = 14,080 tokens per frame) a materialized-softmax
    einsum would need ~6 GB of fp32 logits; the Pallas flash kernel streams
    them (single head, head_dim = C = 512)."""
    from ..ops.attention import attention

    b, t, h, w, c = x.shape
    y = group_norm_per_frame(x, p["norm"]["scale"], p["norm"]["bias"])
    y = y.reshape(b * t, h * w, c)
    q = (y @ p["wq"]["w"] + p["wq"]["b"])[:, :, None, :]  # (BT, HW, 1, C)
    k = (y @ p["wk"]["w"] + p["wk"]["b"])[:, :, None, :]
    v = (y @ p["wv"]["w"] + p["wv"]["b"])[:, :, None, :]
    o = attention(q, k, v)[:, :, 0, :].astype(x.dtype)
    o = o @ p["wo"]["w"] + p["wo"]["b"]
    return x + o.reshape(b, t, h, w, c)


def _attn_temporal(x: jax.Array, p: Params) -> jax.Array:
    """Single-head CAUSAL self-attention over T per spatial location.
    Norm is per-frame (applied before the temporal rearrange)."""
    b, t, h, w, c = x.shape
    y = group_norm_per_frame(x, p["norm"]["scale"], p["norm"]["bias"])
    y = y.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
    q = y @ p["wq"]["w"] + p["wq"]["b"]
    k = y @ p["wk"]["w"] + p["wk"]["b"]
    v = y @ p["wv"]["w"] + p["wv"]["b"]
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(c)
    mask = jnp.tril(jnp.ones((t, t), bool))
    logits = jnp.where(mask[None], logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", attn, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o @ p["wo"]["w"] + p["wo"]["b"]
    o = o.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
    return x + o


def _avg_pool(x: jax.Array, window) -> jax.Array:
    """VALID average pool over (T, H, W) of a (B, T, H, W, C) tensor."""
    dims = (1, *window, 1)
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, dims, dims, "VALID"
    )
    return (summed / math.prod(window)).astype(x.dtype)


def _downsample(x: jax.Array, p: Params) -> jax.Array:
    """Hybrid stride-2 (diffusers CosmosDownsample3d): per axis group the
    strided conv and the average pool of the SAME padded input are summed;
    a 1x1x1 conv follows."""
    # Spatial: zero-pad right/bottom, (1,3,3)/s(1,2,2) conv + 2x2 avg pool.
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    conv = causal_conv3d(xp, p["conv1"]["w"], p["conv1"]["b"],
                         stride=(1, 2, 2), spatial_pad="none")
    x = conv + _avg_pool(xp, (1, 2, 2))
    # Temporal: causal (3,1,1)/s(2,1,1) conv (kt-1 = 2 replicated front
    # frames == diffusers' 1-frame cat + the conv's own pad of 1) + pair
    # average pool over the 1-frame front-padded input.
    conv = causal_conv3d(x, p["conv2"]["w"], p["conv2"]["b"],
                         stride=(2, 1, 1), spatial_pad="none")
    xt = jnp.concatenate([x[:, :1], x], axis=1)
    x = conv + _avg_pool(xt, (2, 1, 1))
    return causal_conv3d(x, p["conv3"]["w"], p["conv3"]["b"],
                         spatial_pad="none")


def _upsample(x: jax.Array, p: Params) -> jax.Array:
    """Hybrid upsample (diffusers CosmosUpsample3d): repeat-interleave, conv
    with RESIDUAL add per axis group, then a 1x1x1 conv.  Temporal drops the
    leading duplicate (T -> 2T-1)."""
    x = jnp.repeat(x, 2, axis=1)[:, 1:]
    x = causal_conv3d(x, p["conv1"]["w"], p["conv1"]["b"],
                      spatial_pad="none") + x
    # Spatial nearest-neighbor as ONE resize op (chained jnp.repeat would
    # materialize an extra (T, 2H, W, C) intermediate — 1.7 GB at flagship).
    b, t, h, w, c = x.shape
    x = jax.image.resize(x, (b, t, 2 * h, 2 * w, c), method="nearest")
    x = causal_conv3d(x, p["conv2"]["w"], p["conv2"]["b"]) + x
    return causal_conv3d(x, p["conv3"]["w"], p["conv3"]["b"],
                         spatial_pad="none")


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def _conv_p(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    w = jax.random.normal(key, (kt, kh, kw, cin, cout), jnp.float32)
    w = (w / math.sqrt(fan_in)).astype(dtype)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _conv_proj_p(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "conv_s": _conv_p(k1, 1, 3, 3, cin, cout, dtype),
        "conv_t": _conv_p(k2, 3, 1, 1, cout, cout, dtype),
    }


def _norm_p(c, dtype):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _res_p(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _norm_p(cin, dtype),
        "conv1": _conv_proj_p(k1, cin, cout, dtype),
        "norm2": _norm_p(cout, dtype),
        "conv2": _conv_proj_p(k2, cout, cout, dtype),
    }
    if cin != cout:
        p["shortcut"] = _conv_p(k3, 1, 1, 1, cin, cout, dtype)
    return p


def _attn_p(key, c, dtype):
    ks = jax.random.split(key, 4)
    def dense(k):
        w = jax.random.normal(k, (c, c), jnp.float32) / math.sqrt(c)
        return {"w": w.astype(dtype), "b": jnp.zeros((c,), dtype)}
    return {
        "norm": _norm_p(c, dtype),
        "wq": dense(ks[0]),
        "wk": dense(ks[1]),
        "wv": dense(ks[2]),
        "wo": dense(ks[3]),
    }


def _down_p(key, c, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": _conv_p(k1, 1, 3, 3, c, c, dtype),
        "conv2": _conv_p(k2, 3, 1, 1, c, c, dtype),
        "conv3": _conv_p(k3, 1, 1, 1, c, c, dtype),
    }


def _up_p(key, c, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": _conv_p(k1, 3, 1, 1, c, c, dtype),
        "conv2": _conv_p(k2, 1, 3, 3, c, c, dtype),
        "conv3": _conv_p(k3, 1, 1, 1, c, c, dtype),
    }


def init_vae_params(
    key: jax.Array, cfg: VAEConfig, dtype: jnp.dtype = jnp.bfloat16
) -> Params:
    """Random-init the full VAE pytree, built inside ONE jit — remote
    runtimes (the axon tunnel) pay a compile round-trip per distinct-shape
    eager op, and this tree has ~hundreds of leaves."""
    build = functools.partial(_init_vae_params_build, cfg=cfg, dtype=dtype)
    return jax.jit(build)(key)


def _init_vae_params_build(
    key: jax.Array, cfg: VAEConfig, dtype: jnp.dtype = jnp.bfloat16
) -> Params:
    levels = int(math.log2(cfg.patch_size))
    patched_ch = cfg.in_channels * 8**levels
    enc_ch = cfg.encoder_block_out_channels
    dec_ch = cfg.decode_block_out_channels
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)

    num_downs = int(math.log2(cfg.spatial_compression_ratio)) - levels  # = 1

    # Encoder levels: enc_ch[i] -> enc_ch[i+1]; the hybrid downsample sits at
    # the first num_downs levels (diffusers CosmosEncoder3d walk).
    enc_levels: List[Params] = []
    for i in range(len(enc_ch) - 1):
        blocks = [_res_p(nk(), enc_ch[i], enc_ch[i + 1], dtype)]
        for _ in range(cfg.num_layers - 1):
            blocks.append(_res_p(nk(), enc_ch[i + 1], enc_ch[i + 1], dtype))
        level: Params = {"resblocks": blocks}
        if i < min(num_downs, len(enc_ch) - 2):
            level["downsample"] = _down_p(nk(), enc_ch[i + 1], dtype)
        enc_levels.append(level)

    mid_e = {
        "res1": _res_p(nk(), enc_ch[-1], enc_ch[-1], dtype),
        "attn_s": _attn_p(nk(), enc_ch[-1], dtype),
        "attn_t": _attn_p(nk(), enc_ch[-1], dtype),
        "res2": _res_p(nk(), enc_ch[-1], enc_ch[-1], dtype),
    }

    # Decoder levels, deepest first: dec_ch reversed pairwise.  The single
    # upsample mirrors the encoder: it sits at the LAST possible slot,
    # applied AFTER that level's resblocks (diffusers up_blocks.1.upsamplers).
    dch = list(reversed(dec_ch))  # e.g. (512, 512, 512, 256)
    dec_levels: List[Params] = []
    for i in range(len(dch) - 1):
        blocks = [_res_p(nk(), dch[i], dch[i + 1], dtype)]
        for _ in range(cfg.num_layers):  # decoder uses num_layers+1 blocks
            blocks.append(_res_p(nk(), dch[i + 1], dch[i + 1], dtype))
        level: Params = {"resblocks": blocks}
        if i < len(dch) - 2 and (len(dch) - 2 - i) <= num_downs:
            level["upsample"] = _up_p(nk(), dch[i + 1], dtype)
        dec_levels.append(level)

    mid_d = {
        "res1": _res_p(nk(), dch[0], dch[0], dtype),
        "attn_s": _attn_p(nk(), dch[0], dtype),
        "attn_t": _attn_p(nk(), dch[0], dtype),
        "res2": _res_p(nk(), dch[0], dch[0], dtype),
    }

    return {
        "encoder": {
            "conv_in": _conv_proj_p(nk(), patched_ch, enc_ch[0], dtype),
            "levels": enc_levels,
            "mid": mid_e,
            "norm_out": _norm_p(enc_ch[-1], dtype),
            "conv_out": _conv_proj_p(nk(), enc_ch[-1], cfg.latent_channels,
                                     dtype),
        },
        "decoder": {
            "conv_in": _conv_proj_p(nk(), cfg.latent_channels, dch[0], dtype),
            "mid": mid_d,
            "levels": dec_levels,
            "norm_out": _norm_p(dch[-1], dtype),
            "conv_out": _conv_proj_p(
                nk(), dch[-1], cfg.out_channels * 8**levels, dtype
            ),
        },
        # Per-(channel, latent-frame) statistics (VAE_config.json:21-535),
        # identity by default; loaded from the shipped config in production.
        "latents_mean": jnp.zeros(
            (cfg.latent_channels, cfg.max_latent_frames), jnp.float32
        ),
        "latents_std": jnp.ones(
            (cfg.latent_channels, cfg.max_latent_frames), jnp.float32
        ),
    }


def load_latent_stats(params: Params, latents_mean, latents_std,
                      cfg: VAEConfig) -> Params:
    """Install the 256-entry latents_mean/std vectors from VAE_config.json.

    The flat vectors are (C * F) with channel-major layout reshaped to
    (C, F) — 16 channels x 16 max latent frames."""
    mean = np.asarray(latents_mean, np.float32).reshape(
        cfg.latent_channels, cfg.max_latent_frames
    )
    std = np.asarray(latents_std, np.float32).reshape(
        cfg.latent_channels, cfg.max_latent_frames
    )
    out = dict(params)
    out["latents_mean"] = jnp.asarray(mean)
    out["latents_std"] = jnp.asarray(std)
    return out


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def vae_encode(params: Params, x: jax.Array, cfg: VAEConfig,
               in_layout: str = "NDHWC") -> jax.Array:
    """(B, T, H, W, 3) -> normalized latent (B, T', H/8, W/8, 16).

    in_layout='NCDHW' accepts (B, 3, T, H, W) — the lane-pad-safe device
    layout for full-res pixel video (see haar_patch).
    Deterministic (identity posterior, see module docstring)."""
    levels = int(math.log2(cfg.patch_size))
    enc = params["encoder"]
    h = haar_patch(x, levels, in_layout=in_layout, rescale=cfg.dwt_rescale)
    h = _conv_proj(h, enc["conv_in"])
    for level in enc["levels"]:
        for rb in level["resblocks"]:
            h = _resblock(h, rb)
        if "downsample" in level:
            h = _downsample(h, level["downsample"])
    mid = enc["mid"]
    h = _resblock(h, mid["res1"])
    h = _attn_spatial(h, mid["attn_s"])
    h = _attn_temporal(h, mid["attn_t"])
    h = _resblock(h, mid["res2"])
    h = group_norm_per_frame(h, enc["norm_out"]["scale"], enc["norm_out"]["bias"])
    h = jax.nn.silu(h)
    z = _conv_proj(h, enc["conv_out"])

    if cfg.stats_location != "encode":
        return z  # 'external': caller owns the latent-stats normalization
    # Normalize by per-(channel, frame) stats, broadcast over H, W.
    t_lat = z.shape[1]
    mean = params["latents_mean"][:, :t_lat].T[None, :, None, None, :]
    std = params["latents_std"][:, :t_lat].T[None, :, None, None, :]
    zf = (z.astype(jnp.float32) - mean) / std * cfg.scaling_factor
    return zf.astype(z.dtype)


def vae_decode(params: Params, z: jax.Array, cfg: VAEConfig,
               out_layout: str = "NDHWC") -> jax.Array:
    """Normalized latent (B, T', H', W', 16) -> (B, T, 8H', 8W', 3)
    (or (B, 3, T, 8H', 8W') with out_layout='NCDHW' — the memory-friendly
    layout for large frames, see _haar_level_inverse)."""
    levels = int(math.log2(cfg.patch_size))
    dec = params["decoder"]

    t_lat = z.shape[1]
    if cfg.stats_location == "encode":
        mean = params["latents_mean"][:, :t_lat].T[None, :, None, None, :]
        std = params["latents_std"][:, :t_lat].T[None, :, None, None, :]
        z = (z.astype(jnp.float32) / cfg.scaling_factor * std
             + mean).astype(z.dtype)

    h = _conv_proj(z, dec["conv_in"])
    mid = dec["mid"]
    h = _resblock(h, mid["res1"])
    h = _attn_spatial(h, mid["attn_s"])
    h = _attn_temporal(h, mid["attn_t"])
    h = _resblock(h, mid["res2"])
    for level in dec["levels"]:
        for rb in level["resblocks"]:
            h = _resblock(h, rb)
        if "upsample" in level:
            h = _upsample(h, level["upsample"])
    h = group_norm_per_frame(h, dec["norm_out"]["scale"], dec["norm_out"]["bias"])
    h = jax.nn.silu(h)
    h = _conv_proj(h, dec["conv_out"])

    pixel_t = cfg.pixel_num_frames(t_lat)
    return haar_unpatch(h, levels, pixel_t, out_layout=out_layout,
                        rescale=cfg.dwt_rescale)


def vae_encode_chunked(
    params: Params, x: jax.Array, cfg: VAEConfig, max_batch: int = 8
) -> jax.Array:
    """Micro-batched encode to bound peak memory, the TPU equivalent of the
    reference's max_enc_batch_size chunking (ref: pretrained_vae.py:385-403)."""
    b = x.shape[0]
    if b <= max_batch:
        return vae_encode(params, x, cfg)
    outs = [
        vae_encode(params, x[i : i + max_batch], cfg)
        for i in range(0, b, max_batch)
    ]
    return jnp.concatenate(outs, axis=0)


def vae_decode_chunked(
    params: Params, z: jax.Array, cfg: VAEConfig, max_batch: int = 4
) -> jax.Array:
    """(ref: pretrained_vae.py:405-421, max_dec_batch_size=4)"""
    b = z.shape[0]
    if b <= max_batch:
        return vae_decode(params, z, cfg)
    outs = [
        vae_decode(params, z[i : i + max_batch], cfg)
        for i in range(0, b, max_batch)
    ]
    return jnp.concatenate(outs, axis=0)


def vae_encode_temporal_chunks(
    params: Params,
    x: jax.Array,
    cfg: VAEConfig,
    pixel_chunk_duration: int,
    max_batch: int = 8,
) -> jax.Array:
    """Long-video encode by temporal chunking: reshape
    (B, n*t, H, W, C) -> (B*n, t, H, W, C), micro-batch through the encoder,
    reassemble on the latent time axis.

    TPU equivalent of the legacy tokenizer's chunked path
    (ref: pretrained_vae.py:367-403: transform_encode_state_shape +
    max_enc_batch_size micro-batching).  Each chunk is encoded causally from
    its own first frame, exactly like the reference's chunk semantics.
    """
    b, t, h, w, c = x.shape
    if t % pixel_chunk_duration != 0:
        raise ValueError(
            f"T={t} not divisible by pixel_chunk_duration={pixel_chunk_duration}"
        )
    n = t // pixel_chunk_duration
    xc = x.reshape(b * n, pixel_chunk_duration, h, w, c)
    z = vae_encode_chunked(params, xc, cfg, max_batch=max_batch)
    lt = z.shape[1]
    return z.reshape(b, n * lt, h // cfg.spatial_compression_ratio,
                     w // cfg.spatial_compression_ratio, cfg.latent_channels)


def vae_decode_temporal_chunks(
    params: Params,
    z: jax.Array,
    cfg: VAEConfig,
    latent_chunk_duration: int,
    max_batch: int = 4,
) -> jax.Array:
    """Inverse of vae_encode_temporal_chunks
    (ref: pretrained_vae.py:377-383,405-421)."""
    b, t, h, w, c = z.shape
    if t % latent_chunk_duration != 0:
        raise ValueError(
            f"latent T={t} not divisible by {latent_chunk_duration}"
        )
    n = t // latent_chunk_duration
    zc = z.reshape(b * n, latent_chunk_duration, h, w, c)
    y = vae_decode_chunked(params, zc, cfg, max_batch=max_batch)
    pt = y.shape[1]
    return y.reshape(b, n * pt, *y.shape[2:])
