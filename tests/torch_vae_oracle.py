"""Torch oracle of diffusers' AutoencoderKLCosmos (Cosmos-1.0-Tokenizer-CV8x8x8).

The reference consumes the VAE through diffusers
(/root/reference/CleanVAE.py:18, architecture in VAE_config.json); diffusers
is not installed in this environment, so this module restates the
AutoencoderKLCosmos forward pass in plain torch — the same recipe as
tests/torch_oracle.py for the DiT.  It is the contract for BOTH the JAX VAE
numerics and the state-dict converter: parameter names follow diffusers'
module tree so `state_dict()` of this oracle exercises every key the real
checkpoint will have.

Architecture facts restated here (NVIDIA cosmos_tokenizer layers3d.py is the
origin of all of them; diffusers ports them 1:1):

* every 3x3x3-ish conv is FACTORIZED: a spatial (1,3,3) causal conv followed
  by a temporal (3,1,1) causal conv (`CosmosConvProjection3d` with children
  `conv_s` / `conv_t`);
* causal convs front-pad time with `dilation*(kt-1) + (1-stride)` copies of
  the first frame; spatial padding is zero-constant;
* downsampling is HYBRID: stride-2 conv + avg-pool summed, per axis group
  (spatial then temporal), followed by a 1x1x1 conv (`conv1`/`conv2`/`conv3`);
* upsampling is repeat-interleave (time drops the leading duplicate:
  T -> 2T-1) + conv with a RESIDUAL add per axis group, then a 1x1x1 conv;
* norms are GroupNorm(num_groups=1) with PER-FRAME statistics (the NVIDIA
  `CausalNormalize`); attention norms included;
* mid block: resnet, spatial attention, causal temporal attention, resnet;
  single-head attention at width C with q/k/v/out biases;
* Haar patching (patch_size 4 = 2 levels): the first frame is
  repeat-interleaved patch_size times, then exact stride-2 DWTs with filters
  [1/sqrt2, 1/sqrt2] rescaled by 1/sqrt8 per level (DC gain 1); unpatching
  inverts and drops the first patch_size-1 frames;
* encode is deterministic (IdentityDistribution.sample returns the encoder
  output verbatim).

Known residual uncertainties (flagged in NOTES.md; the converter is strict so
any real-checkpoint drift fails loudly rather than mis-mapping):
  - the per-level DWT rescale factor (1/sqrt8 here) and the exact nesting of
    the GroupNorm inside CosmosCausalGroupNorm (`.norm.` here).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn

_SQRT8 = math.sqrt(8.0)
_W = 1.0 / math.sqrt(2.0)  # Haar wavelet tap


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

class CosmosCausalConv3d(nn.Conv3d):
    def __init__(self, in_channels, out_channels, kernel_size=(3, 3, 3),
                 dilation=(1, 1, 1), stride=(1, 1, 1), padding=1):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * 3
        if isinstance(stride, int):
            stride = (stride,) * 3
        if isinstance(dilation, int):
            dilation = (dilation,) * 3
        super().__init__(in_channels, out_channels, kernel_size,
                         stride=stride, dilation=dilation)
        self.temporal_pad = dilation[0] * (kernel_size[0] - 1) + (1 - stride[0])
        self.spatial_pad = (padding, padding, padding, padding)

    def forward(self, x):
        if self.temporal_pad > 0:
            front = x[:, :, :1].repeat(1, 1, self.temporal_pad, 1, 1)
            x = torch.cat([front, x], dim=2)
        x = F.pad(x, (*self.spatial_pad, 0, 0), mode="constant", value=0.0)
        return super()._conv_forward(x, self.weight, self.bias)


class CosmosConvProjection3d(nn.Module):
    """Factorized conv: spatial (1,3,3) then temporal (3,1,1)."""

    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.conv_s = CosmosCausalConv3d(in_channels, out_channels,
                                         kernel_size=(1, 3, 3), padding=1)
        self.conv_t = CosmosCausalConv3d(out_channels, out_channels,
                                         kernel_size=(3, 1, 1), padding=0)

    def forward(self, x):
        return self.conv_t(self.conv_s(x))


class CosmosCausalGroupNorm(nn.Module):
    """GroupNorm(1) with per-frame statistics (NVIDIA CausalNormalize)."""

    def __init__(self, in_channels, num_groups=1):
        super().__init__()
        self.norm = nn.GroupNorm(num_groups, in_channels, eps=1e-6, affine=True)
        self.num_groups = num_groups

    def forward(self, x):
        if self.num_groups == 1:
            b = x.size(0)
            x = x.permute(0, 2, 1, 3, 4).flatten(0, 1)  # (B*T, C, H, W)
            x = self.norm(x)
            x = x.unflatten(0, (b, -1)).permute(0, 2, 1, 3, 4)
            return x
        return self.norm(x)


# ---------------------------------------------------------------------------
# Haar patcher / unpatcher
# ---------------------------------------------------------------------------

def _dwt3d(x: torch.Tensor) -> torch.Tensor:
    """One exact stride-2 Haar level over (t, h, w); input dims even.

    Output channel s*C + c carries subband s of channel c with s's bits
    (t, h, w), L=0 / H=1 — binary order LLL, LLH, LHL, LHH, HLL, ...
    Rescaled by 1/sqrt8 (DC gain 1).
    """
    g = x.shape[1]
    hl = torch.full((g, 1, 2), _W, dtype=x.dtype)
    hh = torch.tensor([_W, -_W], dtype=x.dtype).expand(g, 1, 2).contiguous()

    def conv(inp, filt, axis):
        shape = [g, 1, 1, 1, 1]
        shape[2 + axis] = 2
        stride = [1, 1, 1]
        stride[axis] = 2
        return F.conv3d(inp, filt.reshape(shape), stride=stride, groups=g)

    xl, xh = conv(x, hl, 0), conv(x, hh, 0)
    xll, xlh = conv(xl, hl, 1), conv(xl, hh, 1)
    xhl, xhh = conv(xh, hl, 1), conv(xh, hh, 1)
    out = torch.cat(
        [conv(xll, hl, 2), conv(xll, hh, 2), conv(xlh, hl, 2),
         conv(xlh, hh, 2), conv(xhl, hl, 2), conv(xhl, hh, 2),
         conv(xhh, hl, 2), conv(xhh, hh, 2)], dim=1,
    )
    return out / _SQRT8


def _idwt3d(x: torch.Tensor) -> torch.Tensor:
    g = x.shape[1] // 8
    hl = torch.full((g, 1, 2), _W, dtype=x.dtype)
    hh = torch.tensor([_W, -_W], dtype=x.dtype).expand(g, 1, 2).contiguous()

    def deconv(inp, filt, axis):
        shape = [g, 1, 1, 1, 1]
        shape[2 + axis] = 2
        stride = [1, 1, 1]
        stride[axis] = 2
        return F.conv_transpose3d(inp, filt.reshape(shape), stride=stride,
                                  groups=g)

    subs = torch.chunk(x, 8, dim=1)
    xll = deconv(subs[0], hl, 2) + deconv(subs[1], hh, 2)
    xlh = deconv(subs[2], hl, 2) + deconv(subs[3], hh, 2)
    xhl = deconv(subs[4], hl, 2) + deconv(subs[5], hh, 2)
    xhh = deconv(subs[6], hl, 2) + deconv(subs[7], hh, 2)
    xl = deconv(xll, hl, 1) + deconv(xlh, hh, 1)
    xh = deconv(xhl, hl, 1) + deconv(xhh, hh, 1)
    return (deconv(xl, hl, 0) + deconv(xh, hh, 0)) * _SQRT8


class CosmosPatchEmbed3d(nn.Module):
    def __init__(self, patch_size=4):
        super().__init__()
        self.patch_size = patch_size

    def forward(self, x):
        # Causality: repeat the first frame patch_size times, then exact
        # halvings.  T=8k+1 -> (T-1+p) even at every level.
        xi, xv = torch.split(x, [1, x.shape[2] - 1], dim=2)
        x = torch.cat([xi.repeat_interleave(self.patch_size, dim=2), xv], dim=2)
        for _ in range(int(math.log2(self.patch_size))):
            x = _dwt3d(x)
        return x


class CosmosUnpatcher3d(nn.Module):
    def __init__(self, patch_size=4):
        super().__init__()
        self.patch_size = patch_size

    def forward(self, x):
        for _ in range(int(math.log2(self.patch_size))):
            x = _idwt3d(x)
        return x[:, :, self.patch_size - 1:]


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

class CosmosResnetBlock3d(nn.Module):
    def __init__(self, in_channels, out_channels, num_groups=1):
        super().__init__()
        self.norm1 = CosmosCausalGroupNorm(in_channels, num_groups)
        self.conv1 = CosmosConvProjection3d(in_channels, out_channels)
        self.norm2 = CosmosCausalGroupNorm(out_channels, num_groups)
        self.conv2 = CosmosConvProjection3d(out_channels, out_channels)
        if in_channels != out_channels:
            self.conv_shortcut = CosmosCausalConv3d(
                in_channels, out_channels, kernel_size=1, padding=0)
        else:
            self.conv_shortcut = nn.Identity()

    def forward(self, x):
        residual = self.conv_shortcut(x)
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return h + residual


class CosmosDownsample3d(nn.Module):
    """Hybrid stride-2: conv + avg-pool summed, then 1x1x1 conv."""

    def __init__(self, in_channels, spatial_downsample=True,
                 temporal_downsample=True):
        super().__init__()
        self.spatial_downsample = spatial_downsample
        self.temporal_downsample = temporal_downsample
        if spatial_downsample:
            self.conv1 = CosmosCausalConv3d(
                in_channels, in_channels, kernel_size=(1, 3, 3),
                stride=(1, 2, 2), padding=0)
        if temporal_downsample:
            self.conv2 = CosmosCausalConv3d(
                in_channels, in_channels, kernel_size=(3, 1, 1),
                stride=(2, 1, 1), padding=0)
        if spatial_downsample or temporal_downsample:
            self.conv3 = CosmosCausalConv3d(
                in_channels, in_channels, kernel_size=1, padding=0)

    def forward(self, x):
        if not self.spatial_downsample and not self.temporal_downsample:
            return x
        if self.spatial_downsample:
            x = F.pad(x, (0, 1, 0, 1, 0, 0), mode="constant", value=0.0)
            x = self.conv1(x) + F.avg_pool3d(x, kernel_size=(1, 2, 2),
                                             stride=(1, 2, 2))
        if self.temporal_downsample:
            x = torch.cat([x[:, :, :1], x], dim=2)
            x = self.conv2(x) + F.avg_pool3d(x, kernel_size=(2, 1, 1),
                                             stride=(2, 1, 1))
        return self.conv3(x)


class CosmosUpsample3d(nn.Module):
    """Hybrid: repeat-interleave + conv with residual, then 1x1x1 conv."""

    def __init__(self, in_channels, spatial_upsample=True,
                 temporal_upsample=True):
        super().__init__()
        self.spatial_upsample = spatial_upsample
        self.temporal_upsample = temporal_upsample
        if temporal_upsample:
            self.conv1 = CosmosCausalConv3d(
                in_channels, in_channels, kernel_size=(3, 1, 1), padding=0)
        if spatial_upsample:
            self.conv2 = CosmosCausalConv3d(
                in_channels, in_channels, kernel_size=(1, 3, 3), padding=1)
        if spatial_upsample or temporal_upsample:
            self.conv3 = CosmosCausalConv3d(
                in_channels, in_channels, kernel_size=1, padding=0)

    def forward(self, x):
        if self.temporal_upsample:
            x = x.repeat_interleave(2, dim=2)[:, :, 1:]  # T -> 2T-1
            x = self.conv1(x) + x
        if self.spatial_upsample:
            x = x.repeat_interleave(2, dim=3).repeat_interleave(2, dim=4)
            x = self.conv2(x) + x
        return self.conv3(x)


class _Attn(nn.Module):
    """Single-head attention at width C with group norm and biases, matching
    diffusers Attention(heads=1, dim_head=C, norm_num_groups=1, eps=1e-6)."""

    def __init__(self, channels):
        super().__init__()
        self.group_norm = nn.GroupNorm(1, channels, eps=1e-6, affine=True)
        self.to_q = nn.Linear(channels, channels, bias=True)
        self.to_k = nn.Linear(channels, channels, bias=True)
        self.to_v = nn.Linear(channels, channels, bias=True)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels, bias=True)])


class CosmosSpatialAttention(_Attn):
    def forward(self, x):
        b, c, t, h, w = x.shape
        residual = x
        y = x.permute(0, 2, 3, 4, 1).reshape(b * t, h * w, c)
        # Per-frame norm (GroupNorm(1, C) over (C, H*W) of each frame).
        y = self.group_norm(y.transpose(1, 2)).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        o = F.scaled_dot_product_attention(
            q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)).squeeze(1)
        o = self.to_out[0](o)
        return o.reshape(b, t, h, w, c).permute(0, 4, 1, 2, 3) + residual


class CosmosTemporalAttention(_Attn):
    def forward(self, x):
        b, c, t, h, w = x.shape
        residual = x
        # Per-frame norm BEFORE the temporal rearrange (NVIDIA
        # CausalNormalize precedes the attention in CausalTemporalAttnBlock).
        y = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h * w)
        y = self.group_norm(y)
        y = y.reshape(b, t, c, h, w).permute(0, 3, 4, 1, 2)  # (B,H,W,T,C)
        y = y.reshape(b * h * w, t, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        mask = torch.tril(torch.ones(t, t, dtype=torch.bool))
        o = F.scaled_dot_product_attention(
            q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1),
            attn_mask=mask).squeeze(1)
        o = self.to_out[0](o)
        o = o.reshape(b, h, w, t, c).permute(0, 4, 3, 1, 2)
        return o + residual


class CosmosDownBlock3d(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers,
                 spatial_downsample, temporal_downsample):
        super().__init__()
        resnets = []
        cin = in_channels
        for _ in range(num_layers):
            resnets.append(CosmosResnetBlock3d(cin, out_channels))
            cin = out_channels
        self.resnets = nn.ModuleList(resnets)
        self.downsamplers = None
        if spatial_downsample or temporal_downsample:
            self.downsamplers = nn.ModuleList([
                CosmosDownsample3d(out_channels, spatial_downsample,
                                   temporal_downsample)
            ])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            for d in self.downsamplers:
                x = d(x)
        return x


class CosmosUpBlock3d(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers,
                 spatial_upsample, temporal_upsample):
        super().__init__()
        resnets = []
        cin = in_channels
        for _ in range(num_layers):
            resnets.append(CosmosResnetBlock3d(cin, out_channels))
            cin = out_channels
        self.resnets = nn.ModuleList(resnets)
        self.upsamplers = None
        if spatial_upsample or temporal_upsample:
            self.upsamplers = nn.ModuleList([
                CosmosUpsample3d(out_channels, spatial_upsample,
                                 temporal_upsample)
            ])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            for u in self.upsamplers:
                x = u(x)
        return x


class CosmosMidBlock3d(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.resnets = nn.ModuleList([
            CosmosResnetBlock3d(channels, channels),
            CosmosResnetBlock3d(channels, channels),
        ])
        self.attentions = nn.ModuleList([CosmosSpatialAttention(channels)])
        self.temp_attentions = nn.ModuleList(
            [CosmosTemporalAttention(channels)])

    def forward(self, x):
        x = self.resnets[0](x)
        for attn, t_attn, res in zip(self.attentions, self.temp_attentions,
                                     self.resnets[1:]):
            x = attn(x)
            x = t_attn(x)
            x = res(x)
        return x


# ---------------------------------------------------------------------------
# Encoder / Decoder / top level
# ---------------------------------------------------------------------------

class CosmosEncoder3d(nn.Module):
    def __init__(self, in_channels, out_channels, block_out_channels,
                 num_resnet_blocks, patch_size, spatial_compression_ratio,
                 temporal_compression_ratio):
        super().__init__()
        inner_dim = in_channels * patch_size**3
        num_spatial = int(math.log2(spatial_compression_ratio)) - int(
            math.log2(patch_size))
        num_temporal = int(math.log2(temporal_compression_ratio)) - int(
            math.log2(patch_size))

        self.patch_embed = CosmosPatchEmbed3d(patch_size)
        self.conv_in = CosmosConvProjection3d(inner_dim, block_out_channels[0])

        blocks = []
        for i in range(len(block_out_channels) - 1):
            spatial_down = temporal_down = False
            if i < len(block_out_channels) - 2:
                spatial_down = i < num_spatial
                temporal_down = i < num_temporal
            blocks.append(CosmosDownBlock3d(
                block_out_channels[i], block_out_channels[i + 1],
                num_resnet_blocks, spatial_down, temporal_down))
        self.down_blocks = nn.ModuleList(blocks)

        self.mid_block = CosmosMidBlock3d(block_out_channels[-1])
        self.norm_out = CosmosCausalGroupNorm(block_out_channels[-1])
        self.conv_out = CosmosConvProjection3d(block_out_channels[-1],
                                               out_channels)

    def forward(self, x):
        x = self.patch_embed(x)
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        x = F.silu(self.norm_out(x))
        return self.conv_out(x)


class CosmosDecoder3d(nn.Module):
    def __init__(self, in_channels, out_channels, block_out_channels,
                 num_resnet_blocks, patch_size, spatial_compression_ratio,
                 temporal_compression_ratio):
        super().__init__()
        inner_dim = out_channels * patch_size**3
        num_spatial = int(math.log2(spatial_compression_ratio)) - int(
            math.log2(patch_size))
        num_temporal = int(math.log2(temporal_compression_ratio)) - int(
            math.log2(patch_size))
        rev = list(reversed(block_out_channels))  # e.g. (512, 512, 512, 256)

        self.conv_in = CosmosConvProjection3d(in_channels, rev[0])
        self.mid_block = CosmosMidBlock3d(rev[0])

        blocks = []
        for i in range(len(rev) - 1):
            spatial_up = temporal_up = False
            if i < len(rev) - 2:
                # Mirror of the encoder: the up happens at the LAST possible
                # slot (encoder downsampled at the first).
                spatial_up = len(rev) - 2 - i <= num_spatial
                temporal_up = len(rev) - 2 - i <= num_temporal
            blocks.append(CosmosUpBlock3d(
                rev[i], rev[i + 1], num_resnet_blocks + 1, spatial_up,
                temporal_up))
        self.up_blocks = nn.ModuleList(blocks)

        self.norm_out = CosmosCausalGroupNorm(rev[-1])
        self.conv_out = CosmosConvProjection3d(rev[-1], inner_dim)
        self.unpatch_embed = CosmosUnpatcher3d(patch_size)

    def forward(self, x):
        x = self.conv_in(x)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        x = F.silu(self.norm_out(x))
        x = self.conv_out(x)
        return self.unpatch_embed(x)


class AutoencoderKLCosmosOracle(nn.Module):
    """encode() is deterministic: diffusers wraps the encoder output in an
    IdentityDistribution whose .sample() returns it verbatim
    (ref consumption: CleanVAE.py:44-60)."""

    def __init__(self, in_channels=3, out_channels=3, latent_channels=16,
                 encoder_block_out_channels=(128, 256, 512, 512),
                 decode_block_out_channels=(256, 512, 512, 512),
                 num_layers=2, patch_size=4, spatial_compression_ratio=8,
                 temporal_compression_ratio=8):
        super().__init__()
        self.encoder = CosmosEncoder3d(
            in_channels, latent_channels, encoder_block_out_channels,
            num_layers, patch_size, spatial_compression_ratio,
            temporal_compression_ratio)
        self.decoder = CosmosDecoder3d(
            latent_channels, out_channels, decode_block_out_channels,
            num_layers, patch_size, spatial_compression_ratio,
            temporal_compression_ratio)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)


def oracle_from_vae_config(cfg) -> AutoencoderKLCosmosOracle:
    """Build the torch oracle from our VAEConfig (tests use tiny configs)."""
    return AutoencoderKLCosmosOracle(
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        latent_channels=cfg.latent_channels,
        encoder_block_out_channels=tuple(cfg.encoder_block_out_channels),
        decode_block_out_channels=tuple(cfg.decode_block_out_channels),
        num_layers=cfg.num_layers,
        patch_size=cfg.patch_size,
        spatial_compression_ratio=cfg.spatial_compression_ratio,
        temporal_compression_ratio=cfg.temporal_compression_ratio,
    ).float().eval()
