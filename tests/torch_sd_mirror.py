"""Minimal torch mirror of the Stable Diffusion UNet/VAE architecture.

Test-only oracle: an independent PyTorch implementation of the SD
UNet2DConditionModel / AutoencoderKL *semantics* (as consumed by the
reference via diffusers, reference ``nerf/sd.py:44-65,134-143``), with
state_dict key names matching the diffusers layout so
``guidance/weights.py::convert_unet / convert_vae`` can load its random
weights into the Flax models.  If any transpose / normalization / epsilon /
activation / head-split detail in ``guidance/unet.py`` or ``guidance/vae.py``
drifts from SD semantics, the golden comparison in
``test_unet_torch_golden.py`` fails.

diffusers itself is NOT installed in this environment — this mirror encodes
the published architecture (config.json block structure + standard attention
/ resnet / GEGLU math), not copied code.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import torch
import torch.nn as nn
import torch.nn.functional as F


def get_timestep_embedding(timesteps: torch.Tensor, dim: int,
                           max_period: int = 10000) -> torch.Tensor:
    """SD's Timesteps(..., flip_sin_to_cos=True, downscale_freq_shift=0):
    exp ramp over half dim, then [cos | sin]."""
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = timesteps.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, t):
        return self.linear_2(F.silu(self.linear_1(t)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, temb_ch: Optional[int],
                 groups: int, eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, query_dim: int, heads: int, dim_head: int,
                 context_dim: Optional[int] = None):
        super().__init__()
        inner = heads * dim_head
        ctx = context_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(ctx, inner, bias=False)
        self.to_v = nn.Linear(ctx, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, query_dim))

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        m = context.shape[1]
        q = self.to_q(x).view(b, n, self.heads, self.dim_head)
        k = self.to_k(context).view(b, m, self.heads, self.dim_head)
        v = self.to_v(context).view(b, m, self.heads, self.dim_head)
        attn = torch.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(self.dim_head)
        attn = attn.softmax(dim=-1)
        out = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, -1)
        return self.to_out(out)


class GEGLU(nn.Module):
    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)  # exact erf gelu


class FeedForward(nn.Module):
    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList(
            [GEGLU(dim, inner), nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, dim_head: int, ctx_dim: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, dim_head, context_dim=ctx_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, channels: int, heads: int, ctx_dim: int, groups: int,
                 use_linear_projection: bool = False):
        super().__init__()
        dim_head = channels // heads
        self.use_linear = use_linear_projection
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        if use_linear_projection:  # SD 2.x
            self.proj_in = nn.Linear(channels, channels)
            self.proj_out = nn.Linear(channels, channels)
        else:                      # SD 1.x: 1×1 convs
            self.proj_in = nn.Conv2d(channels, channels, 1)
            self.proj_out = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(channels, heads, dim_head, ctx_dim)])

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        x = self.norm(x)
        if self.use_linear:
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
            x = self.proj_in(x)
        else:
            x = self.proj_in(x)
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, context)
        if self.use_linear:
            x = self.proj_out(x)
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
            x = self.proj_out(x)
        return x + res


class Downsample2D(nn.Module):
    def __init__(self, channels: int, asymmetric_pad: bool = False):
        super().__init__()
        self.asymmetric_pad = asymmetric_pad
        pad = 0 if asymmetric_pad else 1
        self.conv = nn.Conv2d(channels, channels, 3, stride=2, padding=pad)

    def forward(self, x):
        if self.asymmetric_pad:  # SD VAE encoder downsample: pad (0,1,0,1)
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, channels: int):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, layers, groups, heads,
                 ctx_dim, has_attn, has_down, use_linear):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, temb_ch,
                           groups) for j in range(layers)])
        if has_attn:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, heads, ctx_dim, groups,
                                    use_linear) for _ in range(layers)])
        if has_down:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch)])


class _MidBlock(nn.Module):
    def __init__(self, ch, temb_ch, groups, heads, ctx_dim, use_linear):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, temb_ch, groups),
             ResnetBlock2D(ch, ch, temb_ch, groups)])
        self.attentions = nn.ModuleList(
            [Transformer2DModel(ch, heads, ctx_dim, groups, use_linear)])


class _UpBlock(nn.Module):
    def __init__(self, prev_ch, skip_chs, out_ch, temb_ch, layers, groups,
                 heads, ctx_dim, has_attn, has_up, use_linear):
        super().__init__()
        resnets = []
        for j in range(layers):
            in_ch = (prev_ch if j == 0 else out_ch) + skip_chs[j]
            resnets.append(ResnetBlock2D(in_ch, out_ch, temb_ch, groups))
        self.resnets = nn.ModuleList(resnets)
        if has_attn:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, heads, ctx_dim, groups,
                                    use_linear) for _ in range(layers)])
        if has_up:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])


class TorchUNet(nn.Module):
    """Mirror of UNet2DCondition (guidance/unet.py) with diffusers-layout
    state_dict keys.  attention_head_dim follows the same (misnamed)
    convention: int or per-level tuple of HEAD COUNTS."""

    def __init__(self, in_channels: int = 4, out_channels: int = 4,
                 block_out_channels: Sequence[int] = (320, 640, 1280, 1280),
                 layers_per_block: int = 2, cross_attention_dim: int = 768,
                 attention_head_dim: Union[int, Tuple[int, ...]] = 8,
                 norm_num_groups: int = 32,
                 use_linear_projection: bool = False):
        super().__init__()
        ch = list(block_out_channels)
        n = len(ch)
        temb_ch = ch[0] * 4
        self.block_out_channels = ch

        def heads_at(level):
            return (attention_head_dim[level]
                    if isinstance(attention_head_dim, (tuple, list))
                    else attention_head_dim)

        self.conv_in = nn.Conv2d(in_channels, ch[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch[0], temb_ch)

        self.down_blocks = nn.ModuleList()
        skip_chs_per_level = []
        for i in range(n):
            in_ch = ch[max(i - 1, 0)]
            has_attn = i < n - 1
            has_down = i < n - 1
            self.down_blocks.append(_DownBlock(
                in_ch, ch[i], temb_ch, layers_per_block, norm_num_groups,
                heads_at(i), cross_attention_dim, has_attn, has_down,
                use_linear_projection))
            level_skips = [ch[i]] * layers_per_block
            if has_down:
                level_skips.append(ch[i])
            skip_chs_per_level.append(level_skips)

        self.mid_block = _MidBlock(ch[-1], temb_ch, norm_num_groups,
                                   heads_at(n - 1), cross_attention_dim,
                                   use_linear_projection)

        # skip stack: conv_in output + every down layer output
        skips = [ch[0]] + [c for lvl in skip_chs_per_level for c in lvl]
        self.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        prev = ch[-1]
        for i in range(n):
            has_attn = i > 0
            has_up = i < n - 1
            skip_chs = [skips.pop() for _ in range(layers_per_block + 1)]
            self.up_blocks.append(_UpBlock(
                prev, skip_chs, rev[i], temb_ch, layers_per_block + 1,
                norm_num_groups, heads_at(n - 1 - i), cross_attention_dim,
                has_attn, has_up, use_linear_projection))
            prev = rev[i]

        self.conv_norm_out = nn.GroupNorm(norm_num_groups, ch[0], eps=1e-5)
        self.conv_out = nn.Conv2d(ch[0], out_channels, 3, padding=1)

    def forward(self, sample, timesteps, context):
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        temb = get_timestep_embedding(timesteps, self.block_out_channels[0])
        temb = self.time_embedding(temb)
        temb = temb.expand(sample.shape[0], -1)

        h = self.conv_in(sample)
        skips = [h]
        for blk in self.down_blocks:
            for j, resnet in enumerate(blk.resnets):
                h = resnet(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, context)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)

        for blk in self.up_blocks:
            for j, resnet in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = resnet(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, context)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))


# --------------------------------------------------------------------- VAE
class VAEAttention(nn.Module):
    """Single-head VAE mid-block attention (new to_q/to_out.0 naming)."""

    def __init__(self, channels: int, groups: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.Sequential(nn.Linear(channels, channels))

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        x = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(x), self.to_k(x), self.to_v(x)
        attn = torch.einsum("bnc,bmc->bnm", q, k) / math.sqrt(c)
        x = torch.einsum("bnm,bmc->bnc", attn.softmax(dim=-1), v)
        x = self.to_out(x)
        return x.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class _VAEDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, has_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None, groups,
                           eps=1e-6) for j in range(layers)])
        if has_down:
            self.downsamplers = nn.ModuleList(
                [Downsample2D(out_ch, asymmetric_pad=True)])


class _VAEUpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, has_up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None, groups,
                           eps=1e-6) for j in range(layers)])
        if has_up:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])


class _VAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, None, groups, eps=1e-6),
             ResnetBlock2D(ch, ch, None, groups, eps=1e-6)])
        self.attentions = nn.ModuleList([VAEAttention(ch, groups)])


class TorchVAEEncoder(nn.Module):
    def __init__(self, in_channels, block_out_channels, layers_per_block,
                 groups):
        super().__init__()
        ch = list(block_out_channels)
        self.conv_in = nn.Conv2d(in_channels, ch[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        for i in range(len(ch)):
            in_ch = ch[max(i - 1, 0)]
            self.down_blocks.append(_VAEDownBlock(
                in_ch, ch[i], layers_per_block, groups,
                has_down=i < len(ch) - 1))
        self.mid_block = _VAEMid(ch[-1], groups)
        self.conv_norm_out = nn.GroupNorm(groups, ch[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(ch[-1], 8, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for resnet in blk.resnets:
                h = resnet(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchVAEDecoder(nn.Module):
    def __init__(self, out_channels, block_out_channels, layers_per_block,
                 groups, latent_channels=4):
        super().__init__()
        rev = list(reversed(block_out_channels))
        self.conv_in = nn.Conv2d(latent_channels, rev[0], 3, padding=1)
        self.mid_block = _VAEMid(rev[0], groups)
        self.up_blocks = nn.ModuleList()
        for i in range(len(rev)):
            in_ch = rev[max(i - 1, 0)]
            self.up_blocks.append(_VAEUpBlock(
                in_ch, rev[i], layers_per_block + 1, groups,
                has_up=i < len(rev) - 1))
        self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], out_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        for blk in self.up_blocks:
            for resnet in blk.resnets:
                h = resnet(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchVAE(nn.Module):
    def __init__(self, in_channels=3, latent_channels=4,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2,
                 groups=32):
        super().__init__()
        self.encoder = TorchVAEEncoder(in_channels, block_out_channels,
                                       layers_per_block, groups)
        self.decoder = TorchVAEDecoder(in_channels, block_out_channels,
                                       layers_per_block, groups,
                                       latent_channels)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def moments(self, x):
        m = self.quant_conv(self.encoder(x))
        mean, logvar = m.chunk(2, dim=1)
        return mean, logvar.clamp(-30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
