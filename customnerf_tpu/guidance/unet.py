"""Flax Stable Diffusion UNet (UNet2DConditionModel, SD 1.x/2.x family).

Native implementation (no diffusers): 4-level UNet with cross-attention
transformer blocks, matching the SD 1.5 architecture the reference loads via
``DiffusionPipeline.from_pretrained`` (reference ``nerf/sd.py:44-65``), so
torch SD weights convert 1:1 (see ``guidance/weights.py``).

TPU notes: convs/attention run in NHWC (XLA's native TPU layout); params are
created fp32 with an optional bf16 compute dtype; attention uses one fused
``einsum`` per projection — at 64×64 latents these land on the MXU directly.
Custom-Diffusion K/V adapter hooks: cross-attention K/V projections accept an
optional override table (``cd_kv``) so concept-tuned weights can be injected
without rebuilding the module (reference ``nerf/sd.py:56-59``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768       # 1024 for SD 2.x
    # Heads per block, following diffusers' (historically misnamed)
    # ``attention_head_dim``: an int applies to every level (SD 1.5: 8 heads,
    # dim_head = ch/8); a tuple gives per-level head counts (SD 2.x:
    # (5, 10, 20, 20) → 64-dim heads at channels (320, 640, 1280, 1280)).
    attention_head_dim: int | Tuple[int, ...] = 8
    norm_num_groups: int = 32
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def heads_at(self, level: int) -> int:
        hd = self.attention_head_dim
        return int(hd[level]) if isinstance(hd, (tuple, list)) else int(hd)


def sd2_unet_config(dtype: str = "float32") -> UNetConfig:
    """SD 2.0/2.1(-base) UNet architecture (diffusers unet/config.json:
    cross_attention_dim 1024, attention_head_dim [5, 10, 20, 20] = 64-dim
    heads, use_linear_projection — the linear proj_in/out is mathematically
    a 1×1 conv, which is how ``weights.py`` maps it)."""
    return UNetConfig(cross_attention_dim=1024,
                      attention_head_dim=(5, 10, 20, 20), dtype=dtype)


def timestep_embedding(t, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding (cos|sin ordering flipped vs NeRF:
    diffusers uses [cos, sin] after a half-dim exp ramp... SD uses sin|cos
    with flip_sin_to_cos=True → [cos, sin])."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbed(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, temb):
        temb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(temb)
        return temb


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """Multi-head attention; self-attn when context is None."""

    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    cd_adapter: bool = False   # expose Custom-Diffusion K/V override hook

    @nn.compact
    def __call__(self, x, context=None, cd_kv=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        if cd_kv is not None and "to_q" in cd_kv:
            # Custom Diffusion --freeze_model crossattn: tuned Q too
            # (reference train_custom_diffusion.py:904-946 train_q_out)
            q = x @ cd_kv["to_q"].astype(self.dtype)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        if cd_kv is not None:
            # Custom Diffusion: swap in tuned K/V projection weights
            k = context @ cd_kv["to_k"].astype(self.dtype)
            v = context @ cd_kv["to_v"].astype(self.dtype)
        else:
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)

        scale = 1.0 / np.sqrt(self.dim_head)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(b, n, inner)
        if cd_kv is not None and "to_out" in cd_kv:
            return (out @ cd_kv["to_out"].astype(self.dtype)
                    + cd_kv["to_out_bias"].astype(self.dtype))
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


class FeedForwardGEGLU(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU applies torch F.gelu = EXACT erf gelu; flax's
        # default is the tanh approximation (≠ by up to ~3e-3 per activation)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, cd_kv=None):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               dtype=self.dtype, name="attn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               context_dim=self.context_dim, dtype=self.dtype,
                               cd_adapter=True, name="attn2")(h, context, cd_kv)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        x = x + FeedForwardGEGLU(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    channels: int
    heads: int
    context_dim: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, cd_kv=None):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm")(x)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        dim_head = self.channels // self.heads
        x = BasicTransformerBlock(self.channels, self.heads, dim_head,
                                  self.context_dim, dtype=self.dtype,
                                  name="transformer_blocks_0")(x, context, cd_kv)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class UNet2DCondition(nn.Module):
    """SD UNet.  __call__(latents NHWC [B,H,W,4], t [B], context [B,77,D])."""

    cfg: UNetConfig = field(default_factory=UNetConfig)

    @nn.compact
    def __call__(self, sample, timesteps, context, cd_kv=None):
        c = self.cfg
        dt = c.compute_dtype
        block_ch = c.block_out_channels
        n_levels = len(block_ch)
        time_dim = block_ch[0] * 4

        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        temb = timestep_embedding(timesteps, block_ch[0])
        temb = TimestepEmbed(time_dim, dtype=dt, name="time_embedding")(temb)
        temb = jnp.broadcast_to(temb, (sample.shape[0], time_dim))

        sample = sample.astype(dt)
        context = context.astype(dt)

        def kv(name):
            return None if cd_kv is None else cd_kv.get(name)

        h = nn.Conv(block_ch[0], (3, 3), padding=1, dtype=dt, name="conv_in")(sample)
        skips = [h]

        # ---- down blocks: CrossAttn ×(n_levels−1), plain last ------------
        for i, ch in enumerate(block_ch):
            has_attn = i < n_levels - 1
            for j in range(c.layers_per_block):
                h = ResnetBlock(ch, c.norm_num_groups, dtype=dt,
                                name=f"down_{i}_resnet_{j}")(h, temb)
                if has_attn:
                    h = Transformer2D(ch, c.heads_at(i),
                                      c.cross_attention_dim,
                                      c.norm_num_groups, dtype=dt,
                                      name=f"down_{i}_attn_{j}")(
                        h, context, kv(f"down_{i}_attn_{j}"))
                skips.append(h)
            if i < n_levels - 1:
                h = Downsample(ch, dtype=dt, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # ---- mid ----------------------------------------------------------
        h = ResnetBlock(block_ch[-1], c.norm_num_groups, dtype=dt,
                        name="mid_resnet_0")(h, temb)
        h = Transformer2D(block_ch[-1], c.heads_at(n_levels - 1),
                          c.cross_attention_dim, c.norm_num_groups, dtype=dt,
                          name="mid_attn_0")(h, context, kv("mid_attn_0"))
        h = ResnetBlock(block_ch[-1], c.norm_num_groups, dtype=dt,
                        name="mid_resnet_1")(h, temb)

        # ---- up blocks: plain first, CrossAttn the rest --------------------
        rev_ch = list(reversed(block_ch))           # e.g. (1280,1280,640,320)
        for i, ch in enumerate(rev_ch):
            has_attn = i > 0
            for j in range(c.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(ch, c.norm_num_groups, dtype=dt,
                                name=f"up_{i}_resnet_{j}")(h, temb)
                if has_attn:
                    h = Transformer2D(ch, c.heads_at(n_levels - 1 - i),
                                      c.cross_attention_dim,
                                      c.norm_num_groups, dtype=dt,
                                      name=f"up_{i}_attn_{j}")(
                        h, context, kv(f"up_{i}_attn_{j}"))
            if i < n_levels - 1:
                h = Upsample(ch, dtype=dt, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(c.norm_num_groups, epsilon=1e-5, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(c.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(h)
        return h
