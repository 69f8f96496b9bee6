"""Flax AutoencoderKL (Stable Diffusion VAE), encoder + decoder.

Native implementation matching the SD 1.x VAE so torch weights convert 1:1.
The SDS loop only needs ``encode`` (reference ``nerf/sd.py:97-105``:
2·img−1 → posterior sample → ×0.18215); ``decode`` is provided for parity
with the reference pipeline surface (image preview / debugging).
NHWC layout throughout (TPU-native conv layout).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        attn = jnp.einsum("bnc,bmc->bnm", q, k,
                          preferred_element_type=jnp.float32) / jnp.sqrt(c)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        x = jnp.einsum("bnm,bmc->bnc", attn, v)
        x = nn.Dense(c, dtype=self.dtype, name="to_out_0")(x)
        return x.reshape(b, h, w, c) + res


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = c.compute_dtype
        x = x.astype(dt)
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1, dtype=dt,
                    name="conv_in")(x)
        for i, ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = VAEResnet(ch, c.norm_num_groups, dtype=dt,
                              name=f"down_{i}_resnet_{j}")(h)
            if i < len(c.block_out_channels) - 1:
                # asymmetric pad (0,1) then stride-2 conv (SD VAE downsample)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID", dtype=dt,
                            name=f"down_{i}_downsample")(h)
        ch = c.block_out_channels[-1]
        h = VAEResnet(ch, c.norm_num_groups, dtype=dt, name="mid_resnet_0")(h)
        h = VAEAttention(ch, c.norm_num_groups, dtype=dt, name="mid_attn_0")(h)
        h = VAEResnet(ch, c.norm_num_groups, dtype=dt, name="mid_resnet_1")(h)
        h = nn.GroupNorm(c.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * c.latent_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(h)
        return h  # moments [B, H/8, W/8, 8]


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        dt = c.compute_dtype
        z = z.astype(dt)
        rev = list(reversed(c.block_out_channels))  # (512,512,256,128)
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=dt, name="conv_in")(z)
        h = VAEResnet(rev[0], c.norm_num_groups, dtype=dt, name="mid_resnet_0")(h)
        h = VAEAttention(rev[0], c.norm_num_groups, dtype=dt, name="mid_attn_0")(h)
        h = VAEResnet(rev[0], c.norm_num_groups, dtype=dt, name="mid_resnet_1")(h)
        for i, ch in enumerate(rev):
            for j in range(c.layers_per_block + 1):
                h = VAEResnet(ch, c.norm_num_groups, dtype=dt,
                              name=f"up_{i}_resnet_{j}")(h)
            if i < len(rev) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), method="nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=dt,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(c.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(c.in_channels, (3, 3), padding=1, dtype=jnp.float32,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = field(default_factory=VAEConfig)

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        # latent-space 1×1 convs in fp32: the sampled latents feed the SDS
        # gradient path and must stay full precision
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=jnp.float32,
                                       name="post_quant_conv")

    def moments(self, images):
        """images NHWC in [-1, 1] → (mean, logvar) each [B,h,w,4]."""
        m = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(m, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, images, key):
        """Sample the posterior and scale (reference sd.py:97-105 semantics)."""
        mean, logvar = self.moments(images)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
        return z * self.cfg.scaling_factor

    def decode(self, latents):
        z = latents / self.cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, images, key):
        return self.decode(self.encode(images, key))
