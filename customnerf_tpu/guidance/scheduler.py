"""DDPM noise schedule for SDS.

Stable Diffusion's scaled-linear beta schedule (β from 0.00085 to 0.012 over
1000 steps, betas = linspace(√β0, √β1)²), exposing ``alphas_cumprod`` and
``add_noise`` — the two pieces SDS needs (reference ``nerf/sd.py:67-70,136``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class DDPMSchedule:
    def __init__(self, num_train_timesteps: int = 1000,
                 beta_start: float = 0.00085, beta_end: float = 0.012,
                 beta_schedule: str = "scaled_linear"):
        self.num_train_timesteps = num_train_timesteps
        if beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                num_train_timesteps, dtype=np.float64) ** 2
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                                dtype=np.float64)
        else:
            raise ValueError(beta_schedule)
        alphas = 1.0 - betas
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas), dtype=jnp.float32)

    def add_noise(self, latents, noise, t):
        """x_t = √ᾱ_t·x_0 + √(1−ᾱ_t)·ε  (t: int scalar or [B])."""
        a = self.alphas_cumprod[t]
        while a.ndim < latents.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise
