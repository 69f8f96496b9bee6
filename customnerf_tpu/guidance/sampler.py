"""DDIM sampler — text-to-image generation with the Flax SD stack.

Serves two reference surfaces:
  * prior/class-image generation for Custom Diffusion when no real class
    images exist (reference ``custom_diffusion/train_custom_diffusion.py:706-769``
    falls back to SD sampling);
  * pipeline-parity previews (the reference holds a full DiffusionPipeline).

Implemented as a ``lax.scan`` over DDIM steps — one compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ddim_sample(guidance, prompt: str, key, num_steps: int = 50,
                guidance_scale: float = 7.5, height: int = 512,
                width: int = 512, negative: str = ""):
    """Generate one image [H, W, 3] in [0, 1]."""
    text = guidance.get_text_embeds([prompt], [negative])  # [2, 77, D]
    alphas = guidance.scheduler.alphas_cumprod
    T = guidance.scheduler.num_train_timesteps
    ts = jnp.asarray(np.linspace(T - 1, 0, num_steps).round().astype(np.int32))

    unet, unet_params = guidance.unet, guidance.unet_params
    cd_kv = guidance.cd_kv

    k_init, _ = jax.random.split(key)
    lat = jax.random.normal(k_init, (1, height // 8, width // 8, 4))

    def step(lat, i):
        t = ts[i]
        t_prev = jnp.where(i + 1 < num_steps, ts[jnp.minimum(i + 1, num_steps - 1)], -1)
        latent_in = jnp.concatenate([lat, lat], axis=0)
        eps = unet.apply(unet_params, latent_in, jnp.broadcast_to(t, (2,)),
                         text, cd_kv=cd_kv)
        uncond, cond = jnp.split(eps, 2, axis=0)
        eps = uncond + guidance_scale * (cond - uncond)  # standard CFG

        a_t = alphas[t]
        a_prev = jnp.where(t_prev >= 0, alphas[jnp.maximum(t_prev, 0)], 1.0)
        x0 = (lat - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        lat = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
        return lat, None

    lat, _ = jax.lax.scan(step, lat, jnp.arange(num_steps))
    img = guidance.vae.apply(guidance.vae_params, lat,
                             method=guidance.vae.decode)
    return jnp.clip(img[0] / 2 + 0.5, 0.0, 1.0)
