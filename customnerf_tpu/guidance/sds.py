"""Score Distillation Sampling guidance with the reference's exact semantics.

Equivalent of ``StableDiffusion`` in the reference (``nerf/sd.py:34-154``),
restructured so the UNet ε-prediction and the SDS gradient construction are
one jittable function — the render → VAE → UNet → SDS-grad chain never leaves
the chip.

Exact-semantics traps preserved (SURVEY.md §7):
  * t ∈ [0.02·T, max_ratio·T] (sd.py:67-69); ``--stage_time`` halves max_step
    after iters/2 (sd.py:120-131); t ×= t_ratio then truncated to int
    (sd.py:132).
  * **text-anchored CFG**: ε̂ = ε_text + cfg·(ε_text − ε_uncond) — NOT the
    standard uncond-anchored form (sd.py:142-143), cfg default 100.
  * grad = (1−ᾱ_t)·(ε̂ − ε)·lambda_sd, nan_to_num, injected as
    0.5·MSE(latents, (latents−grad).detach(), reduction=sum) (sd.py:145-152).

Weights: random-init unless ``--sd_weights`` points at a local torch SD
checkpoint directory (converted by ``guidance/weights.py``) — the reference
equally depends on an external download; the artifact, not the code, is the
external part.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from customnerf_tpu.guidance.scheduler import DDPMSchedule
from customnerf_tpu.guidance.text import TextEncoder
from customnerf_tpu.guidance.unet import (UNet2DCondition, UNetConfig,
                                          sd2_unet_config)
from customnerf_tpu.guidance.vae import AutoencoderKL, VAEConfig


@jax.custom_vjp
def specify_gradient(x, gt_grad):
    """Inject a precomputed gradient (reference ``SpecifyGradient``,
    sd.py:13-26): forward returns a scalar 1; backward routes ``gt_grad``
    into ``x``.  The editing trainer uses the equivalent surrogate-loss
    formulation instead; this utility exists for API parity."""
    del gt_grad
    return jnp.ones(())


def _sg_fwd(x, gt_grad):
    return jnp.ones(()), gt_grad


def _sg_bwd(gt_grad, ct):
    return (gt_grad * ct, None)


specify_gradient.defvjp(_sg_fwd, _sg_bwd)


class StableDiffusionGuidance:
    def __init__(self, opt, dtype: str = "bfloat16"):
        self.opt = opt
        sd_version = opt.sd_version
        cross_dim = 1024 if sd_version.startswith("2") else 768

        if jax.devices()[0].platform == "cpu":
            dtype = "float32"
        # SD 2.x: 64-dim heads (5/10/20/20 per block) + 1024-d OpenCLIP
        # context (reference supports 2.0/2.1 via nerf/sd.py:44-54)
        unet_cfg = (sd2_unet_config(dtype) if sd_version.startswith("2")
                    else UNetConfig(cross_attention_dim=cross_dim,
                                    dtype=dtype))
        self.unet = UNet2DCondition(unet_cfg)
        self.vae = AutoencoderKL(VAEConfig(dtype=dtype))
        self.text_encoder = TextEncoder(sd_version, weights_dir=opt.sd_weights,
                                        seed=opt.seed)

        key = jax.random.PRNGKey(opt.seed)
        k_unet, k_vae = jax.random.split(key)
        # init on host CPU: compiling a 860M-param init program through a
        # remote TPU tunnel takes minutes; params migrate to device on first
        # use instead.  Some TPU plugins expose no 'cpu' backend — fall back
        # to the default device there.
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = jax.devices()[0]
        with jax.default_device(cpu):
            latents = jnp.zeros((1, 8, 8, 4))
            ctx = jnp.zeros((1, 77, cross_dim))
            self.unet_params = self.unet.init(
                k_unet, latents, jnp.zeros((1,), jnp.int32), ctx)
            imgs = jnp.zeros((1, 64, 64, 3))
            self.vae_params = self.vae.init({"params": k_vae}, imgs, k_vae)

        self.cd_kv = None  # Custom Diffusion adapter table (use_cd)
        if opt.use_cd is not None and not opt.test:
            from customnerf_tpu.guidance.custom_diffusion import load_cd_artifacts
            self.cd_kv, token_embeds = load_cd_artifacts(opt.use_cd, self.text_encoder)
            if token_embeds:
                print(f"[INFO] loaded Custom Diffusion adapters + "
                      f"{list(token_embeds)} from {opt.use_cd}")

        if opt.sd_weights:
            from customnerf_tpu.guidance.weights import load_sd_weights
            load_sd_weights(self, opt.sd_weights)
        elif (getattr(opt, "pretrained", False)
              and not getattr(opt, "test", False)
              and not getattr(opt, "allow_random_guidance", False)):
            # a 10k-iter semantic run must not silently distill noise
            raise RuntimeError(
                "editing requested without --sd_weights: Stable Diffusion "
                "would run with RANDOM weights and the edit would be noise. "
                "Point --sd_weights at a local SD checkpoint directory, or "
                "pass --allow_random_guidance to opt into random weights "
                "(plumbing tests/benchmarks only).")
        else:
            print("[WARN] no --sd_weights given: SD runs with random weights "
                  "(framework-functional; provide a local checkpoint for real edits).")

        if dtype == "bfloat16":
            # store SD params in bf16 on accelerators: the UNet/VAE run in a
            # bf16 compute policy anyway and fp32 storage (3.4 GB UNet) tips
            # the editing programs over HBM (observed OOM by 0.8 GB on v5e)
            cast = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
            self.unet_params = cast(self.unet_params)
            self.vae_params = cast(self.vae_params)

        self.scheduler = DDPMSchedule()
        self.num_train_timesteps = self.scheduler.num_train_timesteps
        self.min_step = int(self.num_train_timesteps * 0.02)
        self.max_step = int(self.num_train_timesteps * opt.max_ratio)
        self.alphas = self.scheduler.alphas_cumprod
        self.system = None
        self._jit_cache = {}

    # ---------------------------------------------------------------- text
    def get_text_embeds(self, prompt, negative_prompt):
        return self.text_encoder.get_text_embeds(prompt, negative_prompt)

    # ---------------------------------------------------------------- image
    def encode_imgs_fn(self):
        """Returns a pure fn(vae_params, images, key) → latents.

        vae_params must be threaded as a jit ARGUMENT by callers — closing
        over them would bake GBs of constants into the XLA program.
        """
        vae = self.vae

        def encode(vae_params, images_nhwc, key):
            imgs = 2.0 * images_nhwc - 1.0
            return vae.apply(vae_params, imgs, key, method=vae.encode)

        return encode

    def encode_imgs(self, images_nhwc, key):
        return self.encode_imgs_fn()(self.vae_params, images_nhwc, key)

    # ----------------------------------------------------------------- SDS
    def sds_loss_fn(self):
        """Pure fn(unet_params, latents, text_embeddings, t, noise_key)
        → (loss, aux).

        Differentiable in ``latents`` only — UNet runs under stop_gradient,
        exactly like the reference's no_grad UNet + detached target.
        unet_params is an explicit argument (never a closure constant).
        """
        unet = self.unet
        alphas = self.alphas
        lambda_sd = self.opt.lambda_sd
        guidance_scale = self.opt.cfg
        scheduler = self.scheduler
        cd_kv = self.cd_kv

        def loss_fn(unet_params, latents, text_embeddings, t, key):
            noise = jax.random.normal(key, latents.shape, dtype=latents.dtype)
            latents_noisy = scheduler.add_noise(latents, noise, t)
            latent_in = jnp.concatenate([latents_noisy, latents_noisy], axis=0)
            tt = jnp.broadcast_to(t, (latent_in.shape[0],))
            noise_pred = unet.apply(unet_params, jax.lax.stop_gradient(latent_in),
                                    tt, text_embeddings, cd_kv=cd_kv)
            noise_uncond, noise_text = jnp.split(noise_pred, 2, axis=0)
            # text-anchored CFG (sd.py:142-143)
            noise_pred = noise_text + guidance_scale * (noise_text - noise_uncond)

            w = 1.0 - alphas[t]
            grad = (w * (noise_pred.astype(jnp.float32) - noise)
                    * lambda_sd)
            grad = jnp.nan_to_num(grad)
            target = jax.lax.stop_gradient(latents - grad)
            loss = 0.5 * jnp.sum((latents - target) ** 2)
            return loss, {"loss_sds": loss}

        return loss_fn

    def sample_timestep(self, key, global_step: Optional[int] = None,
                        t_ratio: float = 1.0):
        """Reference t sampling incl. stage_time (sd.py:120-132).  Host-side
        (one scalar per step)."""
        min_step, max_step = self.min_step, self.max_step
        if self.opt.stage_time and global_step is not None:
            if global_step > self.opt.iters / 2:
                max_step = int(max_step * 0.5)
        t = int(jax.random.randint(key, (), min_step, max_step + 1))
        return int(t * t_ratio)

    def set_system(self, system):
        self.system = system

    # ------------------------------------------------- reference-like API
    def train_step(self, latents, text_embeddings, key, t_ratio: float = 1.0,
                   system=None, **_):
        """Host-facing convenience mirroring sd.py:115-154 (the editing
        trainer uses the fused jitted path in engine/editing.py instead)."""
        system = system or self.system
        k_t, k_n = jax.random.split(key)
        t = self.sample_timestep(
            k_t, getattr(system, "global_step", None), t_ratio)
        loss_fn = self.sds_loss_fn()
        loss, aux = loss_fn(self.unet_params, latents, text_embeddings,
                            jnp.asarray(t), k_n)
        return loss, {k: float(v) for k, v in aux.items()}
