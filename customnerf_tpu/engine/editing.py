"""LGIE editing: Local-Global Iterative Editing with SDS guidance.

Equivalent of the reference editing trainer
(``nerf/utils_init_nerf.py:243-394``), reorganised TPU-first: one jitted
function fuses the full-image render, the fg/bg decomposition, the bilinear
512² resize, the VAE encode, the UNet ε-prediction (stop-gradient), the SDS
gradient injection, the keep_bg L1, grads and the Adam update.  Host code
only samples scalars (LGIE gate, timestep, bg color key) and manages the
frozen-render cache.

Semantics preserved:
  * bg_color random/black/white per step (utils_init_nerf.py:357-364).
  * frozen pretrained render cached per img_path, **with the same bg_color
    handling** and perturb=True, plus CLIP view match_probs computed once
    (utils_init_nerf.py:243-265).
  * LGIE gate: g_only/l_only/Bernoulli(global_ratio) choosing (full image,
    text_z, t_ratio=1) vs (fg image, text_z_fg, t_ratio=local_t_ratio)
    (utils_init_nerf.py:286-301).
  * ``--ori_bg``: paste GT pixels where neither mask covers
    (utils_init_nerf.py:378-380).
  * loss = SDS + keep_bg·L1(pt_bg, pred_bg) (utils_init_nerf.py:383-391).
  * clip_view prompt selection via argmax match prob
    (utils_init_nerf.py:267-280).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from customnerf_tpu.guidance.clip_view import VIEW_NAMES
from customnerf_tpu.models.renderer import render_rays


def prepare_text_embeddings(trainer):
    """Embed the prompt set (text / text_fg / text_norm / text_fg_norm /
    text_bg), with per-view variants under --clip_view
    (utils_init_nerf.py:310-351)."""
    opt, guidance = trainer.opt, trainer.guidance

    def embed(input_text):
        if opt.clip_view:
            return [guidance.get_text_embeds([f"{input_text}, {d} view"],
                                             [opt.negative])
                    for d in VIEW_NAMES]
        return guidance.get_text_embeds([input_text], [opt.negative])

    trainer.text_z = embed(opt.text)
    trainer.text_z_fg = embed(opt.text_fg)
    trainer.text_z_norm = embed(opt.text_norm)
    trainer.text_z_norm_fg = embed(opt.text_fg_norm)
    trainer.text_z_bg = guidance.get_text_embeds([opt.text_bg], [opt.negative])

    if opt.clip_view and not hasattr(trainer, "clip_matcher"):
        from customnerf_tpu.guidance.clip_view import CLIPViewMatcher
        trainer.clip_matcher = CLIPViewMatcher(weights_dir=opt.clip_weights,
                                               seed=opt.seed)


def _get_pt(trainer, batch, bg_color):
    """Frozen-model render cache (utils_init_nerf.py:243-265).  Cached on
    device; computed once per image path."""
    if batch.img_path in trainer.pt_dict:
        return trainer.pt_dict[batch.img_path]

    out = trainer.render_image(batch.rays_o, batch.rays_d, perturb=True,
                               params=trainer.params_pretrained)
    H, W = batch.H, batch.W
    pt_rgb = out["image"].reshape(H, W, 3)
    pt_rgb_bg = out["bg"]["image"].reshape(H, W, 3)
    pt_rgb_fg = out["fg"]["image"].reshape(H, W, 3)
    pt_mask = out["render_mask"].reshape(H, W, -1)
    pt_depth_fg = out["fg"]["depth"].reshape(H, W, 1)

    match_probs = None
    if trainer.opt.clip_view:
        match_probs = trainer.clip_matcher.match_probs(pt_rgb[None])[0]

    entry = dict(pt_rgb_bg=pt_rgb_bg, pt_rgb_fg=pt_rgb_fg, pt_mask=pt_mask,
                 pt_depth_fg=pt_depth_fg, match_probs=match_probs)
    trainer.pt_dict[batch.img_path] = entry
    return entry


def _select_text(trainer, match_probs):
    """clip_view argmax prompt selection (utils_init_nerf.py:267-280)."""
    if trainer.opt.clip_view and match_probs is not None:
        sel = int(np.argmax(np.asarray(match_probs)))
        return trainer.text_z[sel], trainer.text_z_fg[sel]
    return trainer.text_z, trainer.text_z_fg


def _build_editing_step(trainer):
    opt = trainer.opt
    s = trainer.settings
    field = trainer.field
    tx = trainer.tx
    guidance = trainer.guidance
    sds_loss = guidance.sds_loss_fn()
    encode_imgs = guidance.encode_imgs_fn()
    keep_bg = float(opt.keep_bg)
    ori_bg = bool(opt.ori_bg)
    lambda_sd = float(opt.lambda_sd)

    @jax.jit
    def step(params, opt_state, rays_o, rays_d, gt_rgbs, bg_color,
             pt_rgb_bg, pt_mask, text_emb, use_fg, t, key):
        """use_fg: f32 scalar 0/1 (local branch); t: int32 scalar."""
        k_render, k_vae, k_noise = jax.random.split(key, 3)
        H, W = pt_rgb_bg.shape[0], pt_rgb_bg.shape[1]

        def loss_fn(p):
            out = render_rays(field, p, rays_o, rays_d, k_render, s,
                              train=True, perturb=True, bg_color=bg_color)
            pred_rgb = out["image"].reshape(H, W, 3)
            pred_rgb_fg = out["fg"]["image"].reshape(H, W, 3)
            pred_rgb_bg = out["bg"]["image"].reshape(H, W, 3)
            pred_mask = out["render_mask"].reshape(H, W, -1)

            aux = {}
            loss = 0.0
            if lambda_sd:
                img = jnp.where(use_fg > 0.5, pred_rgb_fg, pred_rgb)
                img512 = jax.image.resize(img[None], (1, 512, 512, 3),
                                          method="bilinear")
                latents = encode_imgs(img512, k_vae)
                loss_sd, sd_aux = sds_loss(latents, text_emb, t, k_noise)
                loss = loss + loss_sd
                aux.update(sd_aux)

            if keep_bg:
                target_bg = pt_rgb_bg
                if ori_bg:
                    non_edit = (pt_mask.mean(-1, keepdims=True)
                                + pred_mask.mean(-1, keepdims=True)) < 0.5
                    target_bg = jnp.where(
                        non_edit, gt_rgbs.reshape(H, W, 3), pt_rgb_bg)
                loss_bg = keep_bg * jnp.mean(jnp.abs(target_bg - pred_rgb_bg))
                loss = loss + loss_bg
                aux["loss_bg"] = loss_bg
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step


def editing_step(trainer, batch, key):
    """One LGIE editing step.  Returns (loss, loss_dict)."""
    opt = trainer.opt
    if not hasattr(trainer, "text_z"):
        prepare_text_embeddings(trainer)
    if "editing" not in trainer._compiled:
        trainer._compiled["editing"] = _build_editing_step(trainer)
    step = trainer._compiled["editing"]

    # host-side scalar sampling; key order documented in Trainer.__init__
    k_bg, k_t, k_step = jax.random.split(key, 3)

    if opt.random_bg_c:
        bg_color = jax.random.uniform(k_bg, (3,))
    elif opt.black_bg_c:
        bg_color = jnp.zeros((3,))
    elif opt.white_bg_c:
        bg_color = jnp.ones((3,))
    else:
        bg_color = None
    bg_arg = bg_color if bg_color is not None else jnp.zeros((3,))

    pt = _get_pt(trainer, batch, bg_color)
    text_z, text_z_fg = _select_text(trainer, pt["match_probs"])

    # LGIE gate (utils_init_nerf.py:286-301)
    t_ratio = 1.0
    if opt.g_only:
        use_fg, text_emb = 0.0, text_z
    elif opt.l_only:
        use_fg, text_emb, t_ratio = 1.0, text_z_fg, opt.local_t_ratio
    elif trainer._np_rng.random() < opt.global_ratio:
        use_fg, text_emb = 0.0, text_z
    else:
        use_fg, text_emb, t_ratio = 1.0, text_z_fg, opt.local_t_ratio

    t = trainer.guidance.sample_timestep(k_t, trainer.global_step, t_ratio)

    trainer.params, trainer.opt_state, loss, aux = step(
        trainer.params, trainer.opt_state,
        batch.rays_o, batch.rays_d, batch.rgbs, bg_arg,
        pt["pt_rgb_bg"], pt["pt_mask"], text_emb,
        jnp.float32(use_fg), jnp.int32(t), k_step,
    )
    return loss, {k: float(v) for k, v in aux.items()}
