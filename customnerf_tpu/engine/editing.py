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

import jax
import jax.numpy as jnp
import numpy as np
import optax

from customnerf_tpu.guidance.clip_view import VIEW_NAMES


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
        if not opt.clip_weights and not getattr(opt, "allow_random_guidance",
                                                False):
            raise RuntimeError(
                "--clip_view without --clip_weights: view matching would use "
                "a RANDOM CLIP and pick arbitrary prompts. Provide "
                "--clip_weights or pass --allow_random_guidance.")
        from customnerf_tpu.guidance.clip_view import CLIPViewMatcher
        trainer.clip_matcher = CLIPViewMatcher(weights_dir=opt.clip_weights,
                                               seed=opt.seed)


def _get_pt(trainer, batch, bg_color, params=None, cache_key=None):
    """Frozen-model render cache (utils_init_nerf.py:243-265).  Cached on
    device; computed once per image path, with the bg_color of the first
    step that touches the image filled into the FULL frozen image exactly
    as the reference threads bg_color into the frozen render
    (utils_init_nerf.py:245) — the fg/bg composites stay unfilled
    (docs/PARITY.md deviation 1), matching the trainable render.

    ``params``/``cache_key`` support multi-scene editing: each scene's
    frozen PRETRAINED field renders its own keep_bg target, keyed by
    (scene, img_path) so scenes never share cache entries."""
    cache_key = cache_key if cache_key is not None else batch.img_path
    if cache_key in trainer.pt_dict:
        return trainer.pt_dict[cache_key]

    out = trainer.render_image(batch.rays_o, batch.rays_d, perturb=True,
                               bg_color=bg_color,
                               params=(params if params is not None
                                       else trainer.params_pretrained))
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
    trainer.pt_dict[cache_key] = entry
    return entry


def prepare_scene_prompts(trainer, text: str, text_fg: str):
    """Embed one scene's prompt pair for multi-scene editing (N scenes × M
    prompts, BASELINE config 5) — same per-view expansion as
    :func:`prepare_text_embeddings` under --clip_view.  Returns a dict
    usable as a ``scenes[i]`` entry of :func:`editing_step_scenes`."""
    opt, guidance = trainer.opt, trainer.guidance

    def embed(input_text):
        if opt.clip_view:
            return [guidance.get_text_embeds([f"{input_text}, {d} view"],
                                             [opt.negative])
                    for d in VIEW_NAMES]
        return guidance.get_text_embeds([input_text], [opt.negative])

    return {"text_z": embed(text), "text_z_fg": embed(text_fg)}


def _select_text(trainer, match_probs, text_z=None, text_z_fg=None):
    """clip_view argmax prompt selection (utils_init_nerf.py:267-280).
    ``text_z``/``text_z_fg`` override the trainer-level prompt set (per-scene
    prompts in multi-scene editing)."""
    text_z = text_z if text_z is not None else trainer.text_z
    text_z_fg = text_z_fg if text_z_fg is not None else trainer.text_z_fg
    if trainer.opt.clip_view and match_probs is not None:
        sel = int(np.argmax(np.asarray(match_probs)))
        return text_z[sel], text_z_fg[sel]
    return text_z, text_z_fg


def _build_editing_step(trainer):
    """Three jitted programs instead of one fused graph.

    The SD UNet is forward-only under SDS (reference runs it in no_grad,
    sd.py:134-140), so dL_sds/dlatents = w·(ε̂−ε)·λ exactly.  We therefore
    (A) forward-render to latents, (B) run the UNet ε-prediction and form the
    latent cotangent, (C) differentiate the surrogate
    ``sum(latents(p)·sg(cotangent)) + keep_bg·L1`` — whose params-gradient is
    identical to the fused loss.  This keeps each XLA program small enough
    for remote-compile backends and excludes the 860M-param UNet from the
    autodiff graph entirely.
    """
    opt = trainer.opt
    tx = trainer.tx
    guidance = trainer.guidance
    sds_loss = guidance.sds_loss_fn()
    encode_imgs = guidance.encode_imgs_fn()
    keep_bg = float(opt.keep_bg)
    ori_bg = bool(opt.ori_bg)
    lambda_sd = float(opt.lambda_sd)
    # honor -O (occupancy fast path) and --backend pallas, like recon does
    render = trainer._render_fn()

    def render_to_latents(p, vae_params, occ, rays_o, rays_d, bg_color,
                          use_fg, H, W, k_render, k_vae):
        # rays may be padded past H·W for even mesh sharding — slice back
        out = render(p, occ, rays_o, rays_d, k_render, train=True,
                     perturb=True, bg_color=bg_color)
        n = H * W
        pred_rgb = out["image"][:n].reshape(H, W, 3)
        pred_rgb_fg = out["fg"]["image"][:n].reshape(H, W, 3)
        pred_rgb_bg = out["bg"]["image"][:n].reshape(H, W, 3)
        pred_mask = out["render_mask"][:n].reshape(H, W, -1)
        img = jnp.where(use_fg > 0.5, pred_rgb_fg, pred_rgb)
        img512 = jax.image.resize(img[None], (1, 512, 512, 3),
                                  method="bilinear")
        # remat the VAE encoder: its 512² activations dominate the backward's
        # live set (SURVEY.md §7 "SDS loop memory")
        latents = jax.checkpoint(
            lambda vp, im: encode_imgs(vp, im, k_vae))(vae_params, img512)
        return latents, (pred_rgb_bg, pred_mask)

    @jax.jit
    def prog_b(unet_params, latents, text_emb, t, key):
        """UNet ε-prediction → latent cotangent = dL_sds/dlatents.

        The SDS loss VALUE is 0.5·Σ(latents−target)² = 0.5·Σ grad²
        (sd.py:150-152), so both come from the same quantity.  Shape-
        independent (latents are always [1, 64, 64, 4]) — lives outside the
        per-(H, W) cache so a resolution change never recompiles the UNet."""
        _, _, k_noise = jax.random.split(key, 3)
        grad = jax.grad(
            lambda l: sds_loss(unet_params, l, text_emb, t, k_noise)[0]
        )(latents)
        loss_sds = 0.5 * jnp.sum(grad ** 2)
        return grad, loss_sds

    # H, W are static per dataset; build closures lazily keyed by shape
    cache = {}

    def get_programs(H, W):
        if (H, W) in cache:
            return cache[(H, W)]

        @jax.jit
        def prog_a(params, vae_params, occ, rays_o, rays_d, bg_color, use_fg,
                   key):
            k_render, k_vae, _ = jax.random.split(key, 3)
            latents, _ = render_to_latents(params, vae_params, occ, rays_o,
                                           rays_d, bg_color, use_fg, H, W,
                                           k_render, k_vae)
            return latents

        @jax.jit
        def prog_c(params, opt_state, vae_params, occ, rays_o, rays_d,
                   gt_rgbs, bg_color, pt_rgb_bg, pt_mask, cotangent, use_fg,
                   key):
            k_render, k_vae, _ = jax.random.split(key, 3)

            def loss_fn(p):
                latents, (pred_rgb_bg, pred_mask) = render_to_latents(
                    p, vae_params, occ, rays_o, rays_d, bg_color, use_fg,
                    H, W, k_render, k_vae)
                aux = {}
                loss = 0.0
                if lambda_sd:
                    loss_sd = jnp.sum(latents * jax.lax.stop_gradient(cotangent))
                    loss = loss + loss_sd
                    aux["loss_sds"] = loss_sd
                if keep_bg:
                    target_bg = pt_rgb_bg
                    if ori_bg:
                        non_edit = (pt_mask.mean(-1, keepdims=True)
                                    + pred_mask.mean(-1, keepdims=True)) < 0.5
                        target_bg = jnp.where(
                            non_edit, gt_rgbs[:H * W].reshape(H, W, 3),
                            pt_rgb_bg)
                    loss_bg = keep_bg * jnp.mean(jnp.abs(target_bg - pred_rgb_bg))
                    loss = loss + loss_bg
                    aux["loss_bg"] = loss_bg
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        cache[(H, W)] = (prog_a, prog_c)
        return cache[(H, W)]

    def step(params, opt_state, rays_o, rays_d, gt_rgbs, bg_color,
             pt_rgb_bg, pt_mask, text_emb, use_fg, t, key):
        H, W = int(pt_rgb_bg.shape[0]), int(pt_rgb_bg.shape[1])
        prog_a, prog_c = get_programs(H, W)
        vae_params = guidance.vae_params
        occ = trainer.occ_state
        loss_sds = None
        if lambda_sd:
            latents = prog_a(params, vae_params, occ, rays_o, rays_d,
                             bg_color, use_fg, key)
            cotangent, loss_sds = prog_b(guidance.unet_params, latents,
                                         text_emb, t, key)
        else:
            cotangent = jnp.zeros((1, 64, 64, 4))
        params, opt_state, loss, aux = prog_c(
            params, opt_state, vae_params, occ, rays_o, rays_d, gt_rgbs,
            bg_color, pt_rgb_bg, pt_mask, cotangent, use_fg, key)
        if loss_sds is not None:
            aux = dict(aux, loss_sds=loss_sds)  # reference-comparable value
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

    rays_o, rays_d, gt = batch.rays_o, batch.rays_d, batch.rgbs
    mesh = trainer.mesh
    if mesh is not None and "data" in mesh.axis_names:
        # shard the ray axis over the mesh (editing under the mesh: rays on
        # `data`, params replicated by Trainer.__init__); pad so the shard
        # divides evenly — render_to_latents slices back to H·W.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from customnerf_tpu.parallel.mesh import pad_to_multiple

        mult = mesh.shape["data"]
        sh = NamedSharding(mesh, P("data"))
        # edge-replicate pad: a zero-direction padded ray would NaN the whole
        # gradient (far=inf → 0·inf) even though its output is sliced off
        rays_o, _ = pad_to_multiple(jnp.asarray(rays_o), mult, mode="edge")
        rays_d, _ = pad_to_multiple(jnp.asarray(rays_d), mult, mode="edge")
        gt, _ = pad_to_multiple(jnp.asarray(gt), mult, mode="edge")
        rays_o = jax.device_put(rays_o, sh)
        rays_d = jax.device_put(rays_d, sh)
        gt = jax.device_put(gt, sh)

    trainer.params, trainer.opt_state, loss, aux = step(
        trainer.params, trainer.opt_state,
        rays_o, rays_d, gt, bg_arg,
        pt["pt_rgb_bg"], pt["pt_mask"], text_emb,
        jnp.float32(use_fg), jnp.int32(t), k_step,
    )
    return loss, aux


def _build_editing_many(trainer, H, W):
    """K fused editing steps per dispatch (lax.scan) — the editing analog of
    the recon ``--steps_per_dispatch`` path (round-2 VERDICT weak #5: editing
    paid ≥3 dispatches × 100-250 ms tunnel latency per step).

    One program per K steps, and each step FUSES the round-2 three-program
    split: the render runs ONCE (the split ran it in prog_a and again in
    prog_c), the UNet ε-prediction happens inline under stop_gradient (never
    enters autodiff — the latent cotangent is ``grad`` of the SDS loss at the
    stop-gradiented latents), and the surrogate ``Σ latents·sg(cotangent)``
    carries the gradient to the field params exactly as before.  Unlike the
    round-2 fused attempt that broke the remote compiler, all SD params are
    threaded as ARGUMENTS (no 3.4 GB constant capture).

    RNG parity with :func:`editing_step`: each step's key splits 3-ways into
    (render, vae, noise) exactly like prog_a/b/c did, so a K=1 dispatch
    reproduces the split path bit-for-bit (tested)."""
    opt = trainer.opt
    tx = trainer.tx
    guidance = trainer.guidance
    sds_loss = guidance.sds_loss_fn()
    encode_imgs = guidance.encode_imgs_fn()
    keep_bg = float(opt.keep_bg)
    ori_bg = bool(opt.ori_bg)
    lambda_sd = float(opt.lambda_sd)
    render = trainer._render_fn()

    @jax.jit
    def many(params, opt_state, occ, vae_params, unet_params,
             rays_o_k, rays_d_k, gt_k, bg_k, ptbg_k, ptmask_k,
             text_k, usefg_k, t_k, keys):
        def body(carry, inp):
            params, opt_state = carry
            (rays_o, rays_d, gt_rgbs, bg_color, pt_rgb_bg, pt_mask,
             text_emb, use_fg, t, key) = inp
            k_render, k_vae, k_noise = jax.random.split(key, 3)

            def loss_fn(p):
                out = render(p, occ, rays_o, rays_d, k_render, train=True,
                             perturb=True, bg_color=bg_color)
                n = H * W
                pred_rgb = out["image"][:n].reshape(H, W, 3)
                pred_rgb_fg = out["fg"]["image"][:n].reshape(H, W, 3)
                pred_rgb_bg = out["bg"]["image"][:n].reshape(H, W, 3)
                pred_mask = out["render_mask"][:n].reshape(H, W, -1)
                img = jnp.where(use_fg > 0.5, pred_rgb_fg, pred_rgb)
                img512 = jax.image.resize(img[None], (1, 512, 512, 3),
                                          method="bilinear")
                latents = jax.checkpoint(
                    lambda vp, im: encode_imgs(vp, im, k_vae))(vae_params,
                                                               img512)
                loss = 0.0
                aux = {}
                if lambda_sd:
                    cot = jax.lax.stop_gradient(jax.grad(
                        lambda l: sds_loss(unet_params, l, text_emb, t,
                                           k_noise)[0]
                    )(jax.lax.stop_gradient(latents)))
                    loss = loss + jnp.sum(latents * cot)
                    aux["loss_sds"] = 0.5 * jnp.sum(cot ** 2)
                if keep_bg:
                    target_bg = pt_rgb_bg
                    if ori_bg:
                        non_edit = (pt_mask.mean(-1, keepdims=True)
                                    + pred_mask.mean(-1, keepdims=True)) < 0.5
                        target_bg = jnp.where(
                            non_edit, gt_rgbs[:H * W].reshape(H, W, 3),
                            pt_rgb_bg)
                    loss_bg = keep_bg * jnp.mean(
                        jnp.abs(target_bg - pred_rgb_bg))
                    loss = loss + loss_bg
                    aux["loss_bg"] = loss_bg
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, aux)

        (params, opt_state), (losses, auxes) = jax.lax.scan(
            body, (params, opt_state),
            (rays_o_k, rays_d_k, gt_k, bg_k, ptbg_k, ptmask_k,
             text_k, usefg_k, t_k, keys))
        return params, opt_state, losses, auxes

    return many


def editing_steps_many(trainer, batches, keys):
    """Run ``len(batches)`` editing steps in ONE device dispatch.

    Host work per step mirrors :func:`editing_step` exactly (same key-split
    order, same LGIE gate via ``trainer._np_rng``, same bg sampling) — the
    sampled scalars ride along as stacked arrays.  All views must share one
    image shape (per-dataset invariant)."""
    opt = trainer.opt
    if not hasattr(trainer, "text_z"):
        prepare_text_embeddings(trainer)
    H, W = int(batches[0].H), int(batches[0].W)
    cache = trainer._compiled.setdefault("editing_many", {})
    if (H, W) not in cache:
        cache[(H, W)] = _build_editing_many(trainer, H, W)
    many = cache[(H, W)]

    rays_o, rays_d, gts, bgs, ptbgs, ptmasks = ([] for _ in range(6))
    texts, use_fgs, ts, step_keys = ([] for _ in range(4))
    for batch, key in zip(batches, keys):
        trainer.global_step += 1
        k_bg, k_t, k_step = jax.random.split(key, 3)
        if opt.random_bg_c:
            bg_color = jax.random.uniform(k_bg, (3,))
        elif opt.black_bg_c:
            bg_color = jnp.zeros((3,))
        elif opt.white_bg_c:
            bg_color = jnp.ones((3,))
        else:
            bg_color = None
        pt = _get_pt(trainer, batch, bg_color)
        text_z, text_z_fg = _select_text(trainer, pt["match_probs"])
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

        rays_o.append(jnp.asarray(batch.rays_o))
        rays_d.append(jnp.asarray(batch.rays_d))
        gts.append(jnp.asarray(batch.rgbs).reshape(-1, 3))
        bgs.append(bg_color if bg_color is not None else jnp.zeros((3,)))
        ptbgs.append(pt["pt_rgb_bg"])
        ptmasks.append(pt["pt_mask"])
        texts.append(text_emb)
        use_fgs.append(jnp.float32(use_fg))
        ts.append(jnp.int32(t))
        step_keys.append(k_step)

    stack = lambda xs: jnp.stack(xs)
    rays_o, rays_d, gts = stack(rays_o), stack(rays_d), stack(gts)
    bgs, ptbgs, ptmasks = stack(bgs), stack(ptbgs), stack(ptmasks)
    texts, use_fgs, ts = stack(texts), stack(use_fgs), stack(ts)
    step_keys = stack(step_keys)

    mesh = trainer.mesh
    if mesh is not None and "data" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from customnerf_tpu.parallel.mesh import pad_to_multiple

        mult = mesh.shape["data"]
        rays_o, _ = pad_to_multiple(rays_o, mult, axis=1, mode="edge")
        rays_d, _ = pad_to_multiple(rays_d, mult, axis=1, mode="edge")
        gts, _ = pad_to_multiple(gts, mult, axis=1, mode="edge")
        sh = NamedSharding(mesh, P(None, "data"))
        rays_o, rays_d, gts = (jax.device_put(x, sh)
                               for x in (rays_o, rays_d, gts))

    params, opt_state, losses, auxes = many(
        trainer.params, trainer.opt_state, trainer.occ_state,
        trainer.guidance.vae_params, trainer.guidance.unet_params,
        rays_o, rays_d, gts, bgs, ptbgs, ptmasks, texts, use_fgs, ts,
        step_keys)
    trainer.params, trainer.opt_state = params, opt_state
    return losses, auxes


def stack_trees(trees):
    """Stack a list of identically-structured pytrees on a new leading
    (scene) axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _build_editing_step_scenes(trainer):
    """Batched multi-scene editing programs (BASELINE config 5).

    Same three-program split as :func:`_build_editing_step`, vmapped over a
    leading scene axis: per-scene field params and Adam state are stacked
    [S, ...] (sharded over the mesh's ``scene`` axis), rays carry
    [S, N, 3] (sharded ``scene`` × ``data``), and the SD UNet ε-prediction
    runs as one shared batched call — the shared-UNet design SURVEY.md §7
    step 9 calls for."""
    opt = trainer.opt
    tx = trainer.tx
    guidance = trainer.guidance
    sds_loss = guidance.sds_loss_fn()
    encode_imgs = guidance.encode_imgs_fn()
    keep_bg = float(opt.keep_bg)
    lambda_sd = float(opt.lambda_sd)
    render = trainer._render_fn()

    def render_to_latents(p, vae_params, occ, rays_o, rays_d, bg_color,
                          use_fg, H, W, key):
        k_render, k_vae, _ = jax.random.split(key, 3)
        out = render(p, occ, rays_o, rays_d, k_render, train=True,
                     perturb=True, bg_color=bg_color)
        n = H * W
        pred_rgb = out["image"][:n].reshape(H, W, 3)
        pred_rgb_fg = out["fg"]["image"][:n].reshape(H, W, 3)
        pred_rgb_bg = out["bg"]["image"][:n].reshape(H, W, 3)
        img = jnp.where(use_fg > 0.5, pred_rgb_fg, pred_rgb)
        img512 = jax.image.resize(img[None], (1, 512, 512, 3),
                                  method="bilinear")
        latents = jax.checkpoint(
            lambda vp, im: encode_imgs(vp, im, k_vae))(vae_params, img512)
        return latents, pred_rgb_bg

    def one_b(unet_params, latents, text_emb, t, key):
        grad = jax.grad(
            lambda l: sds_loss(unet_params, l, text_emb, t, key)[0]
        )(latents)
        return grad, 0.5 * jnp.sum(grad ** 2)

    # shape-independent (latent space): outside the per-(H, W) cache
    prog_b = jax.jit(jax.vmap(one_b, in_axes=(None, 0, 0, 0, 0)))

    cache = {}

    def get_programs(H, W, occ_batched=False):
        """occ_batched: per-scene occupancy states stacked on the scene axis
        (each scene marches ITS trained grid) vs one shared state."""
        ckey = (H, W, occ_batched)
        if ckey in cache:
            return cache[ckey]
        occ_ax = 0 if occ_batched else None

        def one_a(params, vae_params, occ, rays_o, rays_d, bg_color, use_fg,
                  key):
            latents, _ = render_to_latents(params, vae_params, occ, rays_o,
                                           rays_d, bg_color, use_fg, H, W,
                                           key)
            return latents

        prog_a = jax.jit(jax.vmap(one_a,
                                  in_axes=(0, None, occ_ax, 0, 0, 0, 0, 0)))

        def one_c(params, opt_state, vae_params, occ, rays_o, rays_d,
                  bg_color, pt_rgb_bg, cotangent, use_fg, key):
            def loss_fn(p):
                latents, pred_rgb_bg = render_to_latents(
                    p, vae_params, occ, rays_o, rays_d, bg_color, use_fg,
                    H, W, key)
                loss = 0.0
                aux = {}
                if lambda_sd:
                    loss_sd = jnp.sum(latents * jax.lax.stop_gradient(cotangent))
                    loss = loss + loss_sd
                    aux["loss_sds"] = loss_sd
                if keep_bg:
                    loss_bg = keep_bg * jnp.mean(jnp.abs(pt_rgb_bg - pred_rgb_bg))
                    loss = loss + loss_bg
                    aux["loss_bg"] = loss_bg
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, aux

        prog_c = jax.jit(jax.vmap(one_c,
                                  in_axes=(0, 0, None, occ_ax, 0, 0, 0, 0, 0,
                                           0, 0)))
        cache[ckey] = (prog_a, prog_b, prog_c)
        return cache[ckey]

    return get_programs  # (kept signature: returns (prog_a, prog_b, prog_c))


def editing_step_scenes(trainer, batches, params_s, opt_state_s, key,
                        scenes=None, occ_s=None):
    """One batched multi-scene LGIE editing step (BASELINE config 5:
    N scenes × M prompts).

    Args:
      batches: list of S RayBatch (one per scene/view).
      params_s / opt_state_s: per-scene field params and Adam state stacked
        on a leading scene axis (see :func:`stack_trees`); sharded over the
        mesh ``scene`` axis when ``--mesh_shape`` has one, with rays sharded
        over ``data``.  The SD UNet/VAE stay replicated and serve all scenes
        in one batched ε-prediction.
      key: per-step key; split per scene (bg color, gate, timestep).
      scenes: optional list of S per-scene dicts, each with any of
        ``params_pretrained`` (that scene's frozen field for the keep_bg
        target), ``text_z`` / ``text_z_fg`` (that scene's prompt embeddings,
        see :func:`prepare_scene_prompts`).  Missing entries fall back to
        the trainer-level pretrained model / prompt set.
      occ_s: optional per-scene occupancy states stacked with
        :func:`stack_trees` — each scene marches ITS trained grid; None
        shares ``trainer.occ_state``.

    Returns (params_s, opt_state_s, losses [S]).
    """
    opt = trainer.opt
    if not hasattr(trainer, "text_z"):
        prepare_text_embeddings(trainer)
    if "editing_scenes" not in trainer._compiled:
        trainer._compiled["editing_scenes"] = _build_editing_step_scenes(trainer)
    get_programs = trainer._compiled["editing_scenes"]

    S = len(batches)
    scenes = scenes if scenes is not None else [{}] * S
    assert len(scenes) == S, (len(scenes), S)
    # image shape comes from the batch — the bear capture is 400×300, so a
    # sqrt-derived square here would scramble every non-square view
    H, W = int(batches[0].H), int(batches[0].W)
    assert all(int(b.H) == H and int(b.W) == W for b in batches), \
        "multi-scene editing batches must share an image shape"
    assert H * W == int(batches[0].rgbs.reshape(-1, 3).shape[0]), \
        f"H·W={H * W} != ray count {batches[0].rgbs.reshape(-1, 3).shape[0]}"
    prog_a, prog_b, prog_c = get_programs(H, W, occ_batched=occ_s is not None)

    rays_o, rays_d, bgs, pts, texts, use_fgs, ts, keys = ([] for _ in range(8))
    for i, batch in enumerate(batches):
        k_bg, k_t, k_step = jax.random.split(jax.random.fold_in(key, i), 3)
        if opt.random_bg_c:
            bg = jax.random.uniform(k_bg, (3,))
        elif opt.white_bg_c:
            bg = jnp.ones((3,))
        else:
            bg = jnp.zeros((3,))
        scene = scenes[i]
        pt = _get_pt(trainer, batch, bg if opt.random_bg_c else None,
                     params=scene.get("params_pretrained"),
                     cache_key=(i, batch.img_path))
        text_z, text_z_fg = _select_text(trainer, pt["match_probs"],
                                         text_z=scene.get("text_z"),
                                         text_z_fg=scene.get("text_z_fg"))
        t_ratio = 1.0
        if opt.l_only or (not opt.g_only
                          and trainer._np_rng.random() >= opt.global_ratio):
            use_fg, text_emb, t_ratio = 1.0, text_z_fg, opt.local_t_ratio
        else:
            use_fg, text_emb = 0.0, text_z
        t = trainer.guidance.sample_timestep(k_t, trainer.global_step, t_ratio)
        rays_o.append(jnp.asarray(batch.rays_o))
        rays_d.append(jnp.asarray(batch.rays_d))
        bgs.append(bg)
        pts.append(jnp.asarray(pt["pt_rgb_bg"]))
        texts.append(text_emb)
        use_fgs.append(jnp.float32(use_fg))
        ts.append(jnp.int32(t))
        keys.append(k_step)

    stack = lambda xs: jnp.stack(xs)
    rays_o, rays_d = stack(rays_o), stack(rays_d)
    bgs, pts, texts = stack(bgs), stack(pts), stack(texts)
    use_fgs, ts, keys = stack(use_fgs), stack(ts), stack(keys)

    mesh = trainer.mesh
    if mesh is not None and "scene" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from customnerf_tpu.parallel.mesh import pad_to_multiple

        sh_scene = NamedSharding(mesh, P("scene"))
        data_ax = "data" if "data" in mesh.axis_names else None
        sh_rays = NamedSharding(mesh, P("scene", data_ax))
        rep = NamedSharding(mesh, P())
        params_s = jax.device_put(params_s, sh_scene)
        opt_state_s = jax.device_put(opt_state_s, sh_scene)
        if occ_s is not None:
            occ_s = jax.device_put(occ_s, sh_scene)
        if data_ax is not None:
            # edge-pad the ray axis so the data shard divides evenly (zero
            # rays would NaN the gradients — see editing_step)
            mult = mesh.shape[data_ax]
            rays_o, _ = pad_to_multiple(rays_o, mult, axis=1, mode="edge")
            rays_d, _ = pad_to_multiple(rays_d, mult, axis=1, mode="edge")
        rays_o = jax.device_put(rays_o, sh_rays)
        rays_d = jax.device_put(rays_d, sh_rays)
        bgs, pts, texts = (jax.device_put(x, sh_scene) for x in (bgs, pts, texts))
        use_fgs, ts, keys = (jax.device_put(x, sh_scene)
                             for x in (use_fgs, ts, keys))
        guid_vae = jax.device_put(trainer.guidance.vae_params, rep)
        guid_unet = jax.device_put(trainer.guidance.unet_params, rep)
    else:
        guid_vae = trainer.guidance.vae_params
        guid_unet = trainer.guidance.unet_params

    occ = occ_s if occ_s is not None else trainer.occ_state
    latents = prog_a(params_s, guid_vae, occ, rays_o, rays_d, bgs, use_fgs,
                     keys)
    cotangent, loss_sds = prog_b(guid_unet, latents, texts, ts, keys)
    params_s, opt_state_s, losses, aux = prog_c(
        params_s, opt_state_s, guid_vae, occ, rays_o, rays_d, bgs, pts,
        cotangent, use_fgs, keys)
    return params_s, opt_state_s, losses, dict(aux, loss_sds=loss_sds)
