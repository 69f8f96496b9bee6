"""Custom Diffusion concept tuning (image-driven editing support).

Flax port of the reference's side pipeline
(``custom_diffusion/train_custom_diffusion.py``): fine-tune the SD UNet's
cross-attention K/V projections plus a ``<new1>`` modifier-token embedding on
a handful of concept images, with prior-preservation on class images
(masked MSE + prior MSE, ``train_custom_diffusion.py:1129-1147``), then emit
the exact artifact pair the NeRF editing stage consumes
(``pytorch_custom_diffusion_weights.bin`` + ``<new1>.bin`` — the names
``nerf/sd.py:56-59`` loads).

TPU-first differences: the trainable set is carved out of the frozen UNet as
an explicit ``cd_kv`` table (context_dim × inner per cross-attn block) that
the UNet consumes as an input — so the big UNet params stay frozen constants
in the jit and only the small K/V table + one token-embedding row get
gradients; one jitted step does noise→UNet→masked-MSE→adam.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# our block name ↔ diffusers attn-processor key prefix
_BLOCKS = (
    [(f"down_{i}_attn_{j}", f"down_blocks.{i}.attentions.{j}")
     for i in range(3) for j in range(2)]
    + [("mid_attn_0", "mid_block.attentions.0")]
    + [(f"up_{i}_attn_{j}", f"up_blocks.{i}.attentions.{j}")
       for i in range(1, 4) for j in range(3)]
)


def extract_cd_kv(unet_params, train_q_out: bool = False
                  ) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Pull the cross-attn (attn2) K/V kernels out of a UNet param tree as
    the trainable adapter table.  ``train_q_out`` adds the Q projection and
    the output projection (kernel + bias) — the reference's
    ``--freeze_model crossattn`` mode (train_custom_diffusion.py:904-946)."""
    p = unet_params["params"]
    table = {}
    for ours, _ in _BLOCKS:
        if ours not in p:  # smaller configs (fewer layers_per_block)
            continue
        attn2 = p[ours]["transformer_blocks_0"]["attn2"]
        entry = {"to_k": jnp.asarray(attn2["to_k"]["kernel"]),
                 "to_v": jnp.asarray(attn2["to_v"]["kernel"])}
        if train_q_out:
            entry["to_q"] = jnp.asarray(attn2["to_q"]["kernel"])
            entry["to_out"] = jnp.asarray(attn2["to_out_0"]["kernel"])
            entry["to_out_bias"] = jnp.asarray(attn2["to_out_0"]["bias"])
        table[ours] = entry
    return table


def save_cd_artifacts(out_dir: str, cd_kv, token_embeds: Dict[str, np.ndarray]):
    """Write the diffusers-compatible artifact pair."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    state = {}
    for ours, theirs in _BLOCKS:
        if ours not in cd_kv:
            continue
        prefix = f"{theirs}.transformer_blocks.0.attn2.processor"
        for kv in ("to_k", "to_v", "to_q"):
            if kv not in cd_kv[ours]:
                continue
            w = np.asarray(cd_kv[ours][kv]).T  # [I,O] → torch [O,I]
            state[f"{prefix}.{kv}_custom_diffusion.weight"] = \
                torch.from_numpy(w.copy())
        if "to_out" in cd_kv[ours]:  # diffusers to_out is a .0-indexed list
            w = np.asarray(cd_kv[ours]["to_out"]).T
            state[f"{prefix}.to_out_custom_diffusion.0.weight"] = \
                torch.from_numpy(w.copy())
            state[f"{prefix}.to_out_custom_diffusion.0.bias"] = \
                torch.from_numpy(np.asarray(cd_kv[ours]["to_out_bias"]).copy())
    torch.save(state, os.path.join(out_dir, "pytorch_custom_diffusion_weights.bin"))
    for tok, emb in token_embeds.items():
        torch.save({tok: torch.from_numpy(np.asarray(emb).copy())},
                   os.path.join(out_dir, f"{tok}.bin"))


def load_cd_artifacts(model_dir: str, text_encoder=None
                      ) -> Tuple[Optional[dict], Dict[str, np.ndarray]]:
    """Load the artifact pair; returns (cd_kv table, {token: embedding}).
    Registers modifier tokens on the text encoder when given."""
    import torch

    cd_kv = None
    wpath = os.path.join(model_dir, "pytorch_custom_diffusion_weights.bin")
    if os.path.exists(wpath):
        sd = torch.load(wpath, map_location="cpu", weights_only=True)
        cd_kv = {}
        for ours, theirs in _BLOCKS:
            prefix = f"{theirs}.transformer_blocks.0.attn2.processor"
            entry = {}
            for kv in ("to_k", "to_v", "to_q"):
                key = f"{prefix}.{kv}_custom_diffusion.weight"
                if key in sd:
                    entry[kv] = jnp.asarray(sd[key].float().numpy().T)
            key = f"{prefix}.to_out_custom_diffusion.0.weight"
            if key in sd:
                entry["to_out"] = jnp.asarray(sd[key].float().numpy().T)
                entry["to_out_bias"] = jnp.asarray(
                    sd[f"{prefix}.to_out_custom_diffusion.0.bias"]
                    .float().numpy())
            if entry:
                cd_kv[ours] = entry
        if not cd_kv:
            cd_kv = None

    token_embeds = {}
    for tpath in glob.glob(os.path.join(model_dir, "<*>.bin")):
        tok = os.path.basename(tpath)[:-4]
        data = torch.load(tpath, map_location="cpu", weights_only=True)
        for name, emb in data.items():
            emb = np.asarray(emb.float().numpy()).reshape(-1)
            token_embeds[name] = emb
            if text_encoder is not None:
                _register_token(text_encoder, name, emb)
    return cd_kv, token_embeds


def _register_token(text_encoder, token: str, embedding: np.ndarray):
    """Add a modifier token and install its embedding row."""
    from customnerf_tpu.guidance.text import HashTokenizer

    tok = text_encoder.tokenizer
    if isinstance(tok, HashTokenizer):
        token_id = tok.add_token(token)
    else:
        tok.add_tokens([token])
        token_id = tok.convert_tokens_to_ids(token)

    params = jax.tree_util.tree_map(lambda x: x, dict(text_encoder.params))
    emb_path = params
    for k in ("text_model", "embeddings", "token_embedding"):
        emb_path = emb_path[k]
    table = np.array(emb_path["embedding"])   # writable copy (np.asarray of a
    if token_id >= table.shape[0]:            # jax array is read-only)
        grown = np.zeros((token_id + 1, table.shape[1]), table.dtype)
        grown[: table.shape[0]] = table
        table = grown
        # rebuild the flax module with the grown vocab (shape-checked on apply)
        try:
            from transformers import FlaxCLIPTextModel
            cfg = text_encoder.model.config
            cfg.vocab_size = token_id + 1
            text_encoder.model = FlaxCLIPTextModel(cfg, _do_init=False)
        except Exception as e:
            print(f"[WARN] could not grow text model vocab: {e}")
    table[token_id] = embedding[: table.shape[1]]
    emb_path["embedding"] = jnp.asarray(table)
    text_encoder.params = params
    return token_id


# ------------------------------------------------------------------ dataset
def _load_image_square(path: str, size: int = 512) -> np.ndarray:
    import cv2

    img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    s = min(h, w)
    img = img[(h - s) // 2:(h + s) // 2, (w - s) // 2:(w + s) // 2]
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
    return img.astype(np.float32) / 127.5 - 1.0


class ConceptDataset:
    """Instance + class images with the reference's random-scale augmentation
    (scale <0.6 → "a far away photo"; >1.2 → "zoomed in photo"; valid-region
    masks at latent resolution — train_custom_diffusion.py:165-303)."""

    def __init__(self, instance_dir: str, instance_prompt: str,
                 class_dir: Optional[str] = None, class_prompt: str = "",
                 size: int = 512, seed: int = 0, hflip: bool = True):
        self.instance = sorted(
            p for p in glob.glob(os.path.join(instance_dir, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png")))
        if not self.instance:
            raise ValueError(f"no instance images in {instance_dir}")
        self.cls = sorted(
            p for p in glob.glob(os.path.join(class_dir, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png"))) if class_dir else []
        self.instance_prompt = instance_prompt
        self.class_prompt = class_prompt
        self.size = size
        self.hflip = hflip
        self.rng = np.random.RandomState(seed)

    def sample_instance(self):
        img = _load_image_square(self.rng.choice(self.instance), self.size)
        if self.hflip and self.rng.rand() < 0.5:
            img = img[:, ::-1].copy()
        scale = self.rng.uniform(0.4, 1.4)
        prompt = self.instance_prompt
        size = self.size
        canvas = np.zeros((size, size, 3), np.float32)
        mask = np.zeros((size // 8, size // 8, 1), np.float32)
        new = max(32, int(size * min(scale, 1.0)))
        import cv2
        scaled = cv2.resize(img, (new, new), interpolation=cv2.INTER_AREA)
        off = (size - new) // 2
        canvas[off:off + new, off:off + new] = scaled
        moff, mnew = off // 8, new // 8
        mask[moff:moff + mnew, moff:moff + mnew] = 1.0
        if scale < 0.6:
            prompt = f"a far away photo of {self.instance_prompt}"
        elif scale > 1.2:
            prompt = f"zoomed in photo of a {self.instance_prompt}"
            canvas = img  # keep full frame for zoom-in
            mask[:] = 1.0
        return canvas, mask, prompt

    def sample_class(self):
        img = _load_image_square(self.rng.choice(self.cls), self.size)
        mask = np.ones((self.size // 8, self.size // 8, 1), np.float32)
        return img, mask, self.class_prompt


# -------------------------------------------------------- state save/resume
def _save_cd_state(output_dir: str, step: int, trainable, opt_state,
                   data_rng_state=None):
    """Mid-run state dir (the reference's accelerate ``save_state``
    checkpoint-{step} layout, train_custom_diffusion.py:1060-1083).
    ``data_rng_state`` captures the dataset sampler's RandomState so a
    resumed run continues the exact augmentation/sampling sequence (the
    jax key and timestep rng are replayed arithmetically instead — their
    per-step consumption is fixed; the dataset's is data-dependent)."""
    import pickle

    d = os.path.join(output_dir, f"checkpoint-{step}")
    os.makedirs(d, exist_ok=True)
    leaves_t, tdef_t = jax.tree_util.tree_flatten(trainable)
    leaves_o, tdef_o = jax.tree_util.tree_flatten(opt_state)
    with open(os.path.join(d, "state.pkl"), "wb") as f:
        pickle.dump({"step": step,
                     "trainable_leaves": [np.asarray(l) for l in leaves_t],
                     "trainable_treedef": pickle.dumps(tdef_t),
                     "opt_leaves": [np.asarray(l) for l in leaves_o],
                     "opt_treedef": pickle.dumps(tdef_o),
                     "data_rng_state": data_rng_state}, f)
    return d


def _load_cd_state(path: str):
    import pickle

    with open(os.path.join(path, "state.pkl"), "rb") as f:
        st = pickle.load(f)
    trainable = jax.tree_util.tree_unflatten(
        pickle.loads(st["trainable_treedef"]),
        [jnp.asarray(l) for l in st["trainable_leaves"]])
    opt_state = jax.tree_util.tree_unflatten(
        pickle.loads(st["opt_treedef"]),
        [jnp.asarray(l) for l in st["opt_leaves"]])
    return st["step"], trainable, opt_state, st.get("data_rng_state")


def _latest_cd_checkpoint(output_dir: str) -> Optional[str]:
    dirs = [d for d in glob.glob(os.path.join(output_dir, "checkpoint-*"))
            if os.path.isdir(d)]
    if not dirs:
        return None
    return max(dirs, key=lambda d: int(d.rsplit("-", 1)[1]))


# ----------------------------------------------------------------- trainer
def train_custom_diffusion(
    opt,
    instance_dir: str,
    instance_prompt: str,
    output_dir: str,
    class_dir: Optional[str] = None,
    class_prompt: str = "",
    modifier_token: str = "<new1>",
    initializer_token: str = "ktn",
    steps: int = 250,
    lr: float = 1e-5,
    prior_loss_weight: float = 1.0,
    image_size: int = 512,
    batch_size: int = 2,
    grad_accum: int = 1,
    freeze_model: str = "crossattn_kv",
    checkpointing_steps: int = 250,
    resume_from_checkpoint: Optional[str] = None,
    validation_prompt: Optional[str] = None,
    validation_steps: int = 50,
    num_validation_images: int = 2,
):
    """Tune K/V adapters + the modifier-token row; save artifacts.

    Reference-parity features (train_custom_diffusion.py):
      * ``batch_size`` instance images per optimizer step, each paired with a
        class image under prior preservation (bs 2 in tuning.sh:8-24);
      * ``grad_accum`` micro-steps per optimizer update (optax.MultiSteps —
        the accelerate gradient_accumulation_steps analog);
      * ``freeze_model``: "crossattn_kv" trains K/V only, "crossattn" also
        trains Q and the out projection (ref :904-946);
      * ``checkpointing_steps`` / ``resume_from_checkpoint`` ("latest" or a
        checkpoint-N dir) — mid-run save_state/resume (ref :1060-1083);
      * ``validation_prompt`` — periodic DDIM sample grid with the current
        adapters + token row (ref :1215-1329).
    """
    import optax
    from customnerf_tpu.guidance.sds import StableDiffusionGuidance

    assert freeze_model in ("crossattn_kv", "crossattn"), freeze_model
    guidance = StableDiffusionGuidance(opt)
    te = guidance.text_encoder

    # register <new1>, init from the initializer token's embedding
    init_ids = te.tokenize([initializer_token])[0]
    init_id = int(init_ids[1])  # token after BOS
    emb_table = np.asarray(
        te.params["text_model"]["embeddings"]["token_embedding"]["embedding"])
    token_id = _register_token(te, modifier_token,
                               emb_table[min(init_id, emb_table.shape[0] - 1)])

    cd_kv = extract_cd_kv(guidance.unet_params,
                          train_q_out=(freeze_model == "crossattn"))
    tok_row = jnp.asarray(np.asarray(
        te.params["text_model"]["embeddings"]["token_embedding"]["embedding"]
    )[token_id])
    trainable = {"cd_kv": cd_kv, "tok_row": tok_row}

    ds = ConceptDataset(instance_dir, f"photo of a {modifier_token} "
                        f"{instance_prompt}", class_dir, class_prompt,
                        size=image_size, seed=opt.seed)
    use_prior = bool(ds.cls)

    scheduler = guidance.scheduler
    unet, unet_params = guidance.unet, guidance.unet_params
    encode = guidance.encode_imgs_fn()

    te_params = jax.tree_util.tree_map(jnp.asarray, dict(te.params))

    def embed_with_row(ids, row):
        """Text-encode with the trainable modifier row installed functionally
        (differentiable in `row` — the textual-inversion gradient path;
        the reference zeroes all other rows' grads, we never compute them:
        train_custom_diffusion.py:1149-1164 semantics by construction)."""
        params = jax.tree_util.tree_map(lambda x: x, te_params)
        tbl = params["text_model"]["embeddings"]["token_embedding"]["embedding"]
        tbl = jnp.asarray(tbl).at[token_id].set(row)
        params["text_model"]["embeddings"]["token_embedding"]["embedding"] = tbl
        return te.model(input_ids=ids, params=params).last_hidden_state

    base_tx = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=1e-2)
    tx = (optax.MultiSteps(base_tx, every_k_schedule=grad_accum)
          if grad_accum > 1 else base_tx)
    opt_state = tx.init(trainable)

    def loss_fn(trainable, latents, ids, mask_lat, t, key,
                latents_pr, ctx_pr, t_pr):
        # latents/ids/mask_lat/t carry a leading batch axis [B, ...]
        ctx = embed_with_row(ids, trainable["tok_row"])
        noise = jax.random.normal(key, latents.shape)
        noisy = scheduler.add_noise(latents, noise, t)
        pred = unet.apply(unet_params, noisy, t, ctx,
                          cd_kv=trainable["cd_kv"])
        loss = jnp.sum(((pred - noise) ** 2) * mask_lat) / (
            jnp.sum(mask_lat) * latents.shape[-1] + 1e-8)
        if latents_pr is not None:
            noise2 = jax.random.normal(jax.random.fold_in(key, 1),
                                       latents_pr.shape)
            noisy2 = scheduler.add_noise(latents_pr, noise2, t_pr)
            pred2 = unet.apply(unet_params, noisy2, t_pr, ctx_pr,
                               cd_kv=trainable["cd_kv"])
            loss = loss + prior_loss_weight * jnp.mean((pred2 - noise2) ** 2)
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn), static_argnames=())

    start_step = 0
    if resume_from_checkpoint:
        path = (resume_from_checkpoint if resume_from_checkpoint != "latest"
                else _latest_cd_checkpoint(output_dir))
        if path and os.path.isdir(str(path)):
            start_step, trainable, opt_state, data_rng = \
                _load_cd_state(str(path))
            if data_rng is not None:
                ds.rng.set_state(data_rng)
            print(f"[cd-tune] resumed from {path} at step {start_step}")
        else:
            print(f"[cd-tune] checkpoint '{resume_from_checkpoint}' not "
                  "found; starting fresh")

    key = jax.random.PRNGKey(opt.seed)
    rng = np.random.RandomState(opt.seed)
    # replay the RNG streams consumed by completed steps so a resumed run
    # continues the exact sequence a straight-through run would produce
    for _ in range(start_step * max(grad_accum, 1)):
        key, *_ = jax.random.split(key, 4)
        rng.randint(0, scheduler.num_train_timesteps, size=2 * batch_size)

    B = batch_size
    micro_per_step = max(grad_accum, 1)
    step_i = start_step
    while step_i < steps:
        for _micro in range(micro_per_step):
            key, k_vae, k_noise, k_vae2 = jax.random.split(key, 4)
            ts_draw = rng.randint(0, scheduler.num_train_timesteps,
                                  size=2 * B)
            imgs, masks, prompts = zip(*(ds.sample_instance()
                                         for _ in range(B)))
            latents = encode(guidance.vae_params,
                             jnp.asarray((np.stack(imgs) + 1) / 2), k_vae)
            ids = jnp.asarray(te.tokenize(list(prompts)))
            t = jnp.asarray(ts_draw[:B], jnp.int32)

            if use_prior:
                imgs2, _, prompts2 = zip(*(ds.sample_class()
                                           for _ in range(B)))
                latents_pr = encode(guidance.vae_params,
                                    jnp.asarray((np.stack(imgs2) + 1) / 2),
                                    k_vae2)
                ctx_pr = te.encode(list(prompts2))
                t_pr = jnp.asarray(ts_draw[B:], jnp.int32)
            else:
                latents_pr, ctx_pr = None, None
                t_pr = jnp.zeros((B,), jnp.int32)

            mask_lat = jnp.asarray(np.stack(masks))
            loss, grads = grad_fn(trainable, latents, ids, mask_lat, t,
                                  k_noise, latents_pr, ctx_pr, t_pr)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
        step_i += 1
        if (step_i - start_step) % 50 == 1 or step_i % 50 == 0:
            print(f"[cd-tune] step {step_i} loss {float(loss):.4f}")
        if checkpointing_steps and step_i % checkpointing_steps == 0 \
                and step_i < steps:
            _save_cd_state(output_dir, step_i, trainable, opt_state,
                           data_rng_state=ds.rng.get_state())
        if validation_prompt and step_i % validation_steps == 0:
            _cd_validation(guidance, te_params, trainable, token_id,
                           validation_prompt, num_validation_images,
                           output_dir, step_i, image_size)

    save_cd_artifacts(output_dir, trainable["cd_kv"],
                      {modifier_token: np.asarray(trainable["tok_row"])})
    print(f"[cd-tune] saved artifacts to {output_dir}")
    return output_dir


def _cd_validation(guidance, te_params, trainable, token_id, prompt: str,
                   n_images: int, output_dir: str, step: int,
                   image_size: int):
    """Periodic sample grid with the current adapters + token row
    (reference train_custom_diffusion.py:1215-1329 log_validation)."""
    import cv2

    from customnerf_tpu.guidance.sampler import ddim_sample

    te = guidance.text_encoder
    saved_params, saved_kv = te.params, guidance.cd_kv
    params = jax.tree_util.tree_map(lambda x: x, dict(te_params))
    tbl = params["text_model"]["embeddings"]["token_embedding"]["embedding"]
    params["text_model"]["embeddings"]["token_embedding"]["embedding"] = \
        jnp.asarray(tbl).at[token_id].set(trainable["tok_row"])
    te.params = params
    guidance.cd_kv = trainable["cd_kv"]
    try:
        vd = os.path.join(output_dir, "validation")
        os.makedirs(vd, exist_ok=True)
        for i in range(n_images):
            img = ddim_sample(guidance, prompt, jax.random.PRNGKey(step + i),
                              num_steps=25, height=image_size,
                              width=image_size)
            cv2.imwrite(os.path.join(vd, f"step{step:05d}_{i}.png"),
                        cv2.cvtColor((np.asarray(img) * 255).astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
        print(f"[cd-tune] wrote {n_images} validation samples at step {step}")
    finally:
        te.params, guidance.cd_kv = saved_params, saved_kv


# --------------------------------------------------------------- merging
def merge_concepts(concept_dirs, base_kv, reg_embeddings, concept_embeddings,
                   steps: int = 200, lr: float = 1e-2):
    """Optimization-based multi-concept K/V merge.

    Working equivalent of the reference's (broken, ldm-dependent)
    ``custom_diffusion/composenW.py``: find one K/V table W that (a) matches
    each concept's table on that concept's text embeddings and (b) stays
    close to the base table on regularization embeddings:

        min_W  Σ_i ‖(W − W_i)ᵀ c_i‖² + ‖(W − W_base)ᵀ C_reg‖²

    Args:
      concept_dirs: list of artifact dirs (each from train_custom_diffusion).
      base_kv: the pretrained UNet's K/V table (extract_cd_kv).
      reg_embeddings: [R, D] regularization text embeddings.
      concept_embeddings: list of [C_i, D] per-concept prompt embeddings.

    Returns the merged cd_kv table.
    """
    import jax
    import optax

    tables = []
    for d in concept_dirs:
        kv, _ = load_cd_artifacts(d)
        if kv is None:
            raise ValueError(f"no adapter weights in {d}")
        tables.append(kv)

    merged = jax.tree_util.tree_map(lambda x: jnp.asarray(x), base_kv)
    reg = jnp.asarray(reg_embeddings)
    cons = [jnp.asarray(c) for c in concept_embeddings]

    def loss_fn(W):
        loss = 0.0
        for name in base_kv:
            for kv_name in ("to_k", "to_v"):
                w = W[name][kv_name]
                loss = loss + jnp.mean((reg @ (w - base_kv[name][kv_name])) ** 2)
                for tbl, c in zip(tables, cons):
                    if name in tbl and kv_name in tbl[name]:
                        loss = loss + jnp.mean(
                            (c @ (w - tbl[name][kv_name])) ** 2) * 10.0
        return loss

    tx = optax.adam(lr)
    state = tx.init(merged)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(steps):
        loss, g = grad_fn(merged)
        updates, state = tx.update(g, state)
        merged = optax.apply_updates(merged, updates)
    return merged
