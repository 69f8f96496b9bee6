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


def extract_cd_kv(unet_params) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Pull the cross-attn (attn2) K/V kernels out of a UNet param tree as
    the trainable adapter table."""
    p = unet_params["params"]
    table = {}
    for ours, _ in _BLOCKS:
        if ours not in p:  # smaller configs (fewer layers_per_block)
            continue
        attn2 = p[ours]["transformer_blocks_0"]["attn2"]
        table[ours] = {"to_k": jnp.asarray(attn2["to_k"]["kernel"]),
                       "to_v": jnp.asarray(attn2["to_v"]["kernel"])}
    return table


def save_cd_artifacts(out_dir: str, cd_kv, token_embeds: Dict[str, np.ndarray]):
    """Write the diffusers-compatible artifact pair."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    state = {}
    for ours, theirs in _BLOCKS:
        if ours not in cd_kv:
            continue
        for kv in ("to_k", "to_v"):
            w = np.asarray(cd_kv[ours][kv]).T  # [I,O] → torch [O,I]
            state[f"{theirs}.transformer_blocks.0.attn2.processor."
                  f"{kv}_custom_diffusion.weight"] = torch.from_numpy(w.copy())
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
            entry = {}
            for kv in ("to_k", "to_v"):
                key = (f"{theirs}.transformer_blocks.0.attn2.processor."
                       f"{kv}_custom_diffusion.weight")
                if key in sd:
                    entry[kv] = jnp.asarray(sd[key].float().numpy().T)
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
    table = np.asarray(emb_path["embedding"])
    if token_id >= table.shape[0]:
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
):
    """Tune K/V adapters + the modifier-token row; save artifacts."""
    import optax
    from customnerf_tpu.guidance.sds import StableDiffusionGuidance
    from customnerf_tpu.guidance.text import HashTokenizer

    guidance = StableDiffusionGuidance(opt)
    te = guidance.text_encoder

    # register <new1>, init from the initializer token's embedding
    init_ids = te.tokenize([initializer_token])[0]
    init_id = int(init_ids[1])  # token after BOS
    emb_table = np.asarray(
        te.params["text_model"]["embeddings"]["token_embedding"]["embedding"])
    token_id = _register_token(te, modifier_token,
                               emb_table[min(init_id, emb_table.shape[0] - 1)])

    cd_kv = extract_cd_kv(guidance.unet_params)
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

    tx = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=1e-2)
    opt_state = tx.init(trainable)

    def loss_fn(trainable, latents, ids, mask_lat, t, key,
                latents_pr, ctx_pr, t_pr):
        ctx = embed_with_row(ids, trainable["tok_row"])
        noise = jax.random.normal(key, latents.shape)
        noisy = scheduler.add_noise(latents, noise, t)
        pred = unet.apply(unet_params, noisy, jnp.broadcast_to(t, (1,)), ctx,
                          cd_kv=trainable["cd_kv"])
        loss = jnp.sum(((pred - noise) ** 2) * mask_lat) / (
            jnp.sum(mask_lat) * latents.shape[-1] + 1e-8)
        if latents_pr is not None:
            noise2 = jax.random.normal(jax.random.fold_in(key, 1),
                                       latents_pr.shape)
            noisy2 = scheduler.add_noise(latents_pr, noise2, t_pr)
            pred2 = unet.apply(unet_params, noisy2,
                               jnp.broadcast_to(t_pr, (1,)), ctx_pr,
                               cd_kv=trainable["cd_kv"])
            loss = loss + prior_loss_weight * jnp.mean((pred2 - noise2) ** 2)
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn), static_argnames=())

    key = jax.random.PRNGKey(opt.seed)
    rng = np.random.RandomState(opt.seed)
    for step_i in range(steps):
        key, k_vae, k_noise, k_vae2 = jax.random.split(key, 4)
        img, mask, prompt = ds.sample_instance()
        latents = encode(guidance.vae_params,
                         jnp.asarray((img[None] + 1) / 2), k_vae)
        ids = jnp.asarray(te.tokenize([prompt]))
        t = jnp.int32(rng.randint(0, scheduler.num_train_timesteps))

        if use_prior:
            img2, _, prompt2 = ds.sample_class()
            latents_pr = encode(guidance.vae_params,
                                jnp.asarray((img2[None] + 1) / 2), k_vae2)
            ctx_pr = te.encode([prompt2])
            t_pr = jnp.int32(rng.randint(0, scheduler.num_train_timesteps))
        else:
            latents_pr, ctx_pr, t_pr = None, None, jnp.int32(0)

        mask_lat = jnp.asarray(mask[None])
        loss, grads = grad_fn(trainable, latents, ids, mask_lat, t, k_noise,
                              latents_pr, ctx_pr, t_pr)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        if step_i % 50 == 0:
            print(f"[cd-tune] step {step_i} loss {float(loss):.4f}")

    save_cd_artifacts(output_dir, trainable["cd_kv"],
                      {modifier_token: np.asarray(trainable["tok_row"])})
    print(f"[cd-tune] saved artifacts to {output_dir}")
    return output_dir


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
