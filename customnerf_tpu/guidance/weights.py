"""torch (diffusers-layout) → Flax weight conversion for the SD stack.

The reference obtains SD weights with ``DiffusionPipeline.from_pretrained``
(``nerf/sd.py:54``).  Here a *local* diffusers-format directory
(``--sd_weights``, containing ``unet/diffusion_pytorch_model.bin``,
``vae/diffusion_pytorch_model.bin``, ``text_encoder/pytorch_model.bin``,
``tokenizer/``) is converted into our Flax module trees:

  * torch conv [O,I,kh,kw]  → flax [kh,kw,I,O]
  * torch linear [O,I]      → flax [I,O]
  * {Group,Layer}Norm weight/bias → scale/bias
  * diffusers block paths (``down_blocks.0.resnets.1.conv1``) → our flat
    module names (``down_0_resnet_1 / conv1``); both the old VAE attention
    naming (query/key/value/proj_attn) and the new (to_q/…/to_out.0) load.

Missing files degrade gracefully: whatever sub-model has no weights keeps
its random init, with a warning.
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np


def _load_torch_state(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        try:
            from safetensors.torch import load_file
            sd = load_file(path)
        except ImportError as e:
            raise RuntimeError("safetensors not available; provide .bin") from e
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def _find_weights(dirpath: str, *names):
    for n in names:
        p = os.path.join(dirpath, n)
        if os.path.exists(p):
            return p
    return None


def _conv(w):
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _dense(w):
    return jnp.asarray(np.transpose(w))


def _set(tree: dict, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    assert node[parts[-1]].shape == value.shape, (
        f"{path}: {node[parts[-1]].shape} vs {value.shape}")
    node[parts[-1]] = value


# --------------------------------------------------------------------- UNet
def _map_attention(src, prefix, dst_prefix, assign):
    tb = f"{prefix}.transformer_blocks.0"
    dt = f"{dst_prefix}/transformer_blocks_0"
    for attn in ("attn1", "attn2"):
        for proj in ("to_q", "to_k", "to_v"):
            assign(f"{dt}/{attn}/{proj}/kernel", _dense(src[f"{tb}.{attn}.{proj}.weight"]))
        assign(f"{dt}/{attn}/to_out_0/kernel", _dense(src[f"{tb}.{attn}.to_out.0.weight"]))
        assign(f"{dt}/{attn}/to_out_0/bias", jnp.asarray(src[f"{tb}.{attn}.to_out.0.bias"]))
    for i in (1, 2, 3):
        assign(f"{dt}/norm{i}/scale", jnp.asarray(src[f"{tb}.norm{i}.weight"]))
        assign(f"{dt}/norm{i}/bias", jnp.asarray(src[f"{tb}.norm{i}.bias"]))
    assign(f"{dt}/ff/net_0_proj/kernel", _dense(src[f"{tb}.ff.net.0.proj.weight"]))
    assign(f"{dt}/ff/net_0_proj/bias", jnp.asarray(src[f"{tb}.ff.net.0.proj.bias"]))
    assign(f"{dt}/ff/net_2/kernel", _dense(src[f"{tb}.ff.net.2.weight"]))
    assign(f"{dt}/ff/net_2/bias", jnp.asarray(src[f"{tb}.ff.net.2.bias"]))
    # outer norm + projections (conv 1×1 in SD1.x)
    assign(f"{dst_prefix}/norm/scale", jnp.asarray(src[f"{prefix}.norm.weight"]))
    assign(f"{dst_prefix}/norm/bias", jnp.asarray(src[f"{prefix}.norm.bias"]))
    for proj in ("proj_in", "proj_out"):
        w = src[f"{prefix}.{proj}.weight"]
        if w.ndim == 4:
            assign(f"{dst_prefix}/{proj}/kernel", _conv(w))
        else:  # use_linear_projection variants store a linear
            assign(f"{dst_prefix}/{proj}/kernel", _dense(w)[None, None])
        assign(f"{dst_prefix}/{proj}/bias", jnp.asarray(src[f"{prefix}.{proj}.bias"]))


def _map_resnet(src, prefix, dst_prefix, assign, with_time=True):
    for norm in ("norm1", "norm2"):
        assign(f"{dst_prefix}/{norm}/scale", jnp.asarray(src[f"{prefix}.{norm}.weight"]))
        assign(f"{dst_prefix}/{norm}/bias", jnp.asarray(src[f"{prefix}.{norm}.bias"]))
    for conv in ("conv1", "conv2"):
        assign(f"{dst_prefix}/{conv}/kernel", _conv(src[f"{prefix}.{conv}.weight"]))
        assign(f"{dst_prefix}/{conv}/bias", jnp.asarray(src[f"{prefix}.{conv}.bias"]))
    if with_time and f"{prefix}.time_emb_proj.weight" in src:
        assign(f"{dst_prefix}/time_emb_proj/kernel", _dense(src[f"{prefix}.time_emb_proj.weight"]))
        assign(f"{dst_prefix}/time_emb_proj/bias", jnp.asarray(src[f"{prefix}.time_emb_proj.bias"]))
    if f"{prefix}.conv_shortcut.weight" in src:
        assign(f"{dst_prefix}/conv_shortcut/kernel", _conv(src[f"{prefix}.conv_shortcut.weight"]))
        assign(f"{dst_prefix}/conv_shortcut/bias", jnp.asarray(src[f"{prefix}.conv_shortcut.bias"]))


def convert_unet(src: Dict[str, np.ndarray], params: dict) -> dict:
    """diffusers-format UNet state_dict → our Flax param tree.

    Block structure (level/layer counts, which blocks carry attention or
    down/up-samplers) is inferred from the *target* param tree, so the same
    mapping serves the full SD 1.5 UNet and the tiny test configs — the
    source naming schema is diffusers' (`down_blocks.N.resnets.M...`,
    reference consumes it via `nerf/sd.py:44-65`)."""
    import copy
    tree = copy.deepcopy(_mutable(params))
    p = tree["params"]

    def assign(path, value):
        _set(tree["params"], path, value)

    assign("conv_in/kernel", _conv(src["conv_in.weight"]))
    assign("conv_in/bias", jnp.asarray(src["conv_in.bias"]))
    for i in (1, 2):
        assign(f"time_embedding/linear_{i}/kernel",
               _dense(src[f"time_embedding.linear_{i}.weight"]))
        assign(f"time_embedding/linear_{i}/bias",
               jnp.asarray(src[f"time_embedding.linear_{i}.bias"]))

    n_levels = len({k for k in p if k.startswith("down_")
                    and k.endswith("_resnet_0")})
    layers = len({k for k in p if k.startswith("down_0_resnet_")})
    for i in range(n_levels):
        for j in range(layers):
            _map_resnet(src, f"down_blocks.{i}.resnets.{j}",
                        f"down_{i}_resnet_{j}", assign)
            if f"down_{i}_attn_{j}" in p:
                _map_attention(src, f"down_blocks.{i}.attentions.{j}",
                               f"down_{i}_attn_{j}", assign)
        if f"down_{i}_downsample" in p:
            assign(f"down_{i}_downsample/conv/kernel",
                   _conv(src[f"down_blocks.{i}.downsamplers.0.conv.weight"]))
            assign(f"down_{i}_downsample/conv/bias",
                   jnp.asarray(src[f"down_blocks.{i}.downsamplers.0.conv.bias"]))

    _map_resnet(src, "mid_block.resnets.0", "mid_resnet_0", assign)
    _map_resnet(src, "mid_block.resnets.1", "mid_resnet_1", assign)
    _map_attention(src, "mid_block.attentions.0", "mid_attn_0", assign)

    for i in range(n_levels):
        for j in range(layers + 1):
            _map_resnet(src, f"up_blocks.{i}.resnets.{j}",
                        f"up_{i}_resnet_{j}", assign)
            if f"up_{i}_attn_{j}" in p:
                _map_attention(src, f"up_blocks.{i}.attentions.{j}",
                               f"up_{i}_attn_{j}", assign)
        if f"up_{i}_upsample" in p:
            assign(f"up_{i}_upsample/conv/kernel",
                   _conv(src[f"up_blocks.{i}.upsamplers.0.conv.weight"]))
            assign(f"up_{i}_upsample/conv/bias",
                   jnp.asarray(src[f"up_blocks.{i}.upsamplers.0.conv.bias"]))

    assign("conv_norm_out/scale", jnp.asarray(src["conv_norm_out.weight"]))
    assign("conv_norm_out/bias", jnp.asarray(src["conv_norm_out.bias"]))
    assign("conv_out/kernel", _conv(src["conv_out.weight"]))
    assign("conv_out/bias", jnp.asarray(src["conv_out.bias"]))
    return tree


# ---------------------------------------------------------------------- VAE
def _vae_attn_names(src, prefix):
    if f"{prefix}.to_q.weight" in src:
        return {"q": "to_q", "k": "to_k", "v": "to_v", "o": "to_out.0"}
    return {"q": "query", "k": "key", "v": "value", "o": "proj_attn"}


def _map_vae_attn(src, prefix, dst_prefix, assign):
    names = _vae_attn_names(src, prefix)
    assign(f"{dst_prefix}/group_norm/scale", jnp.asarray(src[f"{prefix}.group_norm.weight"]))
    assign(f"{dst_prefix}/group_norm/bias", jnp.asarray(src[f"{prefix}.group_norm.bias"]))
    for ours, theirs in (("to_q", names["q"]), ("to_k", names["k"]),
                         ("to_v", names["v"]), ("to_out_0", names["o"])):
        w = src[f"{prefix}.{theirs}.weight"]
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        assign(f"{dst_prefix}/{ours}/kernel", _dense(w))
        assign(f"{dst_prefix}/{ours}/bias", jnp.asarray(src[f"{prefix}.{theirs}.bias"]))


def convert_vae(src: Dict[str, np.ndarray], params: dict) -> dict:
    """diffusers-format VAE state_dict → our Flax param tree (block counts
    inferred from the target tree, cf. convert_unet)."""
    import copy
    tree = copy.deepcopy(_mutable(params))

    def assign(path, value):
        _set(tree["params"], path, value)

    for side, n_res in (("encoder", 2), ("decoder", 3)):
        sp = tree["params"][side]
        blk = "down" if side == "encoder" else "up"
        blocks = len({k for k in sp if k.startswith(f"{blk}_")
                      and k.endswith("_resnet_0")})
        n_res = len({k for k in sp if k.startswith(f"{blk}_0_resnet_")})
        assign(f"{side}/conv_in/kernel", _conv(src[f"{side}.conv_in.weight"]))
        assign(f"{side}/conv_in/bias", jnp.asarray(src[f"{side}.conv_in.bias"]))
        for i in range(blocks):
            dif_block = f"{side}.down_blocks.{i}" if side == "encoder" else f"{side}.up_blocks.{i}"
            our_block = f"down_{i}" if side == "encoder" else f"up_{i}"
            for j in range(n_res):
                _map_resnet(src, f"{dif_block}.resnets.{j}",
                            f"{side}/{our_block}_resnet_{j}", assign,
                            with_time=False)
            if side == "encoder" and f"{our_block}_downsample" in sp:
                assign(f"{side}/{our_block}_downsample/kernel",
                       _conv(src[f"{dif_block}.downsamplers.0.conv.weight"]))
                assign(f"{side}/{our_block}_downsample/bias",
                       jnp.asarray(src[f"{dif_block}.downsamplers.0.conv.bias"]))
            elif side == "decoder" and f"{our_block}_upsample" in sp:
                assign(f"{side}/{our_block}_upsample/kernel",
                       _conv(src[f"{dif_block}.upsamplers.0.conv.weight"]))
                assign(f"{side}/{our_block}_upsample/bias",
                       jnp.asarray(src[f"{dif_block}.upsamplers.0.conv.bias"]))
        for j in (0, 1):
            _map_resnet(src, f"{side}.mid_block.resnets.{j}",
                        f"{side}/mid_resnet_{j}", assign, with_time=False)
        _map_vae_attn(src, f"{side}.mid_block.attentions.0",
                      f"{side}/mid_attn_0", assign)
        assign(f"{side}/conv_norm_out/scale", jnp.asarray(src[f"{side}.conv_norm_out.weight"]))
        assign(f"{side}/conv_norm_out/bias", jnp.asarray(src[f"{side}.conv_norm_out.bias"]))
        assign(f"{side}/conv_out/kernel", _conv(src[f"{side}.conv_out.weight"]))
        assign(f"{side}/conv_out/bias", jnp.asarray(src[f"{side}.conv_out.bias"]))

    for qc in ("quant_conv", "post_quant_conv"):
        assign(f"{qc}/kernel", _conv(src[f"{qc}.weight"]))
        assign(f"{qc}/bias", jnp.asarray(src[f"{qc}.bias"]))
    return tree


def _mutable(tree):
    if hasattr(tree, "unfreeze"):
        return tree.unfreeze()
    import jax
    return jax.tree_util.tree_map(lambda x: x, dict(tree))


def load_sd_weights(guidance, weights_dir: str):
    """Populate guidance.{unet_params, vae_params, text_encoder.params} from
    a local diffusers-format directory."""
    unet_path = _find_weights(os.path.join(weights_dir, "unet"),
                              "diffusion_pytorch_model.bin",
                              "diffusion_pytorch_model.safetensors")
    if unet_path:
        guidance.unet_params = convert_unet(_load_torch_state(unet_path),
                                            guidance.unet_params)
        print(f"[INFO] loaded UNet weights from {unet_path}")
    else:
        print(f"[WARN] no UNet weights under {weights_dir}/unet — random init.")

    vae_path = _find_weights(os.path.join(weights_dir, "vae"),
                             "diffusion_pytorch_model.bin",
                             "diffusion_pytorch_model.safetensors")
    if vae_path:
        guidance.vae_params = convert_vae(_load_torch_state(vae_path),
                                          guidance.vae_params)
        print(f"[INFO] loaded VAE weights from {vae_path}")
    else:
        print(f"[WARN] no VAE weights under {weights_dir}/vae — random init.")

    te_dir = os.path.join(weights_dir, "text_encoder")
    if os.path.isdir(te_dir):
        try:
            from transformers import FlaxCLIPTextModel
            model = FlaxCLIPTextModel.from_pretrained(te_dir, from_pt=True)
            guidance.text_encoder.model = model
            guidance.text_encoder.params = model.params
            print(f"[INFO] loaded text encoder from {te_dir}")
        except Exception as e:
            print(f"[WARN] text encoder load failed ({e}) — random init.")
