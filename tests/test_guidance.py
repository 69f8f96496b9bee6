"""Guidance stack: UNet/VAE shapes, DDPM schedule, SDS gradient identity,
tokenizer determinism, Custom Diffusion artifact roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from customnerf_tpu.guidance.scheduler import DDPMSchedule
from customnerf_tpu.guidance.unet import UNet2DCondition, UNetConfig, timestep_embedding
from customnerf_tpu.guidance.vae import AutoencoderKL, VAEConfig

TINY_UNET = UNetConfig(block_out_channels=(32, 64, 64, 64), layers_per_block=1,
                       cross_attention_dim=64, attention_head_dim=4,
                       norm_num_groups=8)
TINY_VAE = VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1,
                     norm_num_groups=8)


@pytest.fixture(scope="module")
def unet():
    model = UNet2DCondition(TINY_UNET)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, 64))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    return model, params


@pytest.fixture(scope="module")
def vae():
    model = AutoencoderKL(TINY_VAE)
    imgs = jnp.zeros((1, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, imgs,
                        jax.random.PRNGKey(1))
    return model, params


def test_timestep_embedding_shape_and_range():
    emb = timestep_embedding(jnp.asarray([0, 10, 999]), 32)
    assert emb.shape == (3, 32)
    assert np.all(np.abs(np.asarray(emb)) <= 1.0 + 1e-6)
    # distinct timesteps give distinct embeddings
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[2]))


@pytest.mark.slow
def test_unet_shapes_and_determinism(unet):
    model, params = unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.asarray([10, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 64))
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    out2 = model.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_context_matters(unet):
    model, params = unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.asarray([100], jnp.int32)
    c1 = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 64))
    c2 = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 64))
    o1 = model.apply(params, x, t, c1)
    o2 = model.apply(params, x, t, c2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_unet_cd_kv_override_changes_output(unet):
    from customnerf_tpu.guidance.custom_diffusion import extract_cd_kv
    model, params = unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.asarray([100], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 64))

    # need the SD block-name table → build tiny-table manually from params
    table = {}
    p = params["params"]
    for name, sub in p.items():
        if "attn" in name and "transformer_blocks_0" in sub:
            attn2 = sub["transformer_blocks_0"]["attn2"]
            table[name] = {"to_k": jnp.asarray(attn2["to_k"]["kernel"]),
                           "to_v": jnp.asarray(attn2["to_v"]["kernel"])}
    assert table, "no cross-attn blocks found"

    base = model.apply(params, x, t, ctx, cd_kv=None)
    same = model.apply(params, x, t, ctx, cd_kv=table)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-5)

    perturbed = jax.tree_util.tree_map(lambda w: w + 0.1, table)
    diff = model.apply(params, x, t, ctx, cd_kv=perturbed)
    assert not np.allclose(np.asarray(base), np.asarray(diff), atol=1e-3)


def test_vae_encode_decode_shapes(vae):
    model, params = vae
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
    z = model.apply(params, imgs, jax.random.PRNGKey(2), method=model.encode)
    assert z.shape == (2, 4, 4, 4)  # 32/8
    rec = model.apply(params, z, method=model.decode)
    assert rec.shape == (2, 32, 32, 3)


def test_vae_posterior_sampling_uses_key(vae):
    model, params = vae
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    z1 = model.apply(params, imgs, jax.random.PRNGKey(2), method=model.encode)
    z2 = model.apply(params, imgs, jax.random.PRNGKey(3), method=model.encode)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_ddpm_schedule_matches_diffusers_formula():
    s = DDPMSchedule()
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    want = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), want, rtol=1e-5)
    # add_noise identity checks
    x = jnp.ones((1, 2, 2, 4))
    n = jnp.zeros_like(x)
    out = s.add_noise(x, n, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out),
                               np.sqrt(want[0]) * np.ones((1, 2, 2, 4)),
                               rtol=1e-5)


@pytest.mark.slow
def test_sds_gradient_identity():
    """dL/dlatents must equal w·(ε̂−ε)·λ (the defining SDS property;
    reference sd.py:145-152)."""
    from customnerf_tpu.config import Config
    from customnerf_tpu.guidance.sds import StableDiffusionGuidance

    opt = Config(data_type="synthetic", lambda_sd=0.01, cfg=7.5,
                 sd_version="1.5")
    g = StableDiffusionGuidance.__new__(StableDiffusionGuidance)
    g.opt = opt
    g.unet = UNet2DCondition(TINY_UNET)
    x = jnp.zeros((1, 8, 8, 4))
    g.unet_params = g.unet.init(jax.random.PRNGKey(0), x,
                                jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 7, 64)))
    g.cd_kv = None
    g.scheduler = DDPMSchedule()
    g.alphas = g.scheduler.alphas_cumprod

    loss_fn = g.sds_loss_fn()
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 64))
    t = jnp.int32(300)
    key = jax.random.PRNGKey(3)

    grad = jax.grad(
        lambda l: loss_fn(g.unet_params, l, text, t, key)[0])(latents)

    # recompute the expected grad by hand
    noise = jax.random.normal(key, latents.shape)
    noisy = g.scheduler.add_noise(latents, noise, t)
    latent_in = jnp.concatenate([noisy, noisy], axis=0)
    pred = g.unet.apply(g.unet_params, latent_in,
                        jnp.broadcast_to(t, (2,)), text)
    uncond, cond = jnp.split(pred, 2, axis=0)
    eps_hat = cond + opt.cfg * (cond - uncond)
    want = (1 - g.alphas[t]) * (eps_hat - noise) * opt.lambda_sd
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want),
                               rtol=1e-4, atol=1e-6)


def test_hash_tokenizer_deterministic_and_framed():
    from customnerf_tpu.guidance.text import BOS, EOS, HashTokenizer
    tok = HashTokenizer()
    a = tok(["a corgi in a forest"])
    b = tok(["a corgi in a forest"])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 77)
    assert a[0, 0] == BOS
    assert EOS in a[0]
    c = tok(["a bear statue"])
    assert not np.array_equal(a, c)
    # added tokens get fresh ids
    tid = tok.add_token("<new1>")
    assert tid >= 49408
    d = tok(["photo of a <new1> cat"])
    assert tid in d[0]


def test_cd_artifact_roundtrip(tmp_path):
    from customnerf_tpu.guidance.custom_diffusion import (
        _BLOCKS, load_cd_artifacts, save_cd_artifacts)

    rng = np.random.RandomState(0)
    cd_kv = {ours: {"to_k": jnp.asarray(rng.randn(16, 8).astype(np.float32)),
                    "to_v": jnp.asarray(rng.randn(16, 8).astype(np.float32))}
             for ours, _ in _BLOCKS}
    tok = {"<new1>": rng.randn(16).astype(np.float32)}
    save_cd_artifacts(str(tmp_path), cd_kv, tok)

    assert (tmp_path / "pytorch_custom_diffusion_weights.bin").exists()
    assert (tmp_path / "<new1>.bin").exists()

    loaded_kv, loaded_tok = load_cd_artifacts(str(tmp_path))
    for ours, _ in _BLOCKS:
        np.testing.assert_allclose(np.asarray(loaded_kv[ours]["to_k"]),
                                   np.asarray(cd_kv[ours]["to_k"]), rtol=1e-6)
    np.testing.assert_allclose(loaded_tok["<new1>"], tok["<new1>"], rtol=1e-6)


@pytest.mark.slow
def test_clip_scores(monkeypatch):
    """CLIP score + directional score machinery (paper Table-1 analog) on a
    tiny random-weight CLIP."""
    import customnerf_tpu.guidance.clip_view as cv
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

    def tiny_cfg():
        return CLIPConfig.from_text_vision_configs(
            CLIPTextConfig(vocab_size=49408, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, max_position_embeddings=77),
            CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=2,
                             image_size=224, patch_size=56),
            projection_dim=16,
        )

    monkeypatch.setattr(cv, "_vit_b32_config", tiny_cfg)
    m = cv.CLIPViewMatcher()
    imgs_a = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    imgs_b = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)

    s = cv.clip_score(m, imgs_a, "a corgi")
    assert -1.0 <= s <= 1.0
    d = cv.clip_directional_score(m, imgs_a, imgs_b, "a bear", "a corgi")
    assert -1.0 <= d <= 1.0
    # identical edits → direction degenerates; score of identical images ~0/1
    same = cv.clip_directional_score(m, imgs_a, imgs_a, "a bear", "a corgi")
    assert abs(same) < 1e-3
    # chunked embedding is exact (trainer --clip_metrics embeds test frames
    # in chunks of 8 to bound device memory)
    np.testing.assert_allclose(cv.clip_score(m, imgs_a, "a corgi", chunk=1),
                               s, rtol=0, atol=1e-4)
    np.testing.assert_allclose(
        cv.clip_directional_score(m, imgs_a, imgs_b, "a bear", "a corgi",
                                  chunk=1), d, rtol=0, atol=1e-4)


def test_specify_gradient_injects_cotangent():
    """``specify_gradient`` (reference SpecifyGradient, sd.py:13-26): forward
    is a constant 1, backward routes the precomputed grad into x scaled by
    the upstream cotangent."""
    import jax

    from customnerf_tpu.guidance.sds import specify_gradient

    x = jnp.arange(6.0).reshape(2, 3)
    gt = jnp.full((2, 3), 0.25)

    val, grad = jax.value_and_grad(
        lambda x_: 2.0 * specify_gradient(x_, gt))(x)
    assert float(val) == 2.0
    np.testing.assert_allclose(np.asarray(grad), 0.5 * np.ones((2, 3)),
                               rtol=1e-6)
