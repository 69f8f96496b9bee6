"""DDIM sampler: shape/finiteness/determinism with a tiny SD stack."""

import jax
import jax.numpy as jnp
import numpy as np

from customnerf_tpu.guidance.sampler import ddim_sample

import pytest

pytestmark = pytest.mark.slow  # multi-minute tier (see pyproject markers)


def test_ddim_sample_tiny():
    from tests.test_cd_training import tiny_sd  # fixture factory not needed
    # build the tiny stack inline (mirrors the fixture without pytest scoping)
    from customnerf_tpu.config import Config
    from customnerf_tpu.guidance.scheduler import DDPMSchedule
    from customnerf_tpu.guidance.sds import StableDiffusionGuidance
    from customnerf_tpu.guidance.text import TextEncoder
    from customnerf_tpu.guidance.unet import UNet2DCondition, UNetConfig
    from customnerf_tpu.guidance.vae import AutoencoderKL, VAEConfig

    g = StableDiffusionGuidance.__new__(StableDiffusionGuidance)
    g.opt = Config(data_type="synthetic")
    g.unet = UNet2DCondition(UNetConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        cross_attention_dim=768, attention_head_dim=4, norm_num_groups=8))
    g.vae = AutoencoderKL(VAEConfig(
        block_out_channels=(16, 16, 32, 32), layers_per_block=1,
        norm_num_groups=8))
    key = jax.random.PRNGKey(0)
    g.unet_params = g.unet.init(key, jnp.zeros((1, 8, 8, 4)),
                                jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 77, 768)))
    g.vae_params = g.vae.init({"params": key}, jnp.zeros((1, 64, 64, 3)), key)
    g.cd_kv = None
    g.scheduler = DDPMSchedule()
    g.alphas = g.scheduler.alphas_cumprod
    g.text_encoder = TextEncoder("1.5", weights_dir=None, seed=0)

    img = ddim_sample(g, "a red sphere", jax.random.PRNGKey(1), num_steps=4,
                      height=64, width=64)
    assert img.shape == (64, 64, 3)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a.min() >= 0.0 and a.max() <= 1.0

    img2 = ddim_sample(g, "a red sphere", jax.random.PRNGKey(1), num_steps=4,
                       height=64, width=64)
    np.testing.assert_allclose(a, np.asarray(img2), atol=1e-5)
