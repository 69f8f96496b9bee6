"""SD-stack self-consistency (round-2 VERDICT #10): with diffusers absent and
no checkpoint on disk, narrow the untested surface with independent oracles —
timestep-embedding goldens vs the published sinusoid spec, attention vs a
straightforward per-head einsum reference, GEGLU's exact-erf gelu, the
norm-epsilon audit vs the diffusers configs, and the scaled-linear beta
schedule vs its closed form.  (The remaining untestable surface — ε-prediction
vs diffusers' UNet forward — is documented in docs/PARITY.md deviation 3.)
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from customnerf_tpu.guidance.scheduler import DDPMSchedule
from customnerf_tpu.guidance.unet import (CrossAttention, FeedForwardGEGLU,
                                          UNetConfig, timestep_embedding)


def test_timestep_embedding_matches_sinusoid_spec():
    """diffusers Timesteps(flip_sin_to_cos=True, freq_shift=0):
    freqs = exp(-ln(1e4)·i/half), output = [cos(t·f) | sin(t·f)]."""
    for t, dim in ((981.0, 320), (1.0, 8), (0.0, 16), (500.0, 64)):
        got = np.asarray(timestep_embedding(jnp.asarray([t]), dim))[0]
        half = dim // 2
        freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
        want = np.concatenate([np.cos(t * freqs), np.sin(t * freqs)])
        # fp32 trig at args up to ~1000 carries ~1e-4 absolute error
        np.testing.assert_allclose(got, want.astype(np.float32), atol=2e-4)

    # hard-coded goldens (t=981, dim=320 — the classic SDS late timestep),
    # precomputed from the spec so a drift in BOTH implementations above
    # cannot silently cancel
    e = np.asarray(timestep_embedding(jnp.asarray([981.0]), 320))[0]
    np.testing.assert_allclose(
        [e[0], e[1], e[160], e[161], e[319]],
        [0.6799571881624918, -0.7984300344100692, 0.733251813680783,
         0.6020876017258084, 0.10372588527788981], atol=2e-4)
    e2 = np.asarray(timestep_embedding(jnp.asarray([1.0]), 8))[0]
    np.testing.assert_allclose(
        e2, [0.54030231, 0.99500417, 0.99995, 0.9999995,
             0.84147098, 0.09983342, 0.00999983, 0.001], atol=1e-5)


def test_cross_attention_matches_per_head_reference():
    """The fused-einsum attention must equal an explicit per-head loop:
    softmax(q_h k_hᵀ / √d) v_h per head, concat, out-project."""
    heads, dim_head, C, D = 4, 8, 32, 16
    attn = CrossAttention(query_dim=C, heads=heads, dim_head=dim_head,
                          context_dim=D)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 10, C))
    ctx = jax.random.normal(jax.random.fold_in(key, 2), (2, 7, D))
    params = attn.init(key, x, ctx)
    got = np.asarray(attn.apply(params, x, ctx))

    p = params["params"]
    q = x @ p["to_q"]["kernel"]
    k = ctx @ p["to_k"]["kernel"]
    v = ctx @ p["to_v"]["kernel"]
    outs = []
    for h in range(heads):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        qh, kh, vh = np.asarray(q)[..., sl], np.asarray(k)[..., sl], \
            np.asarray(v)[..., sl]
        logits = qh @ kh.transpose(0, 2, 1) / np.sqrt(dim_head)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        outs.append(w @ vh)
    ref = np.concatenate(outs, axis=-1)
    ref = ref @ np.asarray(p["to_out_0"]["kernel"]) + \
        np.asarray(p["to_out_0"]["bias"])
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_geglu_uses_exact_erf_gelu():
    """diffusers GEGLU applies torch F.gelu (exact erf), not the tanh
    approximation; the two differ by up to ~3e-3 per activation."""
    from scipy.special import erf

    ff = FeedForwardGEGLU(dim=8)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 3, 8))
    params = ff.init(key, x)
    got = np.asarray(ff.apply(params, x))

    p = params["params"]
    h = np.asarray(x) @ np.asarray(p["net_0_proj"]["kernel"]) + \
        np.asarray(p["net_0_proj"]["bias"])
    a, gate = np.split(h, 2, axis=-1)
    gelu_exact = gate * 0.5 * (1.0 + erf(gate / np.sqrt(2.0)))
    ref = (a * gelu_exact) @ np.asarray(p["net_2"]["kernel"]) + \
        np.asarray(p["net_2"]["bias"])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_norm_epsilons_match_diffusers_configs():
    """Audit the ε constants against the diffusers module defaults the SD
    checkpoints were trained with: UNet resnet/outer GroupNorm 1e-5,
    transformer inner GroupNorm 1e-6, LayerNorms 1e-5, VAE GroupNorms 1e-6.
    Read from the SOURCE so a silent epsilon edit fails here."""
    import inspect

    import customnerf_tpu.guidance.unet as unet_mod
    import customnerf_tpu.guidance.vae as vae_mod

    unet_src = inspect.getsource(unet_mod)
    vae_src = inspect.getsource(vae_mod)

    import re
    res_src = inspect.getsource(unet_mod.ResnetBlock)
    assert res_src.count("epsilon=1e-5") == 2
    t2d_src = inspect.getsource(unet_mod.Transformer2D)
    assert 'epsilon=1e-6, name="norm"' in t2d_src
    btb_src = inspect.getsource(unet_mod.BasicTransformerBlock)
    assert btb_src.count("epsilon=1e-5") == 3          # the 3 LayerNorms
    assert 'epsilon=1e-5, name="conv_norm_out"' in unet_src
    # VAE: every GroupNorm at 1e-6
    vae_groupnorms = re.findall(r"GroupNorm\([^)]*epsilon=([0-9e.-]+)",
                                vae_src)
    assert vae_groupnorms and all(e == "1e-6" for e in vae_groupnorms)


def test_scaled_linear_beta_schedule_closed_form():
    """SD's scaled_linear schedule: betas = linspace(√.00085, √.012, 1000)²,
    ᾱ_t = Π(1−β).  Check endpoints and a literal mid value."""
    s = DDPMSchedule()
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    ac = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), ac, rtol=1e-5)
    assert abs(float(s.alphas_cumprod[0]) - (1 - 0.00085)) < 1e-7
    # add_noise is √ᾱ·x + √(1−ᾱ)·ε
    x = jnp.ones((1, 2, 2, 1))
    n = jnp.full((1, 2, 2, 1), 2.0)
    t = jnp.asarray(500)
    got = np.asarray(s.add_noise(x, n, t))
    a = ac[500]
    np.testing.assert_allclose(got, np.sqrt(a) + 2 * np.sqrt(1 - a),
                               rtol=1e-5)


def test_unet_heads_divide_channels():
    """Every supported head layout divides its block channels exactly —
    a misconfigured head count would silently truncate dim_head."""
    for cfg in (UNetConfig(),                              # SD 1.5
                UNetConfig(cross_attention_dim=1024,
                           attention_head_dim=(5, 10, 20, 20))):  # SD 2.x
        for lvl, ch in enumerate(cfg.block_out_channels):
            assert ch % cfg.heads_at(lvl) == 0
