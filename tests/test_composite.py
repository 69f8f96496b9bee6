"""Compositing + sample_pdf vs independent references (torch-CPU autograd
oracle for the cumprod composite, matching nerf/renderer.py:420-424 math)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from customnerf_tpu.ops.composite import (
    alphas_from_sigmas,
    sample_pdf,
    weights_from_alphas,
)


def torch_weights(sigmas, deltas):
    alphas = 1 - torch.exp(-deltas * sigmas)
    shifted = torch.cat(
        [torch.ones_like(alphas[..., :1]), 1 - alphas[..., :-1] + 1e-15], dim=-1
    )
    return alphas * torch.cumprod(shifted, dim=-1)


def test_weights_match_torch_forward_and_backward():
    rng = np.random.RandomState(0)
    sig = rng.rand(4, 16).astype(np.float32) * 3
    dlt = rng.rand(4, 16).astype(np.float32) * 0.1

    w_jax = weights_from_alphas(alphas_from_sigmas(jnp.asarray(sig), jnp.asarray(dlt)))

    ts = torch.tensor(sig, requires_grad=True)
    td = torch.tensor(dlt)
    w_t = torch_weights(ts, td)
    np.testing.assert_allclose(np.asarray(w_jax), w_t.detach().numpy(), rtol=1e-4, atol=1e-5)

    # backward parity on a scalar loss
    loss_t = (w_t ** 2).sum()
    loss_t.backward()

    def loss_j(s):
        w = weights_from_alphas(alphas_from_sigmas(s, jnp.asarray(dlt)))
        return jnp.sum(w ** 2)

    g_jax = jax.grad(loss_j)(jnp.asarray(sig))
    np.testing.assert_allclose(np.asarray(g_jax), ts.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_weights_sum_bounded():
    sig = jnp.ones((2, 32)) * 100.0
    dlt = jnp.ones((2, 32)) * 0.1
    w = weights_from_alphas(alphas_from_sigmas(sig, dlt))
    ws = jnp.sum(w, axis=-1)
    assert np.all(np.asarray(ws) <= 1.0 + 1e-5)


def test_sample_pdf_det_concentrates_on_peak():
    # weights peaked in the middle bin → deterministic samples cluster there
    bins = jnp.linspace(0.0, 1.0, 17)[None, :].repeat(2, axis=0)  # [2, 17]
    w = np.full((2, 16), 1e-3, dtype=np.float32)
    w[:, 8] = 10.0
    out = sample_pdf(jax.random.PRNGKey(0), bins, jnp.asarray(w), 32, det=True)
    mid = np.asarray(out)
    frac_near_peak = np.mean((mid > 0.45) & (mid < 0.65))
    assert frac_near_peak > 0.8


def test_sample_pdf_matches_torch_reference():
    """Against a literal torch port of renderer.py:21-55 (det mode)."""
    rng = np.random.RandomState(1)
    bins = np.sort(rng.rand(3, 9).astype(np.float32), axis=-1)
    weights = rng.rand(3, 8).astype(np.float32)
    n = 6

    got = np.asarray(
        sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights), n, det=True)
    )

    tb, tw = torch.tensor(bins), torch.tensor(weights) + 1e-5
    pdf = tw / tw.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.5 / n, 1 - 0.5 / n, steps=n).expand(3, n).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_g0 = torch.gather(cdf, 1, below)
    cdf_g1 = torch.gather(cdf, 1, above)
    bins_g0 = torch.gather(tb, 1, below)
    bins_g1 = torch.gather(tb, 1, above)
    denom = cdf_g1 - cdf_g0
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    want = (bins_g0 + t * (bins_g1 - bins_g0)).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_neus_sdf_helpers_match_torch_oracle():
    """NeuS Φ_s / sdf→α / sdf→w / α→w parity surface (reference
    renderer.py:56-111) vs an independent torch oracle.  The grid pipeline
    never trains an SDF, but the ops are exported — keep them honest."""
    from customnerf_tpu.ops.composite import (alpha_to_w, cdf_phi_s,
                                              sdf_to_alpha, sdf_to_w)

    rng = np.random.RandomState(3)
    sdf = rng.randn(5, 17).astype(np.float32) * 0.3
    s = 64.0

    t = torch.tensor(sdf)
    t_cdf = torch.sigmoid(t * s)
    t_alpha = torch.clamp_min(
        (t_cdf[..., :-1] - t_cdf[..., 1:]) / (t_cdf[..., :-1] + 1e-10), 0)
    shifted = torch.cat(
        [torch.ones_like(t_alpha[..., :1]), 1.0 - t_alpha + 1e-10], dim=-1)
    t_w = t_alpha * torch.cumprod(shifted, dim=-1)[..., :-1]

    j = jnp.asarray(sdf)
    np.testing.assert_allclose(np.asarray(cdf_phi_s(j, s)), t_cdf.numpy(),
                               rtol=1e-6, atol=1e-7)
    cdf, alpha = sdf_to_alpha(j, s)
    np.testing.assert_allclose(np.asarray(alpha), t_alpha.numpy(),
                               rtol=1e-5, atol=1e-7)
    cdf2, alpha2, w = sdf_to_w(j, s)
    np.testing.assert_allclose(np.asarray(w), t_w.numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(alpha_to_w(jnp.asarray(alpha))),
                               t_w.numpy(), rtol=1e-5, atol=1e-7)
