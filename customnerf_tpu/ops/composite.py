"""Volume-rendering compositing + inverse-CDF importance sampling.

Equivalents of the reference's composite math (``nerf/renderer.py:420-424``
alphas/weights via exclusive cumprod; ``nerf/renderer.py:21-55`` NeRF
``sample_pdf``).  The compositing here is the dense [N_rays, T] formulation —
TPU-friendly static shapes; ragged CUDA compaction (raymarching.cu:501-577)
is replaced by masking (SURVEY.md §7 "ragged ray compaction").
"""

import jax
import jax.numpy as jnp


def alphas_from_sigmas(sigmas, deltas):
    """alpha_i = 1 − exp(−delta_i · sigma_i).  sigmas, deltas: [..., T]."""
    return 1.0 - jnp.exp(-deltas * sigmas)


def weights_from_alphas(alphas):
    """Front-to-back compositing weights.

    w_i = alpha_i · prod_{j<i}(1 − alpha_j + 1e-15), matching the reference's
    shifted-cumprod (renderer.py:422-424).
    """
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas[..., :-1] + 1e-15], axis=-1
    )
    return alphas * jnp.cumprod(shifted, axis=-1)


def cdf_phi_s(x, s):
    """NeuS Φ_s CDF (reference renderer.py:58-62); part of the exposed op
    surface though the grid pipeline never trains an SDF."""
    return jax.nn.sigmoid(x * s)


def sdf_to_alpha(sdf, s):
    """SDF → per-section opacity (reference renderer.py:65-72)."""
    cdf = cdf_phi_s(sdf, s)
    alpha = (cdf[..., :-1] - cdf[..., 1:]) / (cdf[..., :-1] + 1e-10)
    return cdf, jnp.clip(alpha, 0.0, None)


def sdf_to_w(sdf, s):
    """SDF → visibility weights (reference renderer.py:75-94)."""
    cdf, alpha = sdf_to_alpha(sdf, s)
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1)
    w = alpha * jnp.cumprod(shifted, axis=-1)[..., :-1]
    return cdf, alpha, w


def alpha_to_w(alpha):
    """Opacity → visibility weights (reference renderer.py:97-111)."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1)
    return alpha * jnp.cumprod(shifted, axis=-1)[..., :-1]


def sample_pdf(key, bins, weights, n_samples: int, det: bool = False):
    """Inverse-CDF sampling of new depths from bin weights (NeRF hierarchical
    sampling; reference renderer.py:21-55).

    Args:
      key:     PRNG key (unused when det=True).
      bins:    [B, T] bin positions (z_vals midpoints).
      weights: [B, T-1] bin weights.
      n_samples: number of new samples per ray.
      det:     evenly spaced u's instead of uniform random.

    Returns:
      [B, n_samples] new sample positions.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, T]

    B = cdf.shape[0]
    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        u = jax.random.uniform(key, (B, n_samples))

    # searchsorted(right) per ray
    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
