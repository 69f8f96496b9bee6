"""Activation ops with custom gradients.

``trunc_exp`` reproduces the reference's truncated-exponential density
activation (reference ``nerf/provider_utils.py:16-29``): forward is a plain
``exp``; the backward clamps the *input* to ±15 before re-exponentiating so
gradients can't blow up for large densities.
"""

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x):
    # forward input clamped at 80: keeps exp fp32-finite (the reference's
    # fp32 forward silently overflows past ~88 and NaNs the composite);
    # densities beyond e^80 are physically meaningless for volume rendering.
    return jnp.exp(jnp.minimum(x, 80.0))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.exp(jnp.minimum(x, 80.0))
    return y, dx * jnp.exp(jnp.clip(x, -15.0, 15.0))
