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
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.exp(x)
    return y, dx * jnp.exp(jnp.clip(x, -15.0, 15.0))
