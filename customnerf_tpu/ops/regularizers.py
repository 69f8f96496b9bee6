"""Grid regularizers: total-variation on the multiresolution embedding table.

Differentiable equivalent of the reference's TV-gradient CUDA kernel
(``gridencoder/src/gridencoder.cu:505-609`` ``kernel_grad_tv``, wrapper
``gridencoder/grid.py:171-192``): the reference accumulates the TV gradient
directly into ``embeddings.grad``; here it's a plain differentiable loss —
add ``weight · grid_total_variation(...)`` to the training loss and autodiff
produces the same scatter-add update (deterministic on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from customnerf_tpu.ops.grid import GridSpec, grid_encode


def grid_total_variation(table, spec: GridSpec, key, n_samples: int = 65536,
                         bound: float = 1.0):
    """Stochastic TV loss: squared differences of the encoding under one-cell
    offsets along each axis at random sample points."""
    x = jax.random.uniform(key, (n_samples, spec.input_dim),
                           minval=-bound, maxval=bound)
    x01 = (x + bound) / (2 * bound)
    meta = spec.level_meta
    base = grid_encode(x01, table, spec)
    tv = 0.0
    finest = float(meta["scales"][-1]) + 1.0
    eps = 1.0 / finest
    for d in range(spec.input_dim):
        x_off = x01.at[:, d].add(eps)
        shifted = grid_encode(jnp.clip(x_off, 0.0, 1.0), table, spec)
        tv = tv + jnp.mean((shifted - base) ** 2)
    return tv
