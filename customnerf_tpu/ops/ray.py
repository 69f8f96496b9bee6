"""Ray/AABB intersection (slab test).

Vectorised equivalent of the reference CUDA kernel
``raymarching/src/raymarching.cu:92-145`` (``kernel_near_far_from_aabb``):
per-axis slab intersection; a miss sets near = far = FLT_MAX; near is clamped
to ``min_near``.  Pure ``jnp`` — XLA fuses this into the surrounding render.
"""

import jax.numpy as jnp

# FLT_MAX miss sentinel (CUDA parity).  Plain Python float — creating a jnp
# scalar at import time would initialize the JAX backend before callers can
# select a platform.
_MISS = 3.4028235e38


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.05):
    """Compute per-ray entry/exit distances for an axis-aligned box.

    Args:
      rays_o: [..., 3] ray origins.
      rays_d: [..., 3] ray directions (need not be normalised).
      aabb:   [6] (xmin, ymin, zmin, xmax, ymax, zmax).
      min_near: lower clamp for the near distance.

    Returns:
      (nears, fars): [...] float32 each.  Misses give FLT_MAX for both.
    """
    rd = 1.0 / rays_d
    t0 = (aabb[:3] - rays_o) * rd  # [..., 3]
    t1 = (aabb[3:] - rays_o) * rd
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, _MISS, near)
    far = jnp.where(miss, _MISS, far)
    return near, far
