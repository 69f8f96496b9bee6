"""Morton (Z-order) 3D encode/decode + sphere intersection — API parity with
the reference raymarching extras (``raymarching/src/raymarching.cu:214-260``
morton3D/morton3D_invert, ``:163-198`` sph_from_ray).

Pure bit-twiddling in jnp (VPU integer ops) — no kernel needed.  On TPU the
occupancy grid uses linear indexing (SURVEY.md §7 step 5 note), but morton
order is exposed for checkpoint/tooling parity with the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zeros between each."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3D(coords):
    """coords: [..., 3] int in [0, 1024) → [...,] uint32 morton codes."""
    c = coords.astype(jnp.uint32)
    return (_expand_bits(c[..., 0])
            | (_expand_bits(c[..., 1]) << 1)
            | (_expand_bits(c[..., 2]) << 2))


def _compact_bits(v):
    v = v & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def morton3D_invert(codes):
    """[...,] uint32 morton codes → [..., 3] int32 coords."""
    c = codes.astype(jnp.uint32)
    return jnp.stack([
        _compact_bits(c), _compact_bits(c >> 1), _compact_bits(c >> 2)
    ], axis=-1).astype(jnp.int32)


def sph_from_ray(rays_o, rays_d, radius: float):
    """Intersect rays with a sphere of given radius → [..., 3] hit points
    (the reference's background-sphere coordinate helper; it assumes the
    origin lies inside the sphere and takes the forward intersection)."""
    b = jnp.sum(rays_o * rays_d, axis=-1)
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    disc = jnp.maximum(b * b - c, 0.0)
    t = -b + jnp.sqrt(disc)
    return rays_o + t[..., None] * rays_d
