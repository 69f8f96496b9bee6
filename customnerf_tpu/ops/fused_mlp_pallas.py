"""Pallas TPU kernel: fully-fused NeRF field MLPs.

The tcnn ``FullyFusedMLP`` idea (reference N5, ``nerf/network_grid.py:98-139``)
re-built for the MXU: all head weights (feature 32→64×2, density 64→1, rgb
[dir 27 + fea 64]→4) total <60 KB — they sit in VMEM while points stream
through in tiles, so intermediate activations never touch HBM.  One kernel
evaluates feature + density + rgb heads per tile.

Weights are padded to lane multiples (last dim 128) once at call time;
zero-padding is mathematically inert for the bias-free ReLU stacks.

Backward: ``custom_vjp`` whose reverse pass is the autodiff of the identical
jnp reference (`_reference_forward`) — same math, XLA-fused; the Pallas win
is the forward-heavy paths (rendering, density queries for occupancy
refresh, eval).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256          # points per program (sublane multiple)
LANE = 128


def _pad_to(x, target, axis):
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pad_up(n, m=LANE):
    return ((n + m - 1) // m) * m


def _reference_forward(x_en, view_en, weights):
    """jnp oracle of the fused kernel (also the custom_vjp backward body).

    Exact head structure of the field (models/field.py): feature net =
    2 hidden ReLU + linear out; density head = Dense-ReLU-Dense on fea;
    rgb head = Dense-ReLU-Dense on [view_en | fea]."""
    w1, w2, w3, wd1, wd2, wr1, wr2 = weights
    h = jax.nn.relu(x_en @ w1)
    h = jax.nn.relu(h @ w2)
    fea = h @ w3
    sigma_raw = (jax.nn.relu(fea @ wd1) @ wd2)[..., 0]
    rgb_in = jnp.concatenate([view_en, fea], axis=-1)
    rgb_raw = jax.nn.relu(rgb_in @ wr1) @ wr2
    return sigma_raw, rgb_raw


def _kernel(x_ref, v_ref, w1_ref, w2_ref, w3_ref, wd1_ref, wd2_ref,
            wr1_ref, wr2_ref, sigma_ref, rgb_ref):
    x = x_ref[:]                     # [TILE, in_pad]
    v = v_ref[:]                     # [TILE, dir_pad]
    f32 = jnp.float32
    h = jnp.maximum(jnp.dot(x, w1_ref[:], preferred_element_type=f32), 0.0)
    h = jnp.maximum(jnp.dot(h, w2_ref[:], preferred_element_type=f32), 0.0)
    fea = jnp.dot(h, w3_ref[:], preferred_element_type=f32)   # [TILE, 64p]
    hd = jnp.maximum(jnp.dot(fea, wd1_ref[:], preferred_element_type=f32), 0.0)
    sigma = jnp.dot(hd, wd2_ref[:], preferred_element_type=f32)
    sigma_ref[:] = sigma              # [TILE, LANE] (col 0 meaningful)

    rgb_in = jnp.concatenate([v, fea], axis=-1)               # [TILE, dir+64p]
    hr = jnp.maximum(jnp.dot(rgb_in, wr1_ref[:], preferred_element_type=f32), 0.0)
    rgb_ref[:] = jnp.dot(hr, wr2_ref[:], preferred_element_type=f32)


def _pallas_forward(x_en, view_en, weights):
    w1, w2, w3, wd1, wd2, wr1, wr2 = weights
    B = x_en.shape[0]
    in_dim, hid = w1.shape
    dir_dim = view_en.shape[-1]
    out_rgb = wr2.shape[-1]

    in_pad = _pad_up(in_dim)
    hid_pad = _pad_up(hid)
    dir_pad = _pad_up(dir_dim)
    cat_pad = dir_pad + hid_pad

    xp = _pad_to(x_en.astype(jnp.float32), in_pad, 1)
    vp = _pad_to(view_en.astype(jnp.float32), dir_pad, 1)
    B_pad = _pad_up(B, TILE)
    xp = _pad_to(xp, B_pad, 0)
    vp = _pad_to(vp, B_pad, 0)

    w1p = _pad_to(_pad_to(w1, in_pad, 0), hid_pad, 1)
    w2p = _pad_to(_pad_to(w2, hid_pad, 0), hid_pad, 1)
    w3p = _pad_to(_pad_to(w3, hid_pad, 0), hid_pad, 1)
    wd1p = _pad_to(_pad_to(wd1, hid_pad, 0), hid_pad, 1)
    wd2p = _pad_to(_pad_to(wd2, hid_pad, 0), LANE, 1)
    # rgb head input = [view_en | fea]: rebuild with padded offsets
    wr1p = jnp.zeros((cat_pad, hid_pad), jnp.float32)
    wr1p = wr1p.at[:dir_dim, :hid].set(wr1[:dir_dim])
    wr1p = wr1p.at[dir_pad:dir_pad + hid, :hid].set(wr1[dir_dim:])
    wr2p = _pad_to(_pad_to(wr2, hid_pad, 0), LANE, 1)

    grid = (B_pad // TILE,)
    sigma, rgb = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, in_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, dir_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_pad, hid_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid_pad, hid_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid_pad, hid_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid_pad, hid_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid_pad, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cat_pad, hid_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid_pad, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, LANE), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, LANE), jnp.float32),
        ],
    )(xp, vp, w1p, w2p, w3p, wd1p, wd2p, wr1p, wr2p)

    return sigma[:B, 0], rgb[:B, :out_rgb]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_field_mlp(x_en, view_en, weights):
    """sigma_raw [B], rgb_raw [B, out] — Pallas forward, reference backward."""
    return _pallas_forward(x_en, view_en, tuple(weights))


def _fwd(x_en, view_en, weights):
    out = _pallas_forward(x_en, view_en, tuple(weights))
    return out, (x_en, view_en, tuple(weights))


def _bwd(res, cts):
    x_en, view_en, weights = res
    _, vjp = jax.vjp(lambda x, v, w: _reference_forward(x, v, w),
                     x_en, view_en, weights)
    dx, dv, dw = vjp(cts)
    return dx, dv, list(dw)


fused_field_mlp.defvjp(_fwd, _bwd)
