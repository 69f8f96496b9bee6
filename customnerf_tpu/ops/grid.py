"""Multiresolution hash/tiled grid encoding (Instant-NGP family), XLA path.

Functional re-implementation of the reference CUDA gridencoder
(``gridencoder/src/gridencoder.cu:88-244`` forward, ``:248-339`` backward,
wrapper ``gridencoder/grid.py``) as a dense gather + trilinear interpolation
that XLA fuses and differentiates.  The backward pass (scatter-add into the
embedding table) comes from autodiff of the gather and is *deterministic* on
TPU — an improvement over the reference's ``atomicAdd`` race-tolerant design
(SURVEY.md §5.2).

Exact semantics preserved (the "traps", SURVEY.md §7):
  * per-level scale:   ``scale_l = 2^(l·S)·H − 1``, ``res_l = ceil(scale_l)+1``
    with ``S = log2(per_level_scale)``,
    ``per_level_scale = exp2(log2(desired/base)/(L−1))`` (grid.py:108).
  * corner position:   ``pos = x·scale + 0.5`` (align_corners=False), floor →
    integer corner, fractional part → trilinear weights.
  * indexing (gridencoder.cu:67-84): dense stride accumulation while the
    stride fits the level's table; xor-prime hash (primes 1, 2654435761,
    805459861) only for *hash*-type levels that overflow; final
    ``index % hashmap_size``.  The reference model uses the **tiled** type
    (no hashing — overflow levels tile/alias via the modulo;
    nerf/network_grid.py:95).
  * per-level table sizes capped at ``2^log2_hashmap_size`` and rounded up
    to a multiple of 8 (grid.py:127-133).
  * inputs outside [0,1] produce zeros (gridencoder.cu:110-135).
  * embeddings initialised U(−1e-4, 1e-4) (grid.py:144-146).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# xor-hash primes for up to 3 input dims (gridencoder.cu:51-63)
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class GridSpec:
    """Static metadata for a multiresolution grid encoding."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int = 2048
    gridtype: str = "hash"  # "hash" | "tiled"
    align_corners: bool = False

    @property
    def per_level_scale(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp2(np.log2(self.desired_resolution / self.base_resolution) / (self.num_levels - 1))
        )

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @functools.cached_property
    def level_meta(self):
        """Per-level static arrays: scales, resolutions, offsets, sizes,
        stride tables, include masks, hash flags."""
        L, D = self.num_levels, self.input_dim
        S = np.log2(self.per_level_scale)
        H = self.base_resolution
        max_params = 2 ** self.log2_hashmap_size

        scales = np.exp2(np.arange(L) * S) * H - 1.0          # float
        res = np.ceil(scales).astype(np.int64) + 1             # kernel resolution
        side = res if self.align_corners else res + 1          # dense side length

        sizes, offsets = [], [0]
        for l in range(L):
            params = min(max_params, int(side[l]) ** D)
            params = int(np.ceil(params / 8) * 8)
            sizes.append(params)
            offsets.append(offsets[-1] + params)

        strides = np.ones((L, D), dtype=np.int64)
        include = np.zeros((L, D), dtype=bool)
        use_hash = np.zeros((L,), dtype=bool)
        for l in range(L):
            stride = 1
            for d in range(D):
                strides[l, d] = stride
                include[l, d] = stride <= sizes[l]
                stride *= int(side[l])
            overflow = stride > sizes[l]
            use_hash[l] = (self.gridtype == "hash") and overflow

        return dict(
            scales=scales.astype(np.float32),
            resolutions=res,
            sizes=np.asarray(sizes, dtype=np.int64),
            offsets=np.asarray(offsets, dtype=np.int64),
            strides=strides,
            include=include,
            use_hash=use_hash,
        )

    @property
    def table_size(self) -> int:
        return int(self.level_meta["offsets"][-1])


def grid_init(key, spec: GridSpec, dtype=jnp.float32):
    """Embedding table [table_size, level_dim], U(−1e-4, 1e-4)."""
    return jax.random.uniform(
        key, (spec.table_size, spec.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _corner_index(corner, meta_l, spec: GridSpec):
    """Flat table index for integer corner coords [B, D] at one level."""
    D = spec.input_dim
    c = corner.astype(jnp.uint32)
    # dense partial-stride index
    dense = jnp.zeros(c.shape[:-1], dtype=jnp.uint32)
    for d in range(D):
        if meta_l["include"][d]:
            dense = dense + c[..., d] * jnp.uint32(meta_l["strides"][d])
    if meta_l["use_hash"]:
        h = jnp.zeros(c.shape[:-1], dtype=jnp.uint32)
        for d in range(D):
            h = h ^ (c[..., d] * jnp.uint32(_PRIMES[d]))
        idx = h
    else:
        idx = dense
    idx = idx % jnp.uint32(meta_l["size"])
    return idx.astype(jnp.int32)


def grid_encode(x01, table, spec: GridSpec, max_level: int | None = None):
    """Encode positions through the multiresolution grid.

    Args:
      x01:   [..., D] float32 positions in [0, 1].
      table: [table_size, C] embedding table.
      spec:  static GridSpec.
      max_level: optional level cutoff (levels ≥ max_level output zeros),
        mirroring the reference's progressive-level option (grid.py:41).

    Returns:
      [..., L*C] encoded features (table dtype).
    """
    meta = spec.level_meta
    L, D, C = spec.num_levels, spec.input_dim, spec.level_dim
    max_level = L if max_level is None else min(max_level, L)

    prefix = x01.shape[:-1]
    x = x01.reshape(-1, D).astype(jnp.float32)
    B = x.shape[0]

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)  # [B,1]

    offset_bits = np.stack(
        np.meshgrid(*[[0, 1]] * D, indexing="ij"), axis=-1
    ).reshape(-1, D)  # [2^D, D] corner offset pattern

    bits_arr = jnp.asarray(offset_bits, dtype=jnp.int32)      # [8, D]
    K = 2 ** D

    # layout discipline (TPU tiling): every sizeable intermediate stays 2-D
    # with the corner/channel product folded into the minor dim — a
    # [B, L, K, C] formulation tile-pads its tiny minor dims 16-64×
    # (observed: a 768 MB logical tensor materialized as 12 GB).  Gathers
    # run per level ([B·K, C] each) so transients stay sub-GB and fuse.
    shift = 0.0 if spec.align_corners else 0.5
    S_corner = np.zeros((K * C, C), np.float32)   # corner-sum matmul
    for k in range(K):
        for c in range(C):
            S_corner[k * C + c, c] = 1.0
    S_corner = jnp.asarray(S_corner)

    L_used = min(max_level, L)
    outs = []
    for l in range(L_used):
        meta_l = dict(
            include=meta["include"][l],
            strides=meta["strides"][l],
            use_hash=bool(meta["use_hash"][l]),
            size=int(meta["sizes"][l]),
        )
        scale = float(meta["scales"][l])
        pos = x * scale + shift
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        pos_grid = pos_grid.astype(jnp.int32)

        base = int(meta["offsets"][l])
        corners = pos_grid[:, None, :] + bits_arr[None, :, :]   # [B, 8, D]
        idx = _corner_index(corners, meta_l, spec) + base       # [B, 8]
        w = jnp.where(bits_arr[None, :, :] == 0,
                      1.0 - frac[:, None, :], frac[:, None, :])
        w = jnp.prod(w, axis=-1)                                # [B, 8]

        vals = jnp.take(table, idx.reshape(-1), axis=0)         # [B*8, C]
        vals = vals.reshape(B, K * C).astype(jnp.float32)
        prod = vals * jnp.repeat(w, C, axis=1)                  # [B, K*C]
        outs.append(jnp.dot(prod, S_corner,
                            preferred_element_type=jnp.float32))  # [B, C]

    out = jnp.concatenate(outs, axis=-1).astype(table.dtype)     # [B, L*C]
    if L_used < L:
        out = jnp.concatenate(
            [out, jnp.zeros((B, (L - L_used) * C), table.dtype)], axis=-1)
    out = jnp.where(oob, jnp.zeros_like(out), out)
    return out.reshape(*prefix, L * C)


def grid_encode_reference_dense(x01, table, spec: GridSpec):
    """Slow per-point NumPy oracle for unit tests (no JAX)."""
    meta = spec.level_meta
    x = np.asarray(x01, dtype=np.float64).reshape(-1, spec.input_dim)
    tab = np.asarray(table, dtype=np.float64)
    B = x.shape[0]
    out = np.zeros((B, spec.output_dim), dtype=np.float64)
    D = spec.input_dim
    for b in range(B):
        if np.any(x[b] < 0) or np.any(x[b] > 1):
            continue
        for l in range(spec.num_levels):
            scale = float(meta["scales"][l])
            shift = 0.0 if spec.align_corners else 0.5
            pos = x[b] * scale + shift
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            acc = np.zeros(spec.level_dim)
            for idx in range(2 ** D):
                w = 1.0
                corner = pg.copy()
                for d in range(D):
                    if (idx >> d) & 1:
                        w *= frac[d]
                        corner[d] += 1
                    else:
                        w *= 1 - frac[d]
                M = 1 << 32  # uint32 wraparound, matching the CUDA arithmetic
                dense = 0
                for d in range(D):
                    if meta["include"][l, d]:
                        dense = (dense + int(corner[d]) * int(meta["strides"][l, d])) % M
                if meta["use_hash"][l]:
                    h = 0
                    for d in range(D):
                        h ^= (int(corner[d]) * _PRIMES[d]) % M
                    flat = h % M
                else:
                    flat = dense
                flat = int(flat % int(meta["sizes"][l])) + int(meta["offsets"][l])
                acc += w * tab[flat]
            out[b, l * spec.level_dim:(l + 1) * spec.level_dim] = acc
    return out
