"""Cross-ray active-sample compaction (TPU-native, static shapes).

On real captures most of the fast path's [N, n_keep] sample slab is dead
weight: the trained bear-fixture scene fills only ~32% of the slots (the
rest are rays that crossed fewer occupied cells than the keep budget), yet
the field + its backward run on every slot.  The reference's CUDA march
avoids this with ragged atomic compaction (`raymarching/src/
raymarching.cu:312-480`) — dynamic shapes TPU/XLA cannot express.

This module is the static-shape answer, reusing the one-hot-matmul trick
that replaced the march's argsort (ops/occupancy.py): group G consecutive
rays into a block, give each block a fixed sample budget M, and compact the
block's valid samples into the [M] slots with ONE one-hot MXU matmul
(0/1 × value products are exact — not an approximation).  The field then
evaluates NB·M samples instead of N·K; a transposed matmul scatters
σ/radiance back to the [N, K] slab (all dense deterministic matmuls, so
gradients flow through plain dot_generals — no scatter-adds).

Overflow (a block with more than M valid samples) is handled like the
march's budget overflow: an even-stride subsample across the block's valid
samples plus a per-block quadrature scale on dt (each kept sample stands in
for `n_valid/M` march steps).  Callers that feed raster-ordered rays should
permute rays first (blocks of adjacent rays correlate); with random-pixel
batches a ~2× budget is multiple binomial σ above the mean fill, so the
no-overflow path — which is EXACT — is the common case.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def block_budget(block_rays: int, n_keep: int, frac: float) -> int:
    """Static per-block slot budget: ceil(G·K·frac) rounded up to a lane
    multiple (128) for the MXU, capped at G·K (no-op compaction)."""
    raw = int(np.ceil(block_rays * n_keep * float(frac)))
    budget = max(128, -(-raw // 128) * 128)
    return min(budget, block_rays * n_keep)


def compact_plan(valid, block_rays: int, budget: int):
    """Shared compaction bookkeeping (keep/slot math + one-hot build).

    Args:
      valid: [N, K] bool (N divisible by block_rays).
      block_rays: rays per block (G).
      budget: static slots per block (M).

    Returns:
      onehot: [NB, G·K, M] bf16 — kept position t → slot m.
      slot_valid: [NB, M] bool — which compacted slots are live.
      block_scale: [NB, 1] f32 — even-stride quadrature scale (≥1; 1
        unless the block overflowed the budget).
    """
    N, K = valid.shape
    G = block_rays
    assert N % G == 0, (N, G)
    NB = N // G

    v = valid.reshape(NB, G * K)
    vi = v.astype(jnp.int32)
    count = jnp.cumsum(vi, axis=-1)                     # [NB, G·K]
    n_val = count[:, -1:]                               # [NB, 1]
    rank = count - vi                                   # 0-based among valid

    # even-stride subsample when the block overflows the budget (same
    # bucket trick as march_rays_occupancy: keep the first sample of each
    # of M equal rank-buckets → drops spread evenly along every ray)
    scale = jnp.maximum(n_val, budget)
    bucket = (rank * budget) // scale
    prev_bucket = jnp.where(rank > 0, ((rank - 1) * budget) // scale, -1)
    keep = v & (bucket != prev_bucket)

    slot = jnp.cumsum(keep.astype(jnp.int32), axis=-1) - 1
    onehot = ((slot[..., None] == jnp.arange(budget)[None, None, :])
              & keep[..., None]).astype(jnp.bfloat16)   # [NB, G·K, M]

    slot_valid = jnp.arange(budget)[None, :] < jnp.minimum(n_val, budget)
    block_scale = jnp.maximum(n_val.astype(jnp.float32) / budget, 1.0)
    return onehot, slot_valid, block_scale


def compact_blocks(valid, vals, block_rays: int, budget: int):
    """Compact per-sample values across rays, G rays per block.

    Args:
      valid: [N, K] bool (N divisible by block_rays).
      vals:  [N, K, C] f32 per-sample values (xyz, dirs, ... concatenated).
      block_rays: rays per block (G).
      budget: static slots per block (M).

    Returns:
      vals_c: [NB, M, C] f32 — compacted values, depth-ordered within the
        block; slots ≥ min(n_valid, M) are zero.
      onehot: [NB, G·K, M] bf16 — the compaction matrix (kept position
        t → slot m); pass to :func:`uncompact_blocks`.
      slot_valid: [NB, M] bool — which compacted slots are live.
      block_scale: [NB, 1] f32 — even-stride quadrature scale (≥1; 1 unless
        the block overflowed the budget).
    """
    N, K, C = vals.shape
    G = block_rays
    NB = N // G
    onehot, slot_valid, block_scale = compact_plan(valid, G, budget)

    vals_c = jax.lax.dot_general(
        onehot, vals.reshape(NB, G * K, C).astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # [NB, M, C]
    return vals_c, onehot, slot_valid, block_scale


def compact_planes(onehot, planes):
    """Channel-major compaction: pack a sequence of [N, K] sample planes.

    TPU tiling pads a materialized [NB, G·K, C] operand's C-minor to 128
    lanes (C=6 → 21× traffic waste — see CLAUDE.md tiling discipline); the
    channel-major form keeps G·K / M minor on every matmul operand so
    nothing pads: [NB, P, G·K] @ [NB, G·K, M] → [NB, P, M].

    Args:
      onehot: [NB, G·K, M] bf16 from :func:`compact_plan`.
      planes: sequence of [N, K] f32 per-sample scalar planes.

    Returns [NB, P, M] f32: plane p's block-compacted slots at [:, p, :].
    """
    NB, GK, M = onehot.shape
    x = jnp.stack([p.reshape(NB, GK).astype(jnp.float32) for p in planes],
                  axis=1)                               # [NB, P, G·K]
    return jax.lax.dot_general(
        x, onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # [NB, P, M]


def uncompact_planes(onehot, planes_c):
    """Channel-major scatter-back: [NB, P, M] slot planes → [NB, P, G·K]
    (zeros at dropped/invalid positions).  Slice plane p at [:, p, :] and
    reshape to [N, K] at the call site."""
    return jax.lax.dot_general(
        planes_c.astype(jnp.float32), onehot,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # [NB, P, G·K]


def uncompact_blocks(onehot, vals_c):
    """Scatter compacted per-slot values back to the [N, K] slab.

    onehot: [NB, G·K, M] from :func:`compact_blocks`; vals_c: [NB, M, C].
    Returns [NB, G·K, C] f32 (zeros at positions that were not kept —
    dropped or invalid samples contribute nothing downstream); reshape to
    [N, K, C] at the call site.
    """
    return jax.lax.dot_general(
        onehot, vals_c.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # [NB, G·K, C]


def ray_permutation(n: int):
    """Fixed coprime-stride permutation of ray indices (host-side constant,
    computed at trace time): decorrelates raster-ordered rays so
    adjacent-pixel runs of high sample counts spread across blocks instead
    of overflowing one block.  Returns (perm, inv_perm) int64 arrays."""
    stride = 7919  # prime
    while np.gcd(stride, n) != 1:
        stride += 2
    perm = (np.arange(n, dtype=np.int64) * stride) % n
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n, dtype=np.int64)
    return perm, inv
