"""Pallas TPU kernels for the tri-plane table gradient.

Computes, for one plane of resolution R with C channels,

    dT[u, v·C + c] = Σ_b U[b, u] · V[b, v] · g[b, c]

building the ``W = V ⊗ g`` matmul operand inside VMEM (no HBM round-trip),
with U/V from iota-compares (in-kernel dynamic gathers are unsupported by
Mosaic here).  This is the Pallas attack on the atomicAdd backward the
reference runs at ``gridencoder/src/gridencoder.cu:248-339``.

Two generations:

* :func:`plane_dtable_pallas` — round 2, v-block-outer grid ``(nv, nb)``
  with a [R, Rv·C] accumulator block.  MEASURED NEGATIVE at C=16 (R=512:
  25.9-30.6 ms across tilings vs 19.3 ms XLA; R=128: 9.4 vs 7.9): the
  resident accumulator forces the sample-chunk loop innermost, so U
  ([Bc, R]) is rebuilt nv times and the f32-built + cast operand work
  dominates what the skipped HBM traffic saves.  Kept as the record.
* :func:`plane_dtable_pallas_fw` — round 5, the FULL-WIDTH variant priced
  in docs/PERF.md round 4 (~10-11 ms estimate vs 12.3 XLA at the flagship
  fine plane): grid over sample chunks ONLY, the whole [R, R·C]
  accumulator stays VMEM-resident (R=512, C=8 → 8 MB f32 of ~16 MB/core),
  U is built once per chunk, and the wide operand build is leaner —
  one iota row [1, R·C] (not a [Bc, R·C] iota), fv folded into the
  NARROW g before widening (ga/gb [Bc, C]), everything born in the
  matmul dtype (no f32 build + cast pass).  MEASURED NEGATIVE on chip
  (scripts/micro_dt_pallas.py, docs/PERF.md round 5): best 15.69 ms at
  chunk=512 (the VMEM ceiling) vs 13.16 ms XLA on the fine plane — the
  in-VMEM `pltpu.repeat` operand widening pays in VPU time the HBM
  traffic it skips, and the resident accumulator caps matmul tiling at
  70 vs XLA's 83.6 TFLOP/s effective.  No Pallas dT variant remains
  priced positive; both kernels are kept as exact, tested records.

Toolchain constraints (round-2, still apply):

  * 1-D *blocked* BlockSpecs fail to compile (use [B, 1] column blocks);
  * block shapes must satisfy the (÷8, ÷128 | full-dim) rule;
  * oversized per-step VMEM live sets crash the remote compiler with an
    uninformative HTTP 500 (keep the per-step live set ≲ 2 MB + the
    resident accumulator).

The production backward stays ops/triplane.py::_plane_dtable (XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dtable_kernel(u0_ref, fu_ref, v0_ref, fv_ref, g_ref, out_ref,
                   *, R: int, C: int, Rv: int, mm_dtype):
    vi = pl.program_id(0)
    bi = pl.program_id(1)
    Bc = u0_ref.shape[0]

    # sample vectors arrive as [Bc, 1] columns — 1-D blocked specs fail to
    # compile on TPU here, and (1, Bc) rows violate the (÷8, ÷128) block
    # rule; a (Bc, 1) column block satisfies it and broadcasts naturally
    u0 = u0_ref[:]                                   # [Bc, 1] int32
    fu = fu_ref[:]
    # U[b, r] = (r==u0)·(1−fu) + (r==u0+1)·fu  — built on the VPU
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (Bc, R), 1)
    U = ((iota_u == u0).astype(jnp.float32) * (1 - fu)
         + (iota_u == u0 + 1).astype(jnp.float32) * fu)

    # W[b, j] for j = v_local·C + c over this v-block, with g tiled so that
    # column j carries channel j % C (2-D throughout: no reshapes in-kernel)
    v0 = v0_ref[:] - vi * Rv                         # [Bc, 1], local v index
    fv = fv_ref[:]
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (Bc, Rv * C), 1)
    v_idx = iota_j // C
    Vw = ((v_idx == v0).astype(jnp.float32) * (1 - fv)
          + (v_idx == v0 + 1).astype(jnp.float32) * fv)
    g_tiled = pltpu.repeat(g_ref[:], Rv, axis=1)     # [Bc, Rv·C]
    W = Vw * g_tiled

    part = jax.lax.dot_general(
        U.astype(mm_dtype), W.astype(mm_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),  # Uᵀ @ W
        preferred_element_type=jnp.float32,
    )                                                # [R, Rv·C]

    @pl.when(bi == 0)
    def _():
        out_ref[:] = part

    @pl.when(bi != 0)
    def _():
        out_ref[:] = out_ref[:] + part


@functools.partial(jax.jit, static_argnames=("R", "C", "chunk", "use_bf16",
                                             "interpret"))
def plane_dtable_pallas(u0, v0, fu, fv, g, R: int, C: int,
                        chunk: int = 2048, use_bf16: bool = True,
                        interpret: bool = False):
    """Scatter-free plane gradient on the MXU with VMEM-built operands.

    Args:
      u0, v0: [B] int32 corner indices (0 ≤ · ≤ R−2).
      fu, fv: [B] float32 bilinear fractions.
      g:      [B, C] float32 output cotangent for this plane.
    Returns:
      dT [R·R, C] float32.
    """
    B = g.shape[0]
    Bc = min(chunk, B)
    nb = -(-B // Bc)
    pad = nb * Bc - B
    if pad:
        u0 = jnp.pad(u0, (0, pad))
        v0 = jnp.pad(v0, (0, pad))
        fu = jnp.pad(fu, (0, pad))
        fv = jnp.pad(fv, (0, pad))
        g = jnp.pad(g, ((0, pad), (0, 0)))           # zero grad → no effect
    # [B, 1] columns: (Bc, 1) blocks satisfy the TPU (÷8, ÷128 | full) rule
    u0 = u0.reshape(-1, 1)
    v0 = v0.reshape(-1, 1)
    fu = fu.reshape(-1, 1)
    fv = fv.reshape(-1, 1)

    # v-blocks sized so the [R, Rv·C] accumulator block stays ~2 MB
    Rv = max(1, min(R, 2048 // C))
    nv = -(-R // Rv)
    if R % Rv:
        # keep blocks uniform: shrink Rv to a divisor of R
        while R % Rv:
            Rv -= 1
        nv = R // Rv

    kernel = functools.partial(
        _dtable_kernel, R=R, C=C, Rv=Rv,
        mm_dtype=jnp.bfloat16 if use_bf16 else jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(nv, nb),
        in_specs=[
            pl.BlockSpec((Bc, 1), lambda vi, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc, 1), lambda vi, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc, 1), lambda vi, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc, 1), lambda vi, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc, C), lambda vi, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, Rv * C), lambda vi, bi: (0, vi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, R * C), jnp.float32),
        interpret=interpret,
    )(u0, fu, v0, fv, g)

    return out.reshape(R * R, C)


def _dtable_kernel_fw(u0_ref, fu_ref, v0_ref, fv_ref, g_ref, out_ref,
                      *, R: int, C: int, mm_dtype):
    """Full-width chunk-accumulate kernel: grid is sample chunks only; the
    whole [R, R·C] accumulator lives in this program's output block across
    every grid step (constant index map → block stays VMEM-resident)."""
    bi = pl.program_id(0)
    Bc = u0_ref.shape[0]

    u0 = u0_ref[:]                                   # [Bc, 1] int32
    fu = fu_ref[:].astype(mm_dtype)
    # U[b, r] = (r==u0)·(1−fu) + (r==u0+1)·fu — born in the matmul dtype
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (Bc, R), 1)
    U = ((iota_u == u0).astype(mm_dtype) * (1 - fu)
         + (iota_u == u0 + 1).astype(mm_dtype) * fu)

    # fold fv into the NARROW g (two [Bc, C] multiplies), then widen with
    # 0/1 masks only: W[b, v·C+c] = (v==v0)·ga[b,c] + (v==v0+1)·gb[b,c]
    fv = fv_ref[:].astype(mm_dtype)                  # [Bc, 1]
    g = g_ref[:].astype(mm_dtype)                    # [Bc, C]
    ga = pltpu.repeat(g * (1 - fv), R, axis=1)       # [Bc, R·C], col j ↦ c=j%C
    gb = pltpu.repeat(g * fv, R, axis=1)
    # v-index of each wide column from ONE [1, R·C] iota row (the [Bc, R·C]
    # iota + int-div was a measured VPU wall in the round-2 kernel)
    v_idx = jax.lax.broadcasted_iota(jnp.int32, (1, R * C), 1) // C
    v0 = v0_ref[:]                                   # [Bc, 1]
    W = (jnp.where(v_idx == v0, ga, jnp.zeros_like(ga))
         + jnp.where(v_idx == v0 + 1, gb, jnp.zeros_like(gb)))

    part = jax.lax.dot_general(
        U, W, dimension_numbers=(((0,), (0,)), ((), ())),   # Uᵀ @ W
        preferred_element_type=jnp.float32,
    )                                                # [R, R·C]

    @pl.when(bi == 0)
    def _():
        out_ref[:] = part

    @pl.when(bi != 0)
    def _():
        out_ref[:] = out_ref[:] + part


@functools.partial(jax.jit, static_argnames=("R", "C", "chunk", "use_bf16",
                                             "interpret"))
def plane_dtable_pallas_fw(u0, v0, fu, fv, g, R: int, C: int,
                           chunk: int = 256, use_bf16: bool = True,
                           interpret: bool = False):
    """Full-width scatter-free plane gradient (see module docstring).

    Same contract as :func:`plane_dtable_pallas` / ops/triplane.py::
    ``_plane_dtable``: returns dT [R·R, C] float32.
    """
    B = g.shape[0]
    Bc = min(chunk, B)
    nb = -(-B // Bc)
    pad = nb * Bc - B
    if pad:
        u0 = jnp.pad(u0, (0, pad))
        v0 = jnp.pad(v0, (0, pad))
        fu = jnp.pad(fu, (0, pad))
        fv = jnp.pad(fv, (0, pad))
        g = jnp.pad(g, ((0, pad), (0, 0)))           # zero grad → no effect
    u0 = u0.reshape(-1, 1)
    v0 = v0.reshape(-1, 1)
    fu = fu.reshape(-1, 1)
    fv = fv.reshape(-1, 1)

    kernel = functools.partial(
        _dtable_kernel_fw, R=R, C=C,
        mm_dtype=jnp.bfloat16 if use_bf16 else jnp.float32)

    col = lambda bi: (bi, 0)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Bc, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc, C), col, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, R * C), lambda bi: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, R * C), jnp.float32),
        interpret=interpret,
    )(u0, fu, v0, fv, g)

    return out.reshape(R * R, C)
