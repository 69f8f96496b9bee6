"""Pallas TPU kernel for the tri-plane table gradient — MEASURED NEGATIVE.

Computes, for one plane of resolution R with C channels,

    dT[u, v·C + c] = Σ_b U[b, u] · V[b, v] · g[b, c]

building the ``W = V ⊗ g`` matmul operand inside VMEM (no HBM round-trip),
with U/V from iota-compares (in-kernel dynamic gathers are unsupported by
Mosaic here).  Correct (interpret-mode parity vs the XLA implementation,
``tests/test_triplane.py``), compiles and runs on the v5e — but **slower
than the XLA version it was meant to beat** (R=512, C=16, 262k samples:
25.9-30.6 ms across tilings vs 19.3 ms XLA; R=128: 9.4 vs 7.9 ms), because
keeping the [R, Rv·C] accumulator resident forces the sample-chunk loop
innermost, so U ([Bc, R]) is rebuilt nv times and the VPU compare work
dominates what the skipped HBM traffic saves.  Kept as the record of the
attempt and of two toolchain constraints it surfaced (docs/PERF.md):

  * 1-D *blocked* BlockSpecs fail to compile (use [B, 1] column blocks);
  * block shapes must satisfy the (÷8, ÷128 | full-dim) rule;
  * oversized per-step VMEM live sets crash the remote compiler with an
    uninformative HTTP 500 (keep Bc·Rv·C ≲ 512k f32 words).

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
