"""Tri-plane factorized position encoding — the TPU row-count answer.

The reference's speed comes from a CUDA hash-grid whose per-thread random
gathers (``gridencoder/src/gridencoder.cu:88-244``) have no fast TPU
equivalent: the TPU gather unit is row-issue-bound (~12 ns/row fwd,
~90 ns/row scatter bwd, docs/PERF.md), and an instant-ngp sample costs
``levels × 8`` rows (128 at the 16×2 parity config).  This module provides a
TensoRF/EG3D-family tri-plane field — selected via ``--grid_type triplane``
behind the same encoder API — that needs only **one packed gather row per
plane** (3 per level vs the grid's 128 rows/sample), an order of magnitude
fewer.

TPU-first design points:
  * forward (matmul-bwd path): packed overlapping-row gathers — each plane
    is re-laid so a single wide row holds the whole 2×(S+1) texel patch
    around any bilinear quad (:func:`_pack_plane`); corner extraction is an
    in-register one-hot fold.  The oracle path keeps plain 4-row gathers.
    All sizeable intermediates stay 2-D with the corner × channel product
    folded into the minor dim (TPU tiling discipline, see ops/grid.py).
  * backward (``bwd="matmul"``): the table gradient is computed **without any
    scatter** — the reference uses ``atomicAdd`` (gridencoder.cu:248-339) and
    plain XLA scatter-add costs ~90 ns/row; instead we exploit separability:

        dT[u, v, c] = Σ_b U[b, u] · V[b, v] · g[b, c]

    with U/V the 2-nonzero bilinear weight matrices.  Built per chunk on the
    VPU (iota-compare) and contracted on the MXU as ``Uᵀ @ (V ⊗ g)`` — a
    dense, deterministic matmul replacing millions of random writes.
  * ``bwd="scatter"`` keeps plain autodiff (jnp.take → scatter-add) as the
    correctness oracle.

Semantics shared with the grid encoder (ops/grid.py): inputs live in [0, 1]³,
out-of-range inputs produce zeros, tables init U(−1e-4, 1e-4).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# plane axis pairs: XY, XZ, YZ
_PLANES = ((0, 1), (0, 2), (1, 2))


@dataclass(frozen=True)
class TriplaneSpec:
    """Static metadata for a (multi-resolution) tri-plane encoding.

    ``channels`` is an int (same width every level) or a per-level tuple —
    e.g. ``resolutions=(128, 512), channels=(16, 8)`` keeps the fine level's
    RESOLUTION (quality) while halving its backward-matmul FLOPs, which scale
    as R²·C and dominate the train step at R=512 (docs/PERF.md).  The flat
    table is laid out at ``max(channels)`` width; narrow levels use the
    leading columns (gathers are row-issue-bound, so the extra columns are
    free on the forward)."""

    resolutions: Tuple[int, ...] = (128, 512)
    channels: int | Tuple[int, ...] = 16
    input_dim: int = 3
    bwd: str = "matmul"        # "matmul" (MXU, scatter-free) | "scatter"
                               # | "banded" (bucket-compacted band matmul —
                               #   cuts dT flops R/(bw+1)× AND the Kronecker
                               #   build traffic; exact via per-chunk
                               #   overflow reroute + full-path lax.cond) (autodiff)
    mm_bf16: bool = True       # run the backward matmuls in bf16 (f32 accumulate)
    bwd_chunk: int = 8192      # samples per backward matmul chunk (sweep:
                               # 2048→68.0k, 4096→71.7k, 8192→72.2k,
                               # 16384→73.2k rays/s at 4096 rays; 8192 holds
                               # up at larger ray batches too)
    pack_span: int = 7         # packed-row v-span S (fwd row = 2(S+1)C channels)
    fwd_bf16: bool = False     # gather bf16 packed rows (−16% fwd, matches the
                               # reference's fp16 embeddings, grid.py:45-47)
    banded_bw: int = 32        # bwd="banded": u-bucket width (band = bw+1 rows)
    banded_sub: int = 512      # bwd="banded": compaction sub-block size
    banded_q: int = 48         # bwd="banded": slots per bucket per sub-block
    banded_min_res: int = 256  # bwd="banded": band only planes with R ≥ this
                               # (small planes' full-width matmul is cheaper
                               # than the compaction machinery, measured)
    banded_q2: int = 32        # bwd="banded": chunk-wide second-level slots
                               # per bucket for sub-block overflow; if even
                               # those overflow the chunk takes the
                               # full-width path via lax.cond (gradient
                               # stays EXACT under every skew)

    def __post_init__(self):
        assert self.input_dim == 3, "tri-plane encoding requires 3-D inputs"
        assert all(r >= 2 for r in self.resolutions)
        if isinstance(self.channels, (tuple, list)):
            object.__setattr__(self, "channels", tuple(self.channels))
            assert len(self.channels) == len(self.resolutions), (
                "per-level channels must match resolutions")
        assert self.bwd in ("matmul", "scatter", "banded")
        if self.bwd == "banded":
            assert self.bwd_chunk % self.banded_sub == 0, (
                "banded backward needs bwd_chunk % banded_sub == 0")
            assert self.banded_q <= self.banded_sub

    def channels_at(self, level: int) -> int:
        c = self.channels
        return int(c[level]) if isinstance(c, tuple) else int(c)

    @property
    def max_channels(self) -> int:
        c = self.channels
        return int(max(c)) if isinstance(c, tuple) else int(c)

    @property
    def level_dim(self) -> int:  # API parity with GridSpec
        return self.max_channels

    @property
    def num_levels(self) -> int:
        return len(self.resolutions)

    @property
    def output_dim(self) -> int:
        return 3 * sum(self.channels_at(l)
                       for l in range(len(self.resolutions)))

    @functools.cached_property
    def plane_offsets(self):
        """Row offset of each (level, plane) block in the flat table."""
        offs = np.zeros((len(self.resolutions), 3), dtype=np.int64)
        acc = 0
        for li, r in enumerate(self.resolutions):
            for pi in range(3):
                offs[li, pi] = acc
                acc += r * r
        return offs

    @property
    def table_size(self) -> int:
        return int(sum(3 * r * r for r in self.resolutions))


def triplane_init(key, spec: TriplaneSpec, dtype=jnp.float32):
    """Flat table [table_size, max_channels], U(−1e-4, 1e-4) (grid_init
    parity); narrow levels use the leading channels_at(l) columns."""
    return jax.random.uniform(
        key, (spec.table_size, spec.max_channels), dtype=dtype,
        minval=-1e-4, maxval=1e-4,
    )


def _corner_data(x, spec: TriplaneSpec):
    """Per (level, plane) integer corners + bilinear weights.

    Returns a list over (level, plane) of (idx [B, 4] int32, w [B, 4] f32,
    fu [B], fv [B], u0 [B], v0 [B], axes (a, b), R).
    """
    out = []
    for li, R in enumerate(spec.resolutions):
        pos = x * (R - 1)                       # align_corners: texel centres
        p0 = jnp.clip(jnp.floor(pos), 0, R - 2).astype(jnp.int32)
        f = pos - p0.astype(jnp.float32)        # stays correct at the border
        for pi, (a, b) in enumerate(_PLANES):
            base = int(spec.plane_offsets[li, pi])
            u0, v0 = p0[:, a], p0[:, b]
            fu, fv = f[:, a], f[:, b]
            i00 = base + u0 * R + v0
            idx = jnp.stack([i00, i00 + 1, i00 + R, i00 + R + 1], axis=1)
            w = jnp.stack(
                [(1 - fu) * (1 - fv), (1 - fu) * fv, fu * (1 - fv), fu * fv],
                axis=1,
            )
            out.append((idx, w, fu, fv, u0, v0, (a, b), R))
    return out


def _fold_matrix(K: int, C: int):
    """Static [K·C, C] matmul that sums K interleaved C-blocks — keeps the
    big intermediate 2-D ([B, K·C]) instead of [B, K, C] (tiling discipline)."""
    S = np.zeros((K * C, C), np.float32)
    for k in range(K):
        for c in range(C):
            S[k * C + c, c] = 1.0
    return jnp.asarray(S)


def _corner_sum_matrix(C: int):
    return _fold_matrix(4, C)


def _pack_plane(tblock, R: int, C: int, S: int):
    """One plane [R·R, C] → overlapping patch rows [(R−1)·nv, 2(S+1)C].

    Packed row (k, m) holds the 2×(S+1) texel patch T[k:k+2, mS:mS+S+1]
    flattened, so any bilinear corner quad (u0, v0) lives entirely in the
    single row (u0, v0 // S).  This turns the 4 narrow gather rows per plane
    into ONE wide row: the TPU gather unit is row-issue-bound (~12-18 ns/row
    regardless of width up to ~128 lanes, docs/PERF.md), so fewer, wider rows
    are strictly faster.  Costs 2·(S+1)/S ≈ 2.3× table bytes, built on the
    fly from the logical table (pure slices/concats — BW-cheap)."""
    nv = -(-(R - 1) // S)
    T = tblock.reshape(R, R, C)
    T = jnp.pad(T, ((0, 0), (0, nv * S + 1 - R), (0, 0)))

    def windows(Tu):
        main = Tu[:, :nv * S].reshape(R - 1, nv, S, C)
        nxt = Tu[:, S::S][:, :nv].reshape(R - 1, nv, 1, C)
        return jnp.concatenate([main, nxt], axis=2).reshape(
            R - 1, nv, (S + 1) * C)

    packed = jnp.concatenate([windows(T[:-1]), windows(T[1:])], axis=-1)
    return packed.reshape((R - 1) * nv, 2 * (S + 1) * C), nv


def _encode_packed(x01, table, spec: TriplaneSpec, want_vals: bool = False):
    """Forward via packed single-row gathers (the fast path used under the
    matmul-backward custom_vjp; numerically identical to :func:`_encode_impl`
    up to matmul precision).

    Each level packs and extracts at its OWN width ``channels_at(l)`` (the
    table block is column-sliced before packing): narrow fine levels both
    shave the wide-row gather penalty (256-ch rows gather at ~21 ns vs
    ~18 ns ≤128-ch, docs/PERF.md) and halve the pack/extract traffic."""
    S = spec.pack_span
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, 3).astype(jnp.float32)
    B = x.shape[0]

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)
    iota = jnp.arange(S + 1, dtype=jnp.int32)[None, :]

    outs, vals_all = [], []
    for k, (idx, w, fu, fv, u0, v0, _ab, R) in enumerate(_corner_data(x, spec)):
        C = spec.channels_at(k // 3)
        S4 = _corner_sum_matrix(C)
        fold = _fold_matrix(S + 1, C)
        base = int(spec.plane_offsets.flatten()[k])
        tblock = jax.lax.slice_in_dim(table, base, base + R * R, axis=0)
        if C < table.shape[1]:
            tblock = tblock[:, :C]
        if spec.fwd_bf16:
            tblock = tblock.astype(jnp.bfloat16)
        packed, nv = _pack_plane(tblock, R, C, S)

        m = v0 // S
        q = v0 - m * S                                     # in [0, S−1]
        rows = jnp.take(packed, u0 * nv + m, axis=0)       # [B, 2(S+1)C]
        rows = rows.astype(jnp.float32)
        half = (S + 1) * C
        sel0 = (iota == q[:, None]).astype(jnp.float32)    # [B, S+1]
        sel1 = (iota == q[:, None] + 1).astype(jnp.float32)

        def pick(row_half, sel):
            return jnp.dot(row_half * jnp.repeat(sel, C, axis=1), fold,
                           preferred_element_type=jnp.float32)

        r_u0, r_u1 = rows[:, :half], rows[:, half:]
        # corner order matches _corner_data: (u,v) (u,v+1) (u+1,v) (u+1,v+1)
        vals = jnp.concatenate(
            [pick(r_u0, sel0), pick(r_u0, sel1),
             pick(r_u1, sel0), pick(r_u1, sel1)], axis=1)  # [B, 4C]
        if want_vals:
            vals_all.append(vals)
        prod = vals * jnp.repeat(w, C, axis=1)
        outs.append(jnp.dot(prod, S4, preferred_element_type=jnp.float32))

    out = jnp.concatenate(outs, axis=-1).astype(table.dtype)
    out = jnp.where(oob, jnp.zeros_like(out), out)
    out = out.reshape(*prefix, spec.output_dim)
    if want_vals:
        return out, vals_all, oob
    return out


def _encode_impl(x01, table, spec: TriplaneSpec, want_vals: bool = False):
    C = spec.max_channels
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, 3).astype(jnp.float32)
    B = x.shape[0]

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)  # [B, 1]
    S = _corner_sum_matrix(C)

    outs, vals_all = [], []
    for k, (idx, w, *_rest) in enumerate(_corner_data(x, spec)):
        Cl = spec.channels_at(k // 3)
        vals = jnp.take(table, idx.reshape(-1), axis=0)            # [B*4, C]
        vals = vals.reshape(B, 4 * C).astype(jnp.float32)
        if want_vals:
            vals_all.append(vals)
        prod = vals * jnp.repeat(w, C, axis=1)                     # [B, 4C]
        full = jnp.dot(prod, S, preferred_element_type=jnp.float32)
        outs.append(full if Cl == C else full[:, :Cl])

    out = jnp.concatenate(outs, axis=-1).astype(table.dtype)
    out = jnp.where(oob, jnp.zeros_like(out), out)
    out = out.reshape(*prefix, spec.output_dim)
    if want_vals:
        return out, vals_all, oob
    return out


def _plane_dtable(u0, v0, fu, fv, g, R, C, chunk, use_bf16):
    """Scatter-free table gradient for one plane:
    dT[u, v*C + c] = Σ_b U[b, u] V[b, v] g[b, c], as chunked MXU matmuls.

    Returns dT flattened to [R*R, C].
    """
    B = g.shape[0]
    Bc = min(chunk, B)
    n_chunks = -(-B // Bc)
    pad = n_chunks * Bc - B
    if pad:
        # padded rows carry zero gradient → contribute nothing
        u0 = jnp.pad(u0, (0, pad))
        v0 = jnp.pad(v0, (0, pad))
        fu = jnp.pad(fu, (0, pad))
        fv = jnp.pad(fv, (0, pad))
        g = jnp.pad(g, ((0, pad), (0, 0)))

    mm_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    iota = jnp.arange(R, dtype=jnp.int32)[None, :]                 # [1, R]

    def body(i, acc):
        sl = lambda t: jax.lax.dynamic_slice_in_dim(t, i * Bc, Bc, 0)
        u0c, v0c, fuc, fvc, gc = sl(u0), sl(v0), sl(fu), sl(fv), sl(g)
        # 2-nonzero bilinear weight matrices, built on the VPU
        U = ((iota == u0c[:, None]).astype(jnp.float32) * (1 - fuc)[:, None]
             + (iota == u0c[:, None] + 1).astype(jnp.float32) * fuc[:, None])
        V = ((iota == v0c[:, None]).astype(jnp.float32) * (1 - fvc)[:, None]
             + (iota == v0c[:, None] + 1).astype(jnp.float32) * fvc[:, None])
        W = (V[:, :, None] * gc[:, None, :]).reshape(Bc, R * C)    # [Bc, R*C]
        part = jax.lax.dot_general(
            U.astype(mm_dtype), W.astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),            # Uᵀ @ W
            preferred_element_type=jnp.float32,
        )                                                          # [R, R*C]
        return acc + part

    dT = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((R, R * C), jnp.float32))
    return dT.reshape(R * R, C)


def _rank_exclusive(A):
    """Exclusive per-row rank of 0/1 lanes: rank[..., b, s] = Σ_{s'<s}
    A[..., b, s'] — as ONE strict-upper-triangular MXU matmul instead of
    ``jnp.cumsum`` (whose multi-pass scan lowering re-materializes the
    operand every pass and dominated the whole banded path when measured;
    counting 0/1 with f32 accumulation is exact to 2²⁴, far above any
    sub-block length used here).  The scan axis is LAST so the bucket axis
    (nb, typically 16) never sits minor and never lane-pads 8×."""
    S = A.shape[-1]
    io = jnp.arange(S, dtype=jnp.int32)
    # f32 operands: the matmuls are tiny (≤134 MFLOP/chunk) and XLA:CPU has
    # no bf16 batched-dot thunk (tests + the multichip dryrun run on CPU)
    triu = (io[:, None] < io[None, :]).astype(jnp.float32)     # [S', S]
    return jnp.einsum("...bt,ts->...bs", A.astype(jnp.float32), triu,
                      preferred_element_type=jnp.float32)


def _plane_dtable_banded(u0, v0, fu, fv, g, R, C, chunk, use_bf16,
                         bw, sub, q, q2):
    """Bucket-compacted BANDED table gradient — same contract as
    :func:`_plane_dtable`, ~R/(bw+1)× fewer matmul FLOPs and a small
    Kronecker build instead of the full-width ``V ⊗ g`` HBM wall.

    The u axis splits into ``nb = R // bw`` buckets (band rows ``bw+1``:
    ``u0+1`` of the bucket's last cell lands on the next bucket's first row,
    folded back in the unpack).  Per sub-block of ``sub`` samples, samples
    compact into per-bucket slots with the same one-hot-matmul trick as the
    march/ray compaction — exact 0/1 products on the narrow PAYLOAD
    (u0, v0, fu, fv, g), not on a wide Kronecker.  Per bucket the one-hot
    bilinear ``V`` becomes the LEFT operand and the RHS is only
    ``(bw+1)·C`` wide::

        dT_band[h, v, ul·C + c] = V_hᵀ @ (U_lo ⊗ g)_h        # [R, (bw+1)C]

    Everything stays in BAND layout — there is no [R, R·C] accumulator:

    * sub-block overflow (slot ≥ q) reroutes EXACTLY through a chunk-wide
      second-level compaction into ``q2`` extra slots per bucket,
      concatenated onto the same phase-2 ``m`` axis;
    * if a bucket's chunk-wide overflow exceeds ``q2`` (extreme skew),
      ``lax.cond`` sends the whole chunk through the full-width matmul and
      reshapes its [R, R·C] result INTO band layout (u = h·bw + ul is a
      bijection) — the gradient is exact under every sample skew (pinned
      vs scatter autodiff in tests/test_triplane.py);
    * one-hot/bilinear factors are built directly in the matmul dtype —
      no f32 intermediate + cast round-trip (HBM discipline).

    ``use_bf16`` note: the payload rides a bf16 matmul, which is exact for
    the integer corners only up to 512 — callers gate banded on R ≤ 512
    when ``use_bf16`` (the flagship's fine plane is 512).
    """
    B = g.shape[0]
    Bc = min(chunk, B)
    if Bc % sub:
        sub = Bc
    nsub = Bc // sub
    nb = R // bw
    band = bw + 1
    m1 = nsub * q
    n_chunks = -(-B // Bc)
    pad = n_chunks * Bc - B
    if pad:
        # padded rows carry zero gradient → contribute nothing (they do
        # consume bucket-0 slots; the overflow reroute keeps exactness)
        u0 = jnp.pad(u0, (0, pad))
        v0 = jnp.pad(v0, (0, pad))
        fu = jnp.pad(fu, (0, pad))
        fv = jnp.pad(fv, (0, pad))
        g = jnp.pad(g, ((0, pad), (0, 0)))

    mm_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    pw = 4 + C                         # payload: u0, v0, fu, fv, g[C]
    iota_cols = jnp.arange(nb * q, dtype=jnp.int32)[None, None, :]
    iota_cols2 = jnp.arange(nb * q2, dtype=jnp.int32)[None, :]
    iota_band = jnp.arange(band, dtype=jnp.int32)
    iota_R = jnp.arange(R, dtype=jnp.int32)
    iota_nb = jnp.arange(nb, dtype=jnp.int32)
    hoff = iota_nb[:, None] * bw

    def _bilinear_onehot(idx, frac, width_iota):
        # built directly in the matmul dtype (exact: 0/1 times a rounded
        # fraction — the fraction would be rounded at the dot anyway)
        f = frac.astype(mm_dtype)[..., None]
        return ((width_iota == idx[..., None]).astype(mm_dtype) * (1 - f)
                + (width_iota == idx[..., None] + 1).astype(mm_dtype) * f)

    def body(i, carry):
        acc_band = carry
        sl = lambda t: jax.lax.dynamic_slice_in_dim(t, i * Bc, Bc, 0)
        u0c, v0c, fuc, fvc, gc = sl(u0), sl(v0), sl(fu), sl(fv), sl(g)

        # bucket / slot bookkeeping (MXU rank matmuls, _rank_exclusive —
        # cumsum's scan lowering dominated the whole path when measured);
        # bucket tensors live as [nsub, nb, sub] — sub minor, no lane pad
        h = (u0c // bw).reshape(nsub, sub)
        A = (h[:, None, :] == iota_nb[None, :, None]
             ).astype(jnp.float32)                         # [nsub, nb, sub]
        rank = _rank_exclusive(A)
        slot = jnp.sum(A * rank, axis=1).astype(jnp.int32)  # [nsub, sub]
        keep = slot < q
        n_ov1 = jnp.sum((~keep).astype(jnp.int32))

        # chunk-wide second level over the sub-block overflow: per-sub-block
        # rank + exclusive block offsets (two-level scan, both on the MXU)
        hflat = h.reshape(Bc)
        ovf = (~keep).reshape(Bc)
        A2 = ((h[:, None, :] == iota_nb[None, :, None])
              & (~keep)[:, None, :]).astype(jnp.float32)   # [nsub, nb, sub]
        r2_local = _rank_exclusive(A2)
        tot2 = jnp.sum(A2, axis=-1)                        # [nsub, nb]
        off2 = _rank_exclusive(tot2.T[None])[0].T          # [nsub, nb]
        rank2 = r2_local + off2[:, :, None]
        slot2 = (jnp.sum(A2 * rank2, axis=1)
                 .reshape(Bc).astype(jnp.int32))
        keep2 = ovf & (slot2 < q2)
        n_ov2 = jnp.sum((ovf & ~keep2).astype(jnp.int32))

        P = jnp.stack(
            [u0c.astype(jnp.float32), v0c.astype(jnp.float32), fuc, fvc],
            axis=-1)
        P = jnp.concatenate([P, gc], axis=-1)              # [Bc, pw]

        def banded_branch(_):
            col = h * q + slot
            M = ((iota_cols == col[:, :, None]) & keep[:, :, None]
                 ).astype(mm_dtype)                        # [nsub, sub, nb*q]
            Pt = P.reshape(nsub, sub, pw).transpose(0, 2, 1).astype(mm_dtype)
            Pc = jax.lax.dot_general(
                Pt, M, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # [nsub, pw, nb*q]
            Pc = (Pc.reshape(nsub, pw, nb, q)
                  .transpose(2, 0, 3, 1).reshape(nb, m1, pw))

            def _second_level(_):
                col2 = hflat * q2 + slot2
                M2 = ((iota_cols2 == col2[:, None]) & keep2[:, None]
                      ).astype(mm_dtype)                   # [Bc, nb*q2]
                Pc2 = jax.lax.dot_general(
                    P.T.astype(mm_dtype), M2,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [pw, nb*q2]
                return Pc2.reshape(pw, nb, q2).transpose(1, 2, 0)

            # most chunks have zero sub-block overflow (q sits ≳3σ above
            # the per-sub-block bucket mean) — skip the M2 build+dot there
            Pc2 = jax.lax.cond(
                n_ov1 > 0, _second_level,
                lambda _: jnp.zeros((nb, q2, pw), jnp.float32), None)
            Pcat = jnp.concatenate([Pc, Pc2], axis=1)      # [nb, m, pw]

            u0b = Pcat[..., 0].astype(jnp.int32)
            v0b = Pcat[..., 1].astype(jnp.int32)
            fub, fvb = Pcat[..., 2], Pcat[..., 3]
            gb = Pcat[..., 4:]
            ul = u0b - hoff                                # [nb, m]

            # fold the v-bilinear weights INTO the (narrow) RHS so the wide
            # [nb, m, R] factor is a single-compare 0/1 one-hot — the
            # bilinear build's two compares + two multiplies on the
            # R-wide tensor were the phase-2 VPU wall when measured
            V01 = (iota_R[None, None, :] == v0b[..., None]).astype(mm_dtype)
            Ulo = _bilinear_onehot(ul, fub, iota_band[None, None, :])
            # Kronecker via repeat·tile, NOT a 4-D broadcast-multiply: the
            # [nb, m, band, C] intermediate pads its C-minor 16× (TPU tile
            # (8,128)) and measured 4.5× slower than the full-width
            # baseline it replaces (layout discipline, ops/grid.py)
            RHS = (jnp.repeat(Ulo, C, axis=-1)
                   * jnp.tile(gb.astype(mm_dtype), (1, 1, band)))
            fvm = fvb.astype(mm_dtype)[..., None]
            RHS2 = jnp.concatenate([RHS * (1 - fvm), RHS * fvm], axis=-1)
            out = jax.lax.dot_general(
                V01, RHS2, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # [nb, R, 2*band*C]
            bc = band * C
            # the fv half belongs to row v0+1: shift down one v-row
            return out[..., :bc] + jnp.concatenate(
                [jnp.zeros_like(out[:, :1, bc:]), out[:, :-1, bc:]], axis=1)

        def full_branch(_):
            # second level exhausted (extreme skew): whole chunk through
            # the full-width matmul, result reshaped INTO band layout
            U = _bilinear_onehot(u0c, fuc, iota_R[None, :])
            Vf = _bilinear_onehot(v0c, fvc, iota_R[None, :])
            W = (jnp.repeat(Vf, C, axis=-1)
                 * jnp.tile(gc.astype(mm_dtype), (1, R)))
            part = jax.lax.dot_general(
                U, W, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [R, R*C]
            pb = part.reshape(nb, bw, R, C)
            pb = jnp.concatenate(
                [pb, jnp.zeros((nb, 1, R, C), jnp.float32)], axis=1)
            return pb.transpose(0, 2, 1, 3).reshape(nb, R, band * C)

        part_band = jax.lax.cond(
            n_ov2 == 0, banded_branch, full_branch, None)
        return acc_band + part_band

    acc_band = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((nb, R, band * C), jnp.float32))

    # unpack band (h, v, ul, c) → absolute (u = h·bw + ul, v, c); each
    # bucket's ul = bw row is the next bucket's u-row 0 (fold back)
    bandT = (acc_band.reshape(nb, R, band, C)
             .transpose(0, 2, 1, 3))                       # [nb, band, R, C]
    main = bandT[:, :bw].reshape(R, R, C)
    spill = bandT[:, bw]                                   # [nb, R, C]
    main = main.at[bw::bw].add(spill[:-1])
    return main.reshape(R * R, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _encode_mm(x01, table, spec: TriplaneSpec):
    return _encode_packed(x01, table, spec)


def _encode_mm_fwd(x01, table, spec: TriplaneSpec):
    out, vals_all, oob = _encode_packed(x01, table, spec, want_vals=True)
    # zero-size dtype witness (a raw dtype is not a valid residual leaf)
    return out, (x01, vals_all, oob, jnp.zeros((0,), table.dtype))


def _encode_mm_bwd(spec: TriplaneSpec, res, g):
    x01, vals_all, oob, tdtype_witness = res
    tdtype = tdtype_witness.dtype
    Cmax = spec.max_channels
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, 3).astype(jnp.float32)
    B = x.shape[0]
    g = g.reshape(B, spec.output_dim).astype(jnp.float32)
    g = jnp.where(oob, 0.0, g)                                     # OOB: no grad

    corner = _corner_data(x, spec)
    # (level, plane) blocks are disjoint and laid out in iteration order, so
    # the flat-table gradient is a plain concatenation of per-plane blocks.
    dT_blocks = []
    dx = jnp.zeros((B, 3), jnp.float32)
    col = 0

    for k, (idx, w, fu, fv, u0, v0, (a, b), R) in enumerate(corner):
        Cl = spec.channels_at(k // 3)
        gk = g[:, col:col + Cl]                                    # [B, Cl]
        col += Cl
        # the matmul backward runs at the LEVEL's width Cl — this is where
        # per-level channels pay off (dT flops scale R²·Cl)
        banded_ok = (spec.bwd == "banded"
                     and R % spec.banded_bw == 0
                     and R // spec.banded_bw >= 2
                     # small planes: the per-chunk compaction machinery
                     # costs more than the full-width matmul it replaces
                     # (measured: banding the 128-level ADDED ~10 ms/step)
                     and R >= spec.banded_min_res
                     # bf16 payload matmul is integer-exact only to 512
                     and (not spec.mm_bf16 or R <= 512))
        if banded_ok:
            dT = _plane_dtable_banded(
                u0, v0, fu, fv, gk, R, Cl, spec.bwd_chunk, spec.mm_bf16,
                spec.banded_bw, spec.banded_sub, spec.banded_q,
                spec.banded_q2)
        else:
            dT = _plane_dtable(u0, v0, fu, fv, gk, R, Cl,
                               spec.bwd_chunk, spec.mm_bf16)
        if Cl < Cmax:
            dT = jnp.pad(dT, ((0, 0), (0, Cmax - Cl)))
        dT_blocks.append(dT)

        # input gradient from saved corner values (no re-gather):
        # out = Σ_ij fu_i fv_j vals_ij; vals layout [B, 4·Cl] = (00,01,10,11)
        vals = vals_all[k]
        cb = lambda i: vals[:, i * Cl:(i + 1) * Cl]
        v00, v01, v10, v11 = cb(0), cb(1), cb(2), cb(3)
        gv = lambda vv: jnp.sum(gk * vv, axis=-1)                  # [B]
        dfu = ((gv(v10) - gv(v00)) * (1 - fv) + (gv(v11) - gv(v01)) * fv)
        dfv = ((gv(v01) - gv(v00)) * (1 - fu) + (gv(v11) - gv(v10)) * fu)
        dx = dx.at[:, a].add(dfu * (R - 1))
        dx = dx.at[:, b].add(dfv * (R - 1))

    dx = jnp.where(oob, 0.0, dx).reshape(*prefix, 3)
    dtable = jnp.concatenate(dT_blocks, axis=0)
    return dx, dtable.astype(tdtype)


_encode_mm.defvjp(_encode_mm_fwd, _encode_mm_bwd)


def triplane_encode(x01, table, spec: TriplaneSpec):
    """Encode positions through the tri-plane field.

    Args:
      x01:   [..., 3] float32 positions in [0, 1].
      table: [table_size, channels] flat plane stack (see plane_offsets).
      spec:  static TriplaneSpec.

    Returns:
      [..., output_dim] features (table dtype): per level, the XY/XZ/YZ plane
      features concatenated.
    """
    if spec.bwd in ("matmul", "banded"):
        return _encode_mm(x01, table, spec)
    return _encode_impl(x01, table, spec)


def triplane_encode_reference(x01, table, spec: TriplaneSpec):
    """Slow per-point NumPy oracle for unit tests."""
    x = np.asarray(x01, np.float64).reshape(-1, 3)
    tab = np.asarray(table, np.float64)
    B = x.shape[0]
    out = np.zeros((B, spec.output_dim), np.float64)
    for bi in range(B):
        if np.any(x[bi] < 0) or np.any(x[bi] > 1):
            continue
        col = 0
        for li, R in enumerate(spec.resolutions):
            C = spec.channels_at(li)
            pos = x[bi] * (R - 1)
            p0 = np.clip(np.floor(pos), 0, R - 2).astype(np.int64)
            f = pos - p0
            for pi, (a, b) in enumerate(_PLANES):
                base = int(spec.plane_offsets[li, pi])
                u0, v0 = p0[a], p0[b]
                fu, fv = f[a], f[b]
                acc = np.zeros(C)
                for i in range(2):
                    for j in range(2):
                        w = (fu if i else 1 - fu) * (fv if j else 1 - fv)
                        acc += w * tab[base + (u0 + i) * R + (v0 + j), :C]
                out[bi, col:col + C] = acc
                col += C
    return out
