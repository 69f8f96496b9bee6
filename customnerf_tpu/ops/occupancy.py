"""Occupancy grid: multi-cascade density grid + TPU-native empty-space skip.

Replaces the reference CUDA occupancy machinery (``nerf/renderer.py:1658-1717``
``update_extra_state`` + the two-pass compaction march
``raymarching/src/raymarching.cu:312-480``) with a static-shape design:

  * state: ``density_grid`` [CAS, 128³] fp32 with EMA ``max(0.95·g, new)``
    refresh from jittered cell-center density queries, occupancy threshold
    ``min(mean_density, density_thresh)`` (renderer.py:1700-1708), plus a
    packed uint8 bitfield kept for checkpoint parity.
  * march: instead of ragged atomic compaction, every ray gets ``n_coarse``
    stratified candidates, a cheap occupancy gather marks live ones, and a
    masked stable sort compacts the first ``n_keep`` live samples into a
    fixed [N, n_keep] slab (overflow drops samples — the reference's CUDA
    kernel drops on buffer overflow too, raymarching.cu:416).  The expensive
    field MLP then runs only on the slab.  Deterministic, no atomics
    (SURVEY.md §5.2 improvement note).

Cascades follow instant-ngp: cascade c spans [-2^c, 2^c]; a point lands in
the smallest cascade containing it (``mip_from_pos``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

GRID_SIZE = 128


# during the first WARMUP_UPDATES grid refreshes every in-bounds cell counts
# as occupied — a cold grid only marks the init density blob, so geometry
# outside it would never receive samples (bootstrap deadlock)
WARMUP_UPDATES = 4


@dataclass
class OccupancyState:
    """Pytree of grid state (grid_size is static aux data)."""

    density_grid: jnp.ndarray   # [CAS, grid_size**3] fp32
    bitfield: jnp.ndarray       # [CAS * grid_size**3 // 8] uint8 (parity)
    mean_density: jnp.ndarray   # scalar f32
    iter_density: jnp.ndarray = None  # scalar i32 (traced: no retrace/update)
    grid_size: int = GRID_SIZE


def init_state(cascade: int, grid_size: int = GRID_SIZE) -> OccupancyState:
    n = grid_size ** 3
    return OccupancyState(
        density_grid=jnp.zeros((cascade, n), jnp.float32),
        bitfield=jnp.zeros((cascade * n // 8,), jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
        grid_size=grid_size,
    )


jax.tree_util.register_pytree_node(
    OccupancyState,
    lambda s: ((s.density_grid, s.bitfield, s.mean_density, s.iter_density),
               (s.grid_size,)),
    lambda aux, kids: OccupancyState(*kids, grid_size=aux[0]),
)


def _cell_centers(cascade_idx: int, bound: float, key, grid_size: int):
    """Jittered world-space centers of all cells in one cascade [G³, 3]."""
    g = grid_size
    idx = jnp.arange(g ** 3)
    z = idx % g
    y = (idx // g) % g
    x = idx // (g * g)
    coords = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)  # [G³,3]
    half = min(2.0 ** cascade_idx, bound)
    cell = 2.0 * half / g
    jitter = jax.random.uniform(key, coords.shape, minval=0.0, maxval=1.0)
    return (coords + jitter) * cell - half


def packbits(grid: jnp.ndarray, thresh) -> jnp.ndarray:
    """Grid [CAS, G³] → bitfield [CAS·G³/8] uint8, LSB-first per byte
    (matching the CUDA packbits bit order, raymarching.cu:268-289)."""
    occ = (grid > thresh).reshape(-1, 8).astype(jnp.uint8)
    shifts = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(occ * shifts, axis=-1).astype(jnp.uint8)


def state_from_grid(density_grid, mean_density, density_thresh: float,
                    iter_density: int = 10,
                    grid_size: int = GRID_SIZE) -> OccupancyState:
    """Build a consistent state from a raw density grid: the bitfield (the
    march's source of truth) is packed with the same threshold rule
    update_grid uses.  For tests/benches that synthesize grids directly."""
    density_grid = jnp.asarray(density_grid)
    mean_density = jnp.float32(mean_density)
    thresh = jnp.minimum(mean_density, density_thresh)
    return OccupancyState(
        density_grid=density_grid,
        bitfield=packbits(density_grid, thresh),
        mean_density=mean_density,
        iter_density=jnp.int32(iter_density),
        grid_size=grid_size,
    )


def update_grid(state: OccupancyState, density_fn, bound: float,
                density_thresh: float, key, decay: float = 0.95,
                chunk: int = 2 ** 16):
    """One EMA refresh of all cascades (renderer.py:1659-1717 semantics:
    full re-query with jitter, EMA max, mean over nonnegative cells).

    chunk bounds the per-call point count: grid-encode intermediates have
    tiny minor dims that TPU tiling pads to 128 lanes — querying all 128³
    cells at once materializes tens of GB (observed OOM at compile)."""
    cascade = state.density_grid.shape[0]
    grids = []
    for c in range(cascade):
        key, sub = jax.random.split(key)
        xyz = _cell_centers(c, bound, sub, state.grid_size)
        n = xyz.shape[0]
        if n <= chunk:
            sig = density_fn(xyz)
        else:
            # lax.map keeps ONE compiled chunk body instead of unrolling all
            # G³/chunk copies into the program (compile-time bloat on TPU)
            n_chunks = -(-n // chunk)
            pad = n_chunks * chunk - n
            if pad:
                xyz = jnp.concatenate([xyz, xyz[:pad]], axis=0)
            sig = jax.lax.map(density_fn,
                              xyz.reshape(n_chunks, chunk, 3)).reshape(-1)[:n]
        grids.append(sig)
    new = jnp.stack(grids)  # [CAS, G³]
    grid = jnp.maximum(state.density_grid * decay, new)
    mean_density = jnp.mean(jnp.clip(grid, 0.0, None))
    thresh = jnp.minimum(mean_density, density_thresh)
    return OccupancyState(
        density_grid=grid,
        bitfield=packbits(grid, thresh),
        mean_density=mean_density,
        iter_density=state.iter_density + 1,
        grid_size=state.grid_size,
    )


def occupancy_lookup(state: OccupancyState, xyz, bound: float):
    """xyz [..., 3] → bool occupied, via the cascade each point lives in.

    Thresholding happens at packbits time (update_grid/state_from_grid bake
    ``min(mean_density, density_thresh)`` into the bitfield); the lookup has
    no per-call threshold.

    Reads the packed BITFIELD (8 cells/byte, the reference's
    ``density_bitfield`` design, raymarching.cu:268-289) rather than the f32
    grid, and gathers it as WIDE rows: the TPU gather unit is row-issue
    bound, but 1-byte rows still cost ~11 ns/row while 128-byte rows from a
    small table cost ~5.4 ns (scripts/micro_bitrow.py, docs/PERF.md) — so
    the lookup views the byte table as [n/128, 32]-i32 rows (a free
    reshape+bitcast of the same bits) and selects the word in-register with
    an iota compare: 11.25 → 7.0 ns per candidate, bit-identical results.
    The march does one lookup per candidate, so this is the hot path."""
    cascade = state.density_grid.shape[0]
    g = state.grid_size
    ax = jnp.max(jnp.abs(xyz), axis=-1)
    # smallest cascade c with 2^c > |x|_inf.  cascade is tiny (1+ceil(log2
    # bound) ≤ ~3), so branchless compares beat per-point log2/exp2
    # transcendentals on the VPU — this lookup runs once per march candidate.
    mip = jnp.zeros(ax.shape, jnp.int32)
    half = jnp.full(ax.shape, min(1.0, bound), jnp.float32)
    for c in range(cascade - 1):
        above = ax > (2.0 ** c)
        mip = mip + above.astype(jnp.int32)
        half = jnp.where(above, min(2.0 ** (c + 1), bound), half)
    scaled = (xyz / (2.0 * half[..., None]) + 0.5) * g
    cell = jnp.clip(scaled.astype(jnp.int32), 0, g - 1)
    flat = cell[..., 0] * g * g + cell[..., 1] * g + cell[..., 2]
    bit = mip * (g ** 3) + flat
    n_bytes = state.bitfield.shape[0]
    if n_bytes % 128 == 0:
        # wide-row path: same bits viewed as [n/128, 32] i32 rows.  packbits
        # is LSB-first per byte and the bitcast is little-endian, so bit k of
        # word w covers global bit index row*1024 + w*32 + k directly.
        words = jax.lax.bitcast_convert_type(
            state.bitfield.reshape(-1, 4), jnp.int32).reshape(-1, 32)
        flatb = bit.reshape(-1)
        row = jnp.take(words, flatb // 1024, axis=0)          # [B, 32]
        word_in = ((flatb // 32) % 32).astype(jnp.int32)
        iota32 = jnp.arange(32, dtype=jnp.int32)[None, :]
        word = jnp.sum(jnp.where(iota32 == word_in[:, None], row, 0), axis=-1)
        b = jax.lax.shift_right_logical(word, flatb % 32) & 1
        occ_bit = b.reshape(bit.shape).astype(jnp.uint8)
    else:
        byte = state.bitfield[bit // 8]
        occ_bit = (byte >> (bit % 8).astype(jnp.uint8)) & jnp.uint8(1)
    inside = ax <= bound
    warmup = state.iter_density <= WARMUP_UPDATES
    return (warmup | (occ_bit > 0)) & inside


def march_rays_occupancy(
    state: OccupancyState,
    rays_o, rays_d,            # [N, 3]
    nears, fars,               # [N]
    key,
    bound: float,
    n_coarse: int = 256,
    n_keep: int = 64,
    perturb: bool = False,
):
    """Static-shape empty-space-skipping march.

    Returns (z [N, n_keep], valid [N, n_keep] bool, dt_scale [N, 1] f32):
    up to n_keep occupied stratified candidates per ray in depth order.

    When a ray crosses more than n_keep occupied candidates, they are
    subsampled with an even stride across the WHOLE occupied span — never
    truncated to the first n_keep, which would exhaust the budget before
    reaching surfaces behind fat occupancy regions (eval-render speckle).
    ``dt_scale`` is the per-ray stride (≥1): each kept sample then stands in
    for that many march steps, so compositing over ``dt·dt_scale`` keeps the
    quadrature correct (the CUDA march instead enlarges dt with distance,
    raymarching.cu:345-346 — same budget-bounding role, static-shape form).
    """
    N = rays_o.shape[0]
    u = (jnp.arange(n_coarse, dtype=jnp.float32) + 0.5) / n_coarse
    z = nears[:, None] + (fars - nears)[:, None] * u[None, :]  # [N, T]
    if perturb:
        dz = (fars - nears)[:, None] / n_coarse
        z = z + (jax.random.uniform(key, z.shape) - 0.5) * dz

    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    occ = occupancy_lookup(state, xyz, bound)  # [N, T]

    # even-stride subsample of occupied candidates (first of each of n_keep
    # equal rank-buckets) — keeps full-span coverage under a fixed budget
    occ_i = occ.astype(jnp.int32)
    count = jnp.cumsum(occ_i, axis=-1)                          # [N, T]
    n_occ = count[:, -1:]                                       # [N, 1]
    rank = count - occ_i                                        # 0-based, occupied slots
    scale = jnp.maximum(n_occ, n_keep)
    bucket = (rank * n_keep) // scale
    prev_bucket = jnp.where(rank > 0, ((rank - 1) * n_keep) // scale, -1)
    keep = occ & (bucket != prev_bucket)

    # stable compaction: kept candidates land in slots [0, n_kept) in depth
    # order.  Instead of a [N, T] argsort (7.3 ms at [4096, 256] — measured),
    # build the one-hot slot matrix and compact with ONE batched matmul
    # (1.7 ms, bit-identical): slot = rank-among-kept, M[b,t,k] = (slot==k ∧
    # keep), z_keep = M ᵀ·z.  The 0/1 × value products are exact in bf16 and
    # each output slot receives exactly one nonzero term, so this is not an
    # approximation.  Empty tail slots read 0 with valid=False (the renderer
    # pins them to `far` before compositing).
    slot = jnp.cumsum(keep.astype(jnp.int32), axis=-1) - 1     # [N, T]
    M = ((slot[..., None] == jnp.arange(n_keep)[None, None, :])
         & keep[..., None]).astype(jnp.bfloat16)               # [N, T, K]
    z_keep = jax.lax.dot_general(
        M, z.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # [N, K]
    valid = jnp.arange(n_keep)[None, :] < jnp.minimum(n_occ, n_keep)
    dt_scale = jnp.maximum(n_occ.astype(jnp.float32) / n_keep, 1.0)
    return z_keep, valid, dt_scale
