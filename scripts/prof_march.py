"""Decompose march_rays_occupancy on chip (perf tooling, docs/PERF.md).

Stages timed in isolation (each under a lax.scan of SPD iterations to
amortize tunnel dispatch latency):
  a) candidate xyz + occupancy_lookup (the bitfield gather)
  b) a + cumsum/rank/bucket keep logic
  c) full march (adds the one-hot z-compaction matmul)
  d) occupancy gather ALONE on precomputed flat bit indices (pure gather)

Usage: python scripts/prof_march.py [n_rays ...]   (default 16384)
Env:   PM_KEEP=40 PM_COARSE=80 PM_SPD=8
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(globals().get("__file__", "scripts/x")))))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/customnerf_jax")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from customnerf_tpu.ops.occupancy import (init_state, march_rays_occupancy,
                                              occupancy_lookup,
                                              state_from_grid)
    from customnerf_tpu.ops.ray import near_far_from_aabb

    n_keep = int(os.environ.get("PM_KEEP", 40))
    n_coarse = int(os.environ.get("PM_COARSE", 80))
    spd = int(os.environ.get("PM_SPD", 8))
    ray_counts = [int(a) for a in sys.argv[1:]] or [16384]

    rng = np.random.RandomState(0)
    g0 = init_state(cascade=2, grid_size=128)
    dens = (rng.rand(*g0.density_grid.shape) < 0.128).astype(np.float32) * 100
    occ = state_from_grid(dens, 1.0, density_thresh=10.0,
                          grid_size=g0.grid_size)
    aabb = jnp.asarray([-2.0] * 3 + [2.0] * 3, jnp.float32)
    bound = 2.0

    def rays(n):
        r = np.random.RandomState(0)
        o = np.tile(np.asarray([[0.0, 0.0, -1.5]], np.float32), (n, 1))
        d = r.randn(n, 3).astype(np.float32) * 0.1 + np.asarray(
            [0, 0, 1], np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(o), jnp.asarray(d)

    def timed(tag, body, n):
        @jax.jit
        def dispatch(keys):
            def step(c, k):
                return c + body(k).astype(jnp.float32), None
            c, _ = jax.lax.scan(step, 0.0, keys)
            return c

        key = jax.random.PRNGKey(0)

        def keys():
            nonlocal key
            key, *subs = jax.random.split(key, spd + 1)
            return jnp.stack(subs)

        _ = float(dispatch(keys()))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            _ = float(dispatch(keys()))
        dt = (time.perf_counter() - t0) / (iters * spd)
        print(f"[prof-march] {tag:44s} @{n:6d} rays: {dt * 1e3:7.2f} ms "
              f"({n / dt:,.0f} rays/s)")
        return dt

    for n in ray_counts:
        o, d = rays(n)
        nears, fars = near_far_from_aabb(o, d, aabb, 0.05)
        miss = nears >= fars
        nz = jnp.where(miss, 0.0, nears)
        fz = jnp.where(miss, 1.0, fars)
        u = (jnp.arange(n_coarse, dtype=jnp.float32) + 0.5) / n_coarse

        def stage_a(k):
            z = nz[:, None] + (fz - nz)[:, None] * u[None, :]
            dz = (fz - nz)[:, None] / n_coarse
            z = z + (jax.random.uniform(k, z.shape) - 0.5) * dz
            xyz = o[:, None, :] + d[:, None, :] * z[..., None]
            occb = occupancy_lookup(occ, xyz, bound)
            return occb.sum() + z.mean()

        def stage_b(k):
            z = nz[:, None] + (fz - nz)[:, None] * u[None, :]
            dz = (fz - nz)[:, None] / n_coarse
            z = z + (jax.random.uniform(k, z.shape) - 0.5) * dz
            xyz = o[:, None, :] + d[:, None, :] * z[..., None]
            occb = occupancy_lookup(occ, xyz, bound)
            occ_i = occb.astype(jnp.int32)
            count = jnp.cumsum(occ_i, axis=-1)
            n_occ = count[:, -1:]
            rank = count - occ_i
            scale = jnp.maximum(n_occ, n_keep)
            bucket = (rank * n_keep) // scale
            prev = jnp.where(rank > 0, ((rank - 1) * n_keep) // scale, -1)
            keep = occb & (bucket != prev)
            return keep.sum() + z.mean()

        def stage_c(k):
            z, valid, dt_scale = march_rays_occupancy(
                occ, o, d, nz, fz, k, bound, n_coarse=n_coarse,
                n_keep=n_keep, perturb=True)
            return z.mean() + valid.sum().astype(jnp.float32) + dt_scale.mean()

        # pure gather on random precomputed bit indices (jitter via key so
        # the scan body is not loop-invariant)
        nbits = occ.bitfield.shape[0] * 8

        def stage_d(k):
            bit = jax.random.randint(k, (n, n_coarse), 0, nbits)
            byte = jnp.take(occ.bitfield, bit // 8, axis=0)
            b = (byte >> (bit % 8).astype(jnp.uint8)) & jnp.uint8(1)
            return b.sum()

        ta = timed("a: xyz + occupancy_lookup", stage_a, n)
        tb = timed("b: a + keep logic (cumsum/bucket)", stage_b, n)
        tc = timed("c: full march (+ one-hot z compaction)", stage_c, n)
        td = timed("d: pure bitfield gather (random bits)", stage_d, n)
        print(f"[prof-march] split @{n}: lookup {ta * 1e3:.2f} | "
              f"keep {(tb - ta) * 1e3:.2f} | onehot-z {(tc - tb) * 1e3:.2f} | "
              f"total {tc * 1e3:.2f} ms | pure-gather {td * 1e3:.2f} "
              f"({td / (n * n_coarse) * 1e9:.1f} ns/row)")


if __name__ == "__main__":
    main()
