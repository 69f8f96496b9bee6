"""On-chip perf dissection of the occupancy fast-path train step.

Measures, per config: full train step, march-only, encode-fwd-only, full
fwd (loss eval), bwd-only residual, plus compaction-strategy micros
(argsort vs top_k).  Feeds docs/PERF.md — run on the real chip:

    python scripts/perf_probe.py [--rays 4096] [--cfg small|big|both]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--cfg", default="both")
    ap.add_argument("--spd", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import RenderSettings, render_rays_fast
    from customnerf_tpu.ops.occupancy import (init_state, march_rays_occupancy,
                                              state_from_grid)
    from customnerf_tpu.ops.triplane import TriplaneSpec, triplane_encode

    n_rays, spd = args.rays, args.spd
    rng = np.random.RandomState(0)
    o = jnp.asarray(np.tile([[0.0, 0.0, -1.5]], (n_rays, 1)).astype(np.float32))
    d = rng.randn(n_rays, 3).astype(np.float32) * 0.1 + np.asarray(
        [0, 0, 1], np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    target = jnp.asarray(rng.rand(n_rays, 3).astype(np.float32))
    tmask = jnp.asarray((rng.rand(n_rays) > 0.5).astype(np.float32))

    occ = init_state(cascade=2, grid_size=128)
    dens = (rng.rand(*occ.density_grid.shape) > 0.5).astype(np.float32) * 100.0
    occ = state_from_grid(dens, 1.0, density_thresh=10.0, grid_size=128)

    s = RenderSettings(bound=2.0, num_steps=64, upsample_steps=0,
                       soft_mask=True)
    tx = optax.adam(5e-4, b1=0.9, b2=0.99, eps=1e-15)

    def timeit(fn, *a, reps=3, scale=1):
        out = fn(*a)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / (reps * scale) * 1e3  # ms

    # ---------------- compaction micro: argsort vs top_k -----------------
    T, K = 256, 64
    keep = jnp.asarray(rng.rand(n_rays, T) > 0.7)
    zz = jnp.asarray(np.sort(rng.rand(n_rays, T)).astype(np.float32))

    @jax.jit
    def compact_argsort(keep, z):
        penalty = jnp.where(keep, 0, T)
        order = jnp.argsort(penalty + jnp.arange(T)[None, :], axis=-1)[:, :K]
        return (jnp.take_along_axis(z, order, axis=-1),
                jnp.take_along_axis(keep, order, axis=-1))

    @jax.jit
    def compact_topk(keep, z):
        penalty = jnp.where(keep, 0, T)
        neg = -(penalty + jnp.arange(T, dtype=jnp.int32)[None, :])
        _, order = jax.lax.top_k(neg, K)
        return (jnp.take_along_axis(z, order, axis=-1),
                jnp.take_along_axis(keep, order, axis=-1))

    a_ms = timeit(compact_argsort, keep, zz, reps=20)
    t_ms = timeit(compact_topk, keep, zz, reps=20)
    za, va = compact_argsort(keep, zz)
    zt, vt = compact_topk(keep, zz)
    same = bool(jnp.all(za == zt)) and bool(jnp.all(va == vt))
    print(f"[probe] compaction [{n_rays},{T}]->{K}: argsort {a_ms:.2f} ms, "
          f"top_k {t_ms:.2f} ms (equal={same})", file=sys.stderr)

    # ---------------- march only -----------------------------------------
    @jax.jit
    def march_only(key):
        nears = jnp.full((n_rays,), 0.05)
        fars = jnp.full((n_rays,), 3.0)
        return march_rays_occupancy(occ, o, d, nears, fars, key, 2.0,
                                    n_coarse=128, n_keep=64, perturb=True)

    m_ms = timeit(march_only, jax.random.PRNGKey(0), reps=10)
    print(f"[probe] march-only (n_coarse=128): {m_ms:.2f} ms", file=sys.stderr)

    # ---------------- per-config step dissection --------------------------
    cfgs = []
    if args.cfg in ("small", "both"):
        cfgs.append(("small(64,256)x16", TriplaneSpec(resolutions=(64, 256))))
    if args.cfg in ("big", "both"):
        cfgs.append(("big(128,512)x16", TriplaneSpec(resolutions=(128, 512))))
    if args.cfg in ("mixed", "both"):
        cfgs.append(("mixed(128,512)x(16,8)",
                     TriplaneSpec(resolutions=(128, 512), channels=(16, 8))))

    B_samples = n_rays * 64
    xs = jnp.asarray(rng.rand(B_samples, 3).astype(np.float32))

    for tag, spec in cfgs:
        field = NeRFField(FieldConfig(bound=2.0, grid=spec,
                                      compute_dtype="bfloat16"))
        params = field.init_params(jax.random.PRNGKey(0))

        # encode fwd only
        table = params["params"]["grid_table"]

        @jax.jit
        def enc_fwd(tbl):
            return triplane_encode(xs, tbl, spec).sum()

        e_ms = timeit(enc_fwd, table, reps=5)

        # encode fwd+bwd only
        @jax.jit
        def enc_grad(tbl):
            return jax.grad(
                lambda t: jnp.sum(triplane_encode(xs, t, spec)))(tbl)

        eg_ms = timeit(enc_grad, table, reps=5)

        # full loss fwd only
        def loss_fn(p, key):
            out = render_rays_fast(field, p, o, d, occ, key, s,
                                   n_coarse=128, n_keep=64,
                                   train=True, perturb=True)
            return (jnp.mean((out["image"] - target) ** 2)
                    + 0.01 * jnp.mean((out["render_mask"][..., 0] - tmask) ** 2))

        fwd_only = jax.jit(loss_fn)
        f_ms = timeit(fwd_only, params, jax.random.PRNGKey(1), reps=5)

        # full train step (scan spd)
        opt_state = tx.init(params)

        @jax.jit
        def step_scan(p, os_, keys):
            def body(carry, key):
                p, os_ = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, key)
                up, os_ = tx.update(grads, os_)
                return (optax.apply_updates(p, up), os_), loss
            (p, os_), losses = jax.lax.scan(body, (p, os_), keys)
            return p, os_, losses[-1]

        keys = jax.random.split(jax.random.PRNGKey(2), spd)
        st_ms = timeit(step_scan, params, opt_state, keys, reps=2, scale=spd)
        rps = n_rays / (st_ms / 1e3)
        print(f"[probe] {tag}: encode-fwd {e_ms:.1f} ms, encode-f+b "
              f"{eg_ms:.1f} ms, loss-fwd {f_ms:.1f} ms, full-step "
              f"{st_ms:.1f} ms → {rps:,.0f} rays/s", file=sys.stderr)


if __name__ == "__main__":
    main()
