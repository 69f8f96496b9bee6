"""Attribute the flagship step's ~29 ms backward (round-5: largest opaque
stage after the fwd-rest decomposition).

The dT plane-table matmuls are ~12-13 ms (micro_dt.py); this script
attributes the rest by differencing full fwd+bwd against variants with
surgical ``stop_gradient`` cuts, all compiled in ONE process and
dispatched interleaved (same drift-defense as ab_layout.py):

  full        — the real step's value_and_grad (no Adam).
  no_table    — table params held constant via functools.partial closure
                cut: grads only for MLP params (kills dT matmuls + the
                packed-table-build VJP, keeps gather/encode VJP to xyz).
  no_field    — stop_gradient(σ, radiance): only the composite/loss VJP
                runs (no field backward at all).
  fwd_only    — forward alone (floor).

bwd_total = full − fwd_only;  composite VJP ≈ no_field − fwd_only;
field-to-features VJP ≈ no_table − no_field;  table VJP (dT + pack-build)
≈ full − no_table.

Usage:  python scripts/prof_bwd.py [n_rays]      (default 16384)
Env:    AB_REPS=5 AB_SPD=8 PROF_KEEP/FRAC/BLOCK/CHANNELS/RES
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

    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import (RenderSettings,
                                                render_rays_fast)
    from customnerf_tpu.ops.occupancy import init_state, state_from_grid
    from customnerf_tpu.ops.triplane import TriplaneSpec

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_keep = int(os.environ.get("PROF_KEEP", 40))
    frac = float(os.environ.get("PROF_FRAC", 0.4))
    block = int(os.environ.get("PROF_BLOCK", 32))
    spd = int(os.environ.get("AB_SPD", 8))
    reps = int(os.environ.get("AB_REPS", 5))
    chans = tuple(int(c) for c in
                  os.environ.get("PROF_CHANNELS", "16,8").split(","))
    res = tuple(int(r) for r in
                os.environ.get("PROF_RES", "128,512").split(","))
    n_coarse = 2 * n_keep

    tri = TriplaneSpec(resolutions=res, channels=chans, bwd="matmul",
                       pack_span=7, fwd_bf16=True)
    field = NeRFField(FieldConfig(bound=2.0, grid=tri,
                                  compute_dtype="bfloat16"))
    params = field.init_params(jax.random.PRNGKey(0))
    s = RenderSettings(bound=2.0, num_steps=64, upsample_steps=0,
                       soft_mask=True)

    rng = np.random.RandomState(0)
    g0 = init_state(cascade=2, grid_size=128)
    dens = (rng.rand(*g0.density_grid.shape) < 0.128).astype(np.float32) * 100
    occ = state_from_grid(dens, 1.0, density_thresh=10.0,
                          grid_size=g0.grid_size)

    r = np.random.RandomState(0)
    o = jnp.asarray(np.tile([[0.0, 0.0, -1.5]], (n, 1)).astype(np.float32))
    d = r.randn(n, 3).astype(np.float32) * 0.1 + np.asarray(
        [0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    target = jnp.asarray(r.rand(n, 3).astype(np.float32))
    tmask = jnp.asarray((r.rand(n) > 0.5).astype(np.float32))

    # split params into table leaves vs the rest (names: triplane tables
    # live under the grid module; cut = which subtree gets gradients)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    table_idx = [i for i, (path, _) in enumerate(flat)
                 if any("plane" in str(p).lower() or "grid" in str(p).lower()
                        for p in path)]
    print(f"[prof-bwd] {len(table_idx)}/{len(flat)} leaves are table/grid "
          f"({sum(flat[i][1].size for i in table_idx):,} of "
          f"{sum(l.size for _, l in flat):,} params)")

    def split(p):
        fl, td = jax.tree_util.tree_flatten(p)
        tab = [l for i, l in enumerate(fl) if i in set(table_idx)]
        oth = [l for i, l in enumerate(fl) if i not in set(table_idx)]
        return tab, oth, td

    tab0, oth0, td = split(params)

    def join(tab, oth):
        fl = []
        ti, oi = 0, 0
        for i in range(len(tab) + len(oth)):
            if i in set(table_idx):
                fl.append(tab[ti]); ti += 1
            else:
                fl.append(oth[oi]); oi += 1
        return jax.tree_util.tree_unflatten(td, fl)

    def loss_of(p, k, cut_field=False):
        if cut_field:
            fns = (lambda x, dd: tuple(
                jax.lax.stop_gradient(t)
                for t in field.apply(p, x, dd)),)
            out = render_rays_fast(field, p, o, d, occ, k, s,
                                   n_coarse=n_coarse, n_keep=n_keep,
                                   train=True, perturb=True,
                                   apply_fns=fns,
                                   compact_frac=frac, compact_block=block)
        else:
            out = render_rays_fast(field, p, o, d, occ, k, s,
                                   n_coarse=n_coarse, n_keep=n_keep,
                                   train=True, perturb=True,
                                   compact_frac=frac, compact_block=block)
        loss = jnp.mean((out["image"] - target) ** 2)
        loss += 0.01 * jnp.mean((out["render_mask"][..., 0] - tmask) ** 2)
        return loss

    def make(kind):
        if kind == "fwd_only":
            def body(k):
                return loss_of(params, k)
        elif kind == "full":
            def body(k):
                l, g = jax.value_and_grad(lambda p: loss_of(p, k))(params)
                return l + sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                               for x in jax.tree_util.tree_leaves(g)) * 0.0
        elif kind == "no_table":
            def body(k):
                def f(oth):
                    return loss_of(join([jax.lax.stop_gradient(t)
                                         for t in tab0], oth), k)
                l, g = jax.value_and_grad(f)(oth0)
                return l + sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                               for x in g) * 0.0
        elif kind == "no_field":
            def body(k):
                l, g = jax.value_and_grad(
                    lambda p: loss_of(p, k, cut_field=True))(params)
                return l + sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                               for x in jax.tree_util.tree_leaves(g)) * 0.0
        else:
            raise ValueError(kind)

        @jax.jit
        def dispatch(keys):
            def step(c, k):
                return c + body(k).astype(jnp.float32), None
            c, _ = jax.lax.scan(step, 0.0, keys)
            return c
        return dispatch

    kinds = ["fwd_only", "no_field", "no_table", "full"]
    arms = {k: make(k) for k in kinds}
    key = jax.random.PRNGKey(0)

    def keys():
        nonlocal key
        key, *subs = jax.random.split(key, spd + 1)
        return jnp.stack(subs)

    for name, fn in arms.items():
        t0 = time.perf_counter()
        _ = float(fn(keys()))
        print(f"[prof-bwd] {name}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)

    times = {k: [] for k in kinds}
    for rep in range(reps):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            _ = float(fn(keys()))
            times[name].append((time.perf_counter() - t0) / spd)
        print(f"[prof-bwd] rep {rep}: "
              f"{ {k: f'{v[-1] * 1e3:.2f}' for k, v in times.items()} }",
              flush=True)

    med = {k: float(np.median(v)) * 1e3 for k, v in times.items()}
    for k in kinds:
        print(f"[prof-bwd] {k:9s}: {med[k]:7.2f} ms")
    print(f"[prof-bwd] attribution @ {n} rays: "
          f"bwd_total {med['full'] - med['fwd_only']:.2f} | "
          f"composite+loss VJP {med['no_field'] - med['fwd_only']:.2f} | "
          f"field-to-features VJP {med['no_table'] - med['no_field']:.2f} | "
          f"table VJP (dT + pack-build) {med['full'] - med['no_table']:.2f}")


if __name__ == "__main__":
    main()
