"""Decompose the flagship train step on chip (perf tooling, docs/PERF.md).

Times each stage of the compacted fast-path step in isolation — march,
compaction pack, field eval on the compacted slab, full forward, forward+
backward, full step with Adam — each wrapped in a lax.scan of SPD
iterations per dispatch so the 100-250 ms tunnel dispatch latency
amortizes out, exactly like the trainer's --steps_per_dispatch path.

Usage:  python scripts/prof_flagship.py [n_rays ...]   (default 16384)
Env:    PROF_KEEP=40 PROF_FRAC=0.4 PROF_BLOCK=32 PROF_CHANNELS=16,8
        PROF_RES=128,512 PROF_SPD=8 PROF_PACK_SPAN=7 PROF_LAYOUT=planes|wide
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
    import optax

    cache_dir = os.path.expanduser("~/.cache/customnerf_jax")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import (RenderSettings,
                                                _eval_field_compacted,
                                                render_rays_fast)
    from customnerf_tpu.ops.occupancy import (init_state,
                                              march_rays_occupancy,
                                              state_from_grid)
    from customnerf_tpu.ops.ray import near_far_from_aabb
    from customnerf_tpu.ops.triplane import TriplaneSpec

    n_keep = int(os.environ.get("PROF_KEEP", 40))
    frac = float(os.environ.get("PROF_FRAC", 0.4))
    block = int(os.environ.get("PROF_BLOCK", 32))
    spd = int(os.environ.get("PROF_SPD", 8))
    chans = tuple(int(c) for c in
                  os.environ.get("PROF_CHANNELS", "16,8").split(","))
    res = tuple(int(r) for r in
                os.environ.get("PROF_RES", "128,512").split(","))
    span = int(os.environ.get("PROF_PACK_SPAN", 7))
    layout = os.environ.get("PROF_LAYOUT", "planes")
    ray_counts = [int(a) for a in sys.argv[1:]] or [16384]
    n_coarse = 2 * n_keep

    tri = TriplaneSpec(resolutions=res, channels=chans,
                       bwd=os.environ.get("PROF_BWD", "matmul"),
                       pack_span=span,
                       fwd_bf16=os.environ.get("PROF_FWD_BF16", "1") == "1")
    field = NeRFField(FieldConfig(bound=2.0, grid=tri,
                                  compute_dtype="bfloat16"))
    params = field.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(5e-4, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)
    s = RenderSettings(bound=2.0, num_steps=64, upsample_steps=0,
                       soft_mask=True)

    rng = np.random.RandomState(0)
    g0 = init_state(cascade=2, grid_size=128)
    dens = (rng.rand(*g0.density_grid.shape) < 0.128).astype(np.float32) * 100
    occ = state_from_grid(dens, 1.0, density_thresh=10.0,
                          grid_size=g0.grid_size)
    aabb = jnp.asarray([-2.0] * 3 + [2.0] * 3, jnp.float32)

    def rays(n):
        r = np.random.RandomState(0)
        o = np.tile(np.asarray([[0.0, 0.0, -1.5]], np.float32), (n, 1))
        d = r.randn(n, 3).astype(np.float32) * 0.1 + np.asarray(
            [0, 0, 1], np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return (jnp.asarray(o), jnp.asarray(d),
                jnp.asarray(r.rand(n, 3).astype(np.float32)),
                jnp.asarray((r.rand(n) > 0.5).astype(np.float32)))

    def timed(tag, make_body, n):
        """make_body(o, d, target, tmask) -> fn(key) -> scalar."""
        o, d, target, tmask = rays(n)
        body = make_body(o, d, target, tmask)

        @jax.jit
        def dispatch(p, os_, keys):
            def step(carry, k):
                c, p, os_ = carry
                out = body(p, os_, k)
                if isinstance(out, tuple):      # (scalar, params, opt_state)
                    sc, p, os_ = out
                else:
                    sc = out
                return (c + sc.astype(jnp.float32), p, os_), None
            (c, _, _), _ = jax.lax.scan(step, (0.0, p, os_), keys)
            return c

        key = jax.random.PRNGKey(0)

        def keys():
            nonlocal key
            key, *subs = jax.random.split(key, spd + 1)
            return jnp.stack(subs)

        c = dispatch(params, opt_state, keys())
        _ = float(c)
        t0 = time.perf_counter()
        iters = 3
        acc = 0.0
        for _ in range(iters):
            acc += float(dispatch(params, opt_state, keys()))
        dt = (time.perf_counter() - t0) / (iters * spd)
        print(f"[prof] {tag:42s} @{n:6d} rays: {dt * 1e3:7.2f} ms/iter "
              f"({n / dt:,.0f} rays/s)")
        return dt

    def march_body(o, d, target, tmask):
        nears, fars = near_far_from_aabb(o, d, aabb, 0.05)
        miss = nears >= fars
        nz = jnp.where(miss, 0.0, nears)
        fz = jnp.where(miss, 1.0, fars)

        def f(p, os_, k):
            z, valid, dt_scale = march_rays_occupancy(
                occ, o, d, nz, fz, k, 2.0, n_coarse=n_coarse,
                n_keep=n_keep, perturb=True)
            return (z.mean() + valid.sum().astype(jnp.float32)
                    + dt_scale.mean())
        return f

    def fieldc_body(o, d, target, tmask):
        """compaction pack + field eval + scatter-back, march precomputed."""
        nears, fars = near_far_from_aabb(o, d, aabb, 0.05)
        miss = nears >= fars
        nz = jnp.where(miss, 0.0, nears)
        fz = jnp.where(miss, 1.0, fars)
        z, valid, _ = march_rays_occupancy(
            occ, o, d, nz, fz, jax.random.PRNGKey(1), 2.0,
            n_coarse=n_coarse, n_keep=n_keep, perturb=True)
        valid = valid & ~miss[:, None]
        z = jnp.where(valid, z, fz[:, None])
        xyz = jnp.clip(o[:, None, :] + d[:, None, :] * z[..., None],
                       aabb[:3], aabb[3:])
        dirs = jnp.broadcast_to(d[:, None, :], xyz.shape)

        def f(p, os_, k):
            sig, rad, _ = _eval_field_compacted(
                lambda x, dd: field.apply(p, x, dd), xyz, dirs, valid,
                frac, block)
            return sig.mean() + rad.mean()
        return f

    def fwd_body(o, d, target, tmask):
        def f(p, os_, k):
            out = render_rays_fast(field, p, o, d, occ, k, s,
                                   n_coarse=n_coarse, n_keep=n_keep,
                                   train=True, perturb=True,
                                   compact_frac=frac, compact_block=block,
                                   compact_layout=layout)
            loss = jnp.mean((out["image"] - target) ** 2)
            loss += 0.01 * jnp.mean((out["render_mask"][..., 0] - tmask) ** 2)
            return loss
        return f

    def grad_body(o, d, target, tmask):
        inner = fwd_body(o, d, target, tmask)

        def f(p, os_, k):
            loss, grads = jax.value_and_grad(
                lambda pp: inner(pp, os_, k))(p)
            return loss + sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                              for g in jax.tree_util.tree_leaves(grads)) * 0.0
        return f

    def step_body(o, d, target, tmask):
        inner = fwd_body(o, d, target, tmask)

        def f(p, os_, k):
            loss, grads = jax.value_and_grad(
                lambda pp: inner(pp, os_, k))(p)
            updates, os2 = tx.update(grads, os_)
            return loss, optax.apply_updates(p, updates), os2
        return f

    stages = os.environ.get("PROF_STAGES", "all")  # "all" | "step"
    for n in ray_counts:
        if stages == "step":
            timed("full step (fwd+bwd+adam)", step_body, n)
            continue
        t_march = timed("march only", march_body, n)
        t_fieldc = timed("compact pack + field eval + scatter", fieldc_body, n)
        t_fwd = timed("full forward (loss)", fwd_body, n)
        t_grad = timed("forward + backward", grad_body, n)
        t_step = timed("full step (fwd+bwd+adam)", step_body, n)
        print(f"[prof] breakdown @{n}: march {t_march * 1e3:.2f} | "
              f"field-compacted {t_fieldc * 1e3:.2f} | "
              f"fwd-rest {(t_fwd - t_fieldc - t_march) * 1e3:.2f} | "
              f"bwd {(t_grad - t_fwd) * 1e3:.2f} | "
              f"adam {(t_step - t_grad) * 1e3:.2f} | "
              f"total {t_step * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
