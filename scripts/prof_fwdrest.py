"""Decompose the flagship forward's 16 ms "fwd-rest" (docs/PERF.md round-4
stage table: full fwd 32.2 − march 8.9 − compacted field 6.9).

Candidate costs, timed in isolation at flagship shapes: the [N, K, 3] xyz
build (minor-dim-3 tiling), the three _composite calls (main + fg/bg soft-
mask pair), and the loss.  Each wraps in a lax.scan of SPD iters/dispatch.

Usage: python scripts/prof_fwdrest.py [n_rays]   (default 16384)
Env:   PF_KEEP=40 PF_SPD=8
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

    from customnerf_tpu.models.renderer import (RenderSettings, _add_fg_bg,
                                                _composite)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    K = int(os.environ.get("PF_KEEP", 40))
    spd = int(os.environ.get("PF_SPD", 8))
    s = RenderSettings(bound=2.0, num_steps=64, upsample_steps=0,
                       soft_mask=True)

    rng = np.random.RandomState(0)
    o = jnp.asarray(np.tile([[0.0, 0.0, -1.5]], (n, 1)).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    z = jnp.asarray(np.sort(rng.rand(n, K).astype(np.float32) * 3.0, axis=1))
    sigmas = jnp.asarray(rng.rand(n, K).astype(np.float32) * 3.0)
    rgbs = jnp.asarray(rng.rand(n, K, 3).astype(np.float32))
    masks = jnp.asarray(rng.rand(n, K, 1).astype(np.float32))
    target = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    sample_dist = jnp.asarray(rng.rand(n, 1).astype(np.float32) * 0.01)
    nears = jnp.full((n, 1), 0.05, jnp.float32)
    fars = jnp.full((n, 1), 3.0, jnp.float32)

    def timed(tag, body):
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
        print(f"[prof-fr] {tag:46s} {dt * 1e3:8.2f} ms")
        return dt

    def f_xyz(k):
        zz = z + jax.random.normal(k, ()) * 0.0
        xyz = o[:, None, :] + d[:, None, :] * zz[..., None]
        xyz = jnp.clip(xyz, -2.0, 2.0)
        dirs = jnp.broadcast_to(d[:, None, :], xyz.shape)
        return xyz.sum() + dirs.sum()

    def f_comp1(k):
        sg = sigmas + jax.random.normal(k, ()) * 0.0
        r = _composite(sg, rgbs, masks, z, sample_dist, nears, fars, s,
                       detach_nonedit=s.detach_bg, bg_color=None,
                       const_dt=True)
        return r["image"].sum()

    def f_comp3(k):
        sg = sigmas + jax.random.normal(k, ()) * 0.0
        r = _composite(sg, rgbs, masks, z, sample_dist, nears, fars, s,
                       detach_nonedit=s.detach_bg, bg_color=None,
                       const_dt=True)
        _add_fg_bg(r, sg, rgbs, masks, z, sample_dist, nears, fars, s,
                   const_dt=True)
        return (r["image"].sum() + r["fg"]["image"].sum()
                + r["bg"]["image"].sum())

    def f_comp3_loss(k):
        sg = sigmas + jax.random.normal(k, ()) * 0.0
        r = _composite(sg, rgbs, masks, z, sample_dist, nears, fars, s,
                       detach_nonedit=s.detach_bg, bg_color=None,
                       const_dt=True)
        _add_fg_bg(r, sg, rgbs, masks, z, sample_dist, nears, fars, s,
                   const_dt=True)
        loss = jnp.mean((r["image"] - target) ** 2)
        loss += 0.01 * jnp.mean((r["render_mask"][..., 0]
                                 - target[:, 0]) ** 2)
        return loss

    timed(f"xyz build + clip + dirs [N={n}, K={K}, 3]", f_xyz)
    timed("composite x1 (main)", f_comp1)
    timed("composite x3 (main + fg + bg)", f_comp3)
    timed("composite x3 + loss", f_comp3_loss)


if __name__ == "__main__":
    main()
