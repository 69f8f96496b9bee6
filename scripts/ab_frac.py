"""Interleaved same-process A/B of cross-ray compaction budgets
(``--compact_frac`` values) on the full flagship train step.

Every B-proportional stage (field eval, table-VJP matmuls, feature VJPs)
scales with the compacted sample count frac·N·K, so a lower budget is a
direct throughput lever — IF the full-run bear gate passes at that budget
(overflow falls back to even-stride subsampling; mild overflow measured
quality-POSITIVE at frac 0.4, docs/PERF.md).  This script prices the step
side honestly: all arms compiled in ONE process, timed dispatches
interleaved A,B,C,A,B,C,... so tunnel/host drift (±2-3 ms/step per
process on this box) hits every arm equally.

NOTE the budget quantization (ops/compaction.block_budget): budgets round
up to a multiple of 128 slots, so at G=32·K=40 the only distinct budgets
near the flagship are 512 (frac 0.31-0.40) and 384 (frac ≤0.30) — finer
budget granularity requires a larger block (G=64 → steps of 0.05 in frac).
Arms therefore take an optional block size: ``0.35:64`` = frac 0.35 at
compact_block 64.

Usage:  python scripts/ab_frac.py [n_rays] [frac[:block] ...]
        (default 16384 0.4:32 0.35:64 0.3:64)
Env:    AB_REPS=6 AB_SPD=8 PROF_KEEP/CHANNELS/RES as prof_flagship
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
                                                render_rays_fast)
    from customnerf_tpu.ops.occupancy import init_state, state_from_grid
    from customnerf_tpu.ops.triplane import TriplaneSpec

    args = sys.argv[1:]
    n = int(args[0]) if args else 16384
    arms_spec = []
    for a in (args[1:] or ["0.4:32", "0.35:64", "0.3:64"]):
        frac, _, blk = a.partition(":")
        arms_spec.append((float(frac), int(blk) if blk else 32))
    n_keep = int(os.environ.get("PROF_KEEP", 40))
    spd = int(os.environ.get("AB_SPD", 8))
    reps = int(os.environ.get("AB_REPS", 6))
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
    tx = optax.adam(5e-4, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)
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

    def make_dispatch(frac, block):
        def fwd(p, k):
            out = render_rays_fast(field, p, o, d, occ, k, s,
                                   n_coarse=n_coarse, n_keep=n_keep,
                                   train=True, perturb=True,
                                   compact_frac=frac, compact_block=block)
            loss = jnp.mean((out["image"] - target) ** 2)
            loss += 0.01 * jnp.mean(
                (out["render_mask"][..., 0] - tmask) ** 2)
            return loss

        @jax.jit
        def dispatch(p, os_, keys):
            def step(carry, k):
                p, os_, c = carry
                loss, grads = jax.value_and_grad(fwd)(p, k)
                updates, os2 = tx.update(grads, os_)
                return (optax.apply_updates(p, updates), os2,
                        c + loss.astype(jnp.float32)), None
            (p2, os2, c), _ = jax.lax.scan(step, (p, os_, 0.0), keys)
            return c
        return dispatch

    from customnerf_tpu.ops.compaction import block_budget
    arms = {}
    for f, blk in arms_spec:
        m = block_budget(blk, n_keep, f)
        name = f"f{f:g}:G{blk}(M{m})"
        print(f"[ab-frac] arm {name}: {m / blk:g} slots/ray")
        arms[name] = make_dispatch(f, blk)
    key = jax.random.PRNGKey(0)

    def keys():
        nonlocal key
        key, *subs = jax.random.split(key, spd + 1)
        return jnp.stack(subs)

    for name, fn in arms.items():
        t0 = time.perf_counter()
        _ = float(fn(params, opt_state, keys()))
        print(f"[ab-frac] {name}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)

    times = {name: [] for name in arms}
    for rep in range(reps):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            _ = float(fn(params, opt_state, keys()))
            times[name].append((time.perf_counter() - t0) / spd)
        pair = {k: f"{v[-1] * 1e3:.2f}" for k, v in times.items()}
        print(f"[ab-frac] rep {rep}: {pair} ms/step", flush=True)

    for name, ts in times.items():
        med = float(np.median(ts))
        print(f"[ab-frac] {name:9s}: median {med * 1e3:6.2f} ms/step "
              f"({n / med:,.0f} rays/s)  min {min(ts) * 1e3:.2f}  "
              f"max {max(ts) * 1e3:.2f}")


if __name__ == "__main__":
    main()
