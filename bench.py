"""Benchmark: occupancy-path training-step throughput (rays/sec/chip).

Measures the headline path from BASELINE.md — occupancy-grid march + fused
field MLP + composite + losses + backward + Adam — at the bear field config
(tiledgrid 16×2 @ log2 21 / 8192) on one chip.  A dense-path (-O2, 64+64
two-pass sampling) number is printed as a secondary diagnostic line to
stderr; the LAST stdout line is the required single JSON record.

vs_baseline: the reference publishes no numbers (BASELINE.md).  We anchor on
1.0e6 rays/s as an assumed reference-GPU full-train-step rate (typical
instant-ngp-style training on a 3090-class GPU at ~10^5-10^6 rays/s);
vs_baseline = value / 1.0e6, so ≥5.0 meets the BASELINE.json target.

Perf status + optimization plan: docs/PERF.md (the hash-table gather/scatter
is the current limiter on TPU).
"""

import json
import sys
import time

import numpy as np


def _rays(n_rays):
    rng = np.random.RandomState(0)
    o = np.tile(np.asarray([[0.0, 0.0, -1.5]], np.float32), (n_rays, 1))
    d = rng.randn(n_rays, 3).astype(np.float32) * 0.1 + np.asarray(
        [0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    target = rng.rand(n_rays, 3).astype(np.float32)
    tmask = (rng.rand(n_rays) > 0.5).astype(np.float32)
    return o, d, target, tmask


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import (RenderSettings, render_rays,
                                                render_rays_fast)
    from customnerf_tpu.ops.grid import GridSpec
    from customnerf_tpu.ops.occupancy import OccupancyState, init_state

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    n_rays = 4096 if on_accel else 128
    iters = 8 if on_accel else 2

    grid = GridSpec(num_levels=16, level_dim=2, base_resolution=16,
                    log2_hashmap_size=21, desired_resolution=8192,
                    gridtype="tiled")
    cfg = FieldConfig(bound=2.0, grid=grid,
                      compute_dtype="bfloat16" if on_accel else "float32")
    field = NeRFField(cfg)
    params = field.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(5e-4, b1=0.9, b2=0.99, eps=1e-15)

    o, d, target, tmask = _rays(n_rays)
    o, d = jnp.asarray(o), jnp.asarray(d)
    target, tmask = jnp.asarray(target), jnp.asarray(tmask)

    # half-occupied grid: realistic empty-space skipping workload
    occ = init_state(cascade=2, grid_size=128 if on_accel else 32)
    rng = np.random.RandomState(0)
    dens = (rng.rand(*occ.density_grid.shape) > 0.5).astype(np.float32) * 100.0
    occ = OccupancyState(density_grid=jnp.asarray(dens), bitfield=occ.bitfield,
                         mean_density=jnp.float32(1.0),
                         iter_density=jnp.int32(10),
                         grid_size=occ.grid_size)

    fast_settings = RenderSettings(bound=2.0, num_steps=64, upsample_steps=0,
                                   soft_mask=True)
    dense_settings = RenderSettings(bound=2.0, num_steps=64, upsample_steps=64,
                                    soft_mask=True)

    def make_step(render_fn):
        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                out = render_fn(p, key)
                loss = jnp.mean((out["image"] - target) ** 2)
                loss += 0.01 * jnp.mean(
                    (out["render_mask"][..., 0] - tmask) ** 2)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def run(step, tag):
        opt_state = tx.init(params)
        p = params
        key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        p, opt_state, loss = step(p, opt_state, sub)
        _ = float(loss)  # materialize: block_until_ready is unreliable on tunnels
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            p, opt_state, loss = step(p, opt_state, sub)
        _ = float(loss)
        dt = time.perf_counter() - t0
        rps = n_rays * iters / dt
        print(f"[bench] {tag}: {rps:.1f} rays/s ({dt / iters * 1e3:.0f} ms/step)",
              file=sys.stderr)
        return rps

    fast_rps = run(make_step(
        lambda p, key: render_rays_fast(
            field, p, o, d, occ, key, fast_settings, density_thresh=10.0,
            n_coarse=128, n_keep=64, train=True, perturb=True)), "fast(-O)")

    # TPU-tuned grid (8 levels × 4 ch, same 32-d output): halves gather rows
    # (docs/PERF.md row-count law); diagnostic line only — the headline stays
    # on the reference-parity 16×2 layout.
    try:
        grid_t = GridSpec(num_levels=8, level_dim=4, base_resolution=16,
                          log2_hashmap_size=21, desired_resolution=8192,
                          gridtype="tiled")
        field_t = NeRFField(FieldConfig(
            bound=2.0, grid=grid_t,
            compute_dtype="bfloat16" if on_accel else "float32"))
        params_t = field_t.init_params(jax.random.PRNGKey(0))

        @jax.jit
        def step_t(p, opt_state, key):
            def loss_fn(pp):
                out = render_rays_fast(
                    field_t, pp, o, d, occ, key, fast_settings,
                    density_thresh=10.0, n_coarse=128, n_keep=64,
                    train=True, perturb=True)
                return jnp.mean((out["image"] - target) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(p, updates), opt_state, loss

        ost = tx.init(params_t)
        pt = params_t
        key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        pt, ost, loss = step_t(pt, ost, sub)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            pt, ost, loss = step_t(pt, ost, sub)
        _ = float(loss)
        dt = time.perf_counter() - t0
        print(f"[bench] fast(-O) tuned 8x4 grid: {n_rays * iters / dt:.1f} rays/s",
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] tuned-grid diagnostic failed: {e}", file=sys.stderr)
    try:
        dense_rps = run(make_step(
            lambda p, key: render_rays(field, p, o, d, key, dense_settings,
                                       train=True, perturb=True)), "dense(-O2)")
    except Exception as e:  # diagnostic only
        print(f"[bench] dense path failed: {e}", file=sys.stderr)

    baseline = 1.0e6
    print(json.dumps({
        "metric": "train_step_rays_per_sec_per_chip",
        "value": round(fast_rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(fast_rps / baseline, 4),
    }))


if __name__ == "__main__":
    main()
