"""Benchmark: full reconstruction training-step throughput (rays/sec/chip).

Measures the hot path from SURVEY.md §3.1 — two field density evals
(coarse + importance), one fused eval, three masked composites, losses,
backward, and the Adam update — all in one jitted step at the bear field
config (tiledgrid 16×2 @ log2 21 / 8192, 64+64 samples/ray).

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md).  The
north-star target is ≥5× a reference-GPU torch-ngp-style training pipeline;
we anchor on 1.0e6 rays/s as the assumed reference-GPU full-train-step rate
(typical instant-ngp training is ~10^5-10^6 rays/s on a 3090-class GPU for
128 samples/ray with backward), so vs_baseline = value / 1.0e6 — i.e. the
multiple of the assumed reference throughput; ≥5.0 meets the target.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import RenderSettings, render_rays
    from customnerf_tpu.ops.grid import GridSpec

    platform = jax.devices()[0].platform
    n_rays = 4096 if platform != "cpu" else 256

    grid = GridSpec(num_levels=16, level_dim=2, base_resolution=16,
                    log2_hashmap_size=21, desired_resolution=8192,
                    gridtype="tiled")
    cfg = FieldConfig(bound=2.0, grid=grid,
                      compute_dtype="bfloat16" if platform == "tpu" else "float32")
    field = NeRFField(cfg)
    params = field.init_params(jax.random.PRNGKey(0))
    settings = RenderSettings(bound=2.0, num_steps=64, upsample_steps=64,
                              soft_mask=True)

    tx = optax.adam(5e-4, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    o = np.tile(np.asarray([[0.0, 0.0, -1.5]], np.float32), (n_rays, 1))
    d = rng.randn(n_rays, 3).astype(np.float32) * 0.1 + np.asarray(
        [0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    target = rng.rand(n_rays, 3).astype(np.float32)
    tmask = (rng.rand(n_rays) > 0.5).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    target, tmask = jnp.asarray(target), jnp.asarray(tmask)

    def one_step(carry, key):
        params, opt_state = carry

        def loss_fn(p):
            out = render_rays(field, p, o, d, key, settings, train=True,
                              perturb=True)
            loss = jnp.mean((out["image"] - target) ** 2)
            loss += 0.01 * jnp.mean((out["render_mask"][..., 0] - tmask) ** 2)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    iters = 20 if platform != "cpu" else 3

    @jax.jit
    def train_many(params, opt_state, keys):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, losses

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, iters)
    # warmup / compile
    params, opt_state, losses = train_many(params, opt_state, keys)
    losses.block_until_ready()

    t0 = time.perf_counter()
    params, opt_state, losses = train_many(params, opt_state, keys)
    losses.block_until_ready()
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * iters / dt
    baseline = 1.0e6  # assumed reference-GPU full-train-step rays/s (see module docstring)
    print(json.dumps({
        "metric": "train_step_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
