"""Measure the full-width Pallas dT kernel vs the XLA backward (VERDICT r4
next #3: the last priced-positive backward lever — estimate was 10-11 ms vs
12.3 ms XLA at the flagship fine plane; this script turns the estimate into
a measurement).

Compares, at flagship shapes (B=262144 samples, fine plane R=512 C=8 and
coarse plane R=128 C=16):

  a) ops/triplane.py::_plane_dtable (XLA, production)   — baseline
  b) plane_dtable_pallas (round-2 v-block kernel)       — prior negative
  c) plane_dtable_pallas_fw at chunk ∈ {128, 256, 512}  — the new kernel

Usage: python scripts/micro_dt_pallas.py
Env:   MD_B=262144 MD_SPD=4
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

    from customnerf_tpu.ops.triplane import _plane_dtable
    from customnerf_tpu.ops.triplane_pallas import (plane_dtable_pallas,
                                                    plane_dtable_pallas_fw)

    B = int(os.environ.get("MD_B", 262144))
    spd = int(os.environ.get("MD_SPD", 4))

    def timed(tag, body, flops=None):
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

        try:
            _ = float(dispatch(keys()))
        except Exception as e:
            print(f"[micro-dtp] {tag:44s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}")
            return None
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            _ = float(dispatch(keys()))
        dt = (time.perf_counter() - t0) / (iters * spd)
        eff = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
        print(f"[micro-dtp] {tag:44s} {dt * 1e3:8.2f} ms{eff}")
        return dt

    for R, C in ((512, 8), (128, 16)):
        rng = np.random.RandomState(0)
        u0 = jnp.asarray(rng.randint(0, R - 1, size=(B,)).astype(np.int32))
        v0 = jnp.asarray(rng.randint(0, R - 1, size=(B,)).astype(np.int32))
        fu = jnp.asarray(rng.rand(B).astype(np.float32))
        fv = jnp.asarray(rng.rand(B).astype(np.float32))
        g = jnp.asarray(rng.randn(B, C).astype(np.float32))
        flops = 2.0 * B * R * R * C
        print(f"--- plane R={R} C={C}, B={B} ({flops/1e12:.2f} TFLOP) ---")

        def jitter(k, t):
            # tie the timed body to the scan key so XLA can't CSE dispatches
            return t + jax.random.normal(k, ()).astype(t.dtype) * 0.0

        timed(f"xla _plane_dtable bf16 chunk8192",
              lambda k: _plane_dtable(u0, v0, fu, jitter(k, fv), g, R, C,
                                      8192, True).sum(), flops)
        timed(f"pallas r2 v-block chunk2048",
              lambda k: plane_dtable_pallas(u0, v0, fu, jitter(k, fv), g,
                                            R=R, C=C, chunk=2048).sum(),
              flops)
        for ch in (128, 256, 512):
            timed(f"pallas r5 full-width chunk{ch}",
                  lambda k, ch=ch: plane_dtable_pallas_fw(
                      u0, v0, fu, jitter(k, fv), g, R=R, C=C,
                      chunk=ch).sum(), flops)


if __name__ == "__main__":
    main()
