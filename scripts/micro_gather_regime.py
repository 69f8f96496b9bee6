"""Map the TPU gather cost curve: ns/row vs table rows x row width x dtype.

Motivation (docs/PERF.md): the flagship forward is gather row-issue bound at
~17.6 ns/row on 262k-row tables, but a 16k-row table measured 7.0 ns/row.
The packed fine plane (R=512, span 7) is ~37k rows; a larger pack_span
shrinks the table (span 15 -> ~16k rows of 2x16xC channels).  If the fast
regime is reached, the fine-level gather halves.  This micro maps the curve
so the span choice is measured, not guessed.

Usage: python scripts/micro_gather_regime.py
Env:   MG_B=1048576 (rows gathered per iteration), MG_SPD=8
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

    B = int(os.environ.get("MG_B", 1 << 20))
    spd = int(os.environ.get("MG_SPD", 8))

    rows_sweep = [2048, 4096, 8192, 16384, 32768, 65536, 131072, 262144]
    width_sweep = [64, 128, 256]
    dtypes = [jnp.float32, jnp.bfloat16]

    rng = np.random.RandomState(0)

    def timed(tag, rows, width, dtype):
        table = jnp.asarray(
            rng.randn(rows, width).astype(np.float32)).astype(dtype)
        idx = jnp.asarray(rng.randint(0, rows, size=(spd, B)).astype(np.int32))

        @jax.jit
        def dispatch(t, ii):
            def step(c, i):
                v = jnp.take(t, i, axis=0)
                return c + jnp.sum(v[:, :1].astype(jnp.float32)), None
            c, _ = jax.lax.scan(step, 0.0, ii)
            return c

        _ = float(dispatch(table, idx))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            _ = float(dispatch(table, idx))
        dt = (time.perf_counter() - t0) / (iters * spd)
        print(f"[micro] {tag:36s} rows={rows:6d} w={width:3d} "
              f"{str(np.dtype(dtype.dtype) if hasattr(dtype,'dtype') else dtype).split('.')[-1]:8s}"
              f" {dt / B * 1e9:6.2f} ns/row  ({B / dt / 1e6:7.1f} M rows/s)")
        return dt

    for dtype in dtypes:
        dn = jnp.zeros((), dtype).dtype.name
        for width in width_sweep:
            for rows in rows_sweep:
                timed(f"gather {dn}", rows, width, dtype)


if __name__ == "__main__":
    main()
