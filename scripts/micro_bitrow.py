"""Micro: occupancy-bit lookup cost vs bitfield row layout.

prof_march.py measured the march is ~100% occupancy-gather: 1-byte u8 rows
gather at ~11 ns/row even from a 512 KB table, while 128-byte rows from
small tables gather at ~5.4 ns/row (micro_gather_regime.py).  This micro
tests wide-row relayouts of the SAME bitfield with in-register extraction:

  v0: scalar u8 rows (current occupancy_lookup)        byte = bf[bit//8]
  v1: [n/128, 128] u8 rows, iota-select byte in row
  v2: [n/32, 32] i32 word rows, iota-select word
  v3: [n/32, 8] i32 rows (32-byte rows)
  v4: two-level: gather 128-B u8 row, take_along_axis byte

Usage: python scripts/micro_bitrow.py
Env:   MB_B=1310720  MB_SPD=8
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

    B = int(os.environ.get("MB_B", 16384 * 80))
    spd = int(os.environ.get("MB_SPD", 8))

    rng = np.random.RandomState(0)
    n_bytes = 2 * 128 ** 3 // 8            # 2 cascades of 128^3 bits
    bf = jnp.asarray(rng.randint(0, 256, size=(n_bytes,)).astype(np.uint8))
    nbits = n_bytes * 8

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
        print(f"[bitrow] {tag:44s} {dt * 1e3:7.2f} ms "
              f"({dt / B * 1e9:5.2f} ns/bit-lookup)")
        return dt

    def bits(k):
        return jax.random.randint(k, (B,), 0, nbits)

    # v0: current — scalar u8 gather
    def v0(k):
        bit = bits(k)
        byte = jnp.take(bf, bit // 8, axis=0)
        return (((byte >> (bit % 8).astype(jnp.uint8)) & jnp.uint8(1))
                .astype(jnp.int32).sum())

    # v1: 128-byte u8 rows + iota-select byte
    bf_128 = bf.reshape(-1, 128)
    iota128 = jnp.arange(128, dtype=jnp.int32)[None, :]

    def v1(k):
        bit = bits(k)
        row = jnp.take(bf_128, bit // 1024, axis=0)          # [B, 128] u8
        byte_in = ((bit // 8) % 128).astype(jnp.int32)
        sel = (iota128 == byte_in[:, None])
        byte = jnp.sum(jnp.where(sel, row, jnp.uint8(0)).astype(jnp.int32),
                       axis=-1)
        return (((byte >> (bit % 8)) & 1)).sum()

    # v2: 32x i32 word rows (128-byte rows) + iota-select word
    bf_i32 = jax.lax.bitcast_convert_type(
        bf.reshape(-1, 4), jnp.int32).reshape(-1, 32)        # [n/128, 32]
    iota32 = jnp.arange(32, dtype=jnp.int32)[None, :]

    def v2(k):
        bit = bits(k)
        row = jnp.take(bf_i32, bit // 1024, axis=0)          # [B, 32] i32
        word_in = ((bit // 32) % 32).astype(jnp.int32)
        sel = (iota32 == word_in[:, None])
        word = jnp.sum(jnp.where(sel, row, 0), axis=-1)
        return (jax.lax.shift_right_logical(word, bit % 32) & 1).sum()

    # v3: 8x i32 rows (32-byte rows)
    bf_i32_8 = bf_i32.reshape(-1, 8)
    iota8 = jnp.arange(8, dtype=jnp.int32)[None, :]

    def v3(k):
        bit = bits(k)
        row = jnp.take(bf_i32_8, bit // 256, axis=0)         # [B, 8] i32
        word_in = ((bit // 32) % 8).astype(jnp.int32)
        sel = (iota8 == word_in[:, None])
        word = jnp.sum(jnp.where(sel, row, 0), axis=-1)
        return (jax.lax.shift_right_logical(word, bit % 32) & 1).sum()

    # v4: 128-byte u8 row + take_along_axis byte
    def v4(k):
        bit = bits(k)
        row = jnp.take(bf_128, bit // 1024, axis=0)
        byte_in = ((bit // 8) % 128).astype(jnp.int32)
        byte = jnp.take_along_axis(row, byte_in[:, None], axis=-1)[:, 0]
        return (((byte.astype(jnp.int32)) >> (bit % 8)) & 1).sum()

    timed("v0 scalar u8 rows (current)", v0)
    timed("v1 128B u8 rows + iota byte select", v1)
    timed("v2 32x i32 rows + iota word select", v2)
    timed("v3 8x i32 rows + iota word select", v3)
    timed("v4 128B u8 rows + take_along_axis", v4)


if __name__ == "__main__":
    main()
