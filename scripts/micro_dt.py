"""Price the dT (plane-gradient) backward levers on chip.

The flagship backward is flop-bound on the one-hot histogram matmul
dT = U^T @ (V (x) g): 2*B*R^2*C with B=262k, R=512, C=8 x 3 planes
= 3.3 TFLOP bf16 (~17 ms at v5e peak).  Candidate levers, measured here:

  a) current _plane_dtable (bf16) at flagship shapes     -- baseline
  b) same shapes, int8 x int8 -> int32 dot_general       -- 2x peak?
  c) lax.sort_key_val cost on [chunks, 8192] + 12-wide payload
     (prices the sorted-band design)
  d) banded assembly: 8 subchunk matmuls [1024, 128]^T @ [1024, R*C]
     + dynamic_update_slice accumulate                    -- band flops

Usage: python scripts/micro_dt.py
Env:   MD_B=262144 MD_R=512 MD_C=8 MD_CHUNK=8192 MD_SPD=4
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

    B = int(os.environ.get("MD_B", 262144))
    R = int(os.environ.get("MD_R", 512))
    C = int(os.environ.get("MD_C", 8))
    Bc = int(os.environ.get("MD_CHUNK", 8192))
    spd = int(os.environ.get("MD_SPD", 4))

    rng = np.random.RandomState(0)
    u0 = jnp.asarray(rng.randint(0, R - 1, size=(B,)).astype(np.int32))
    v0 = jnp.asarray(rng.randint(0, R - 1, size=(B,)).astype(np.int32))
    fu = jnp.asarray(rng.rand(B).astype(np.float32))
    fv = jnp.asarray(rng.rand(B).astype(np.float32))
    g = jnp.asarray(rng.randn(B, C).astype(np.float32))

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

        _ = float(dispatch(keys()))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            _ = float(dispatch(keys()))
        dt = (time.perf_counter() - t0) / (iters * spd)
        extra = ""
        if flops:
            extra = f"  ({flops / dt / 1e12:6.1f} TFLOP/s)"
        print(f"[micro-dt] {tag:52s} {dt * 1e3:8.2f} ms{extra}")
        return dt

    fl = 2.0 * B * R * R * C

    # a) current production path (jitter g by key so nothing hoists)
    def a_cur(k):
        gk = g + jax.random.normal(k, g.shape) * 1e-6
        return _plane_dtable(u0, v0, fu, fv, gk, R, C, Bc, True).sum()

    timed(f"a: _plane_dtable bf16 B={B} R={R} C={C}", a_cur, fl)

    # b) int8 x int8 -> int32 at identical shapes (U one-hot as int8,
    #    W quantized int8): prices the MXU int8 path only
    iota = jnp.arange(R, dtype=jnp.int32)[None, :]

    def b_int8(k):
        gk = g + jax.random.normal(k, g.shape) * 1e-6
        n_chunks = B // Bc

        def body(i, acc):
            sl = lambda t: jax.lax.dynamic_slice_in_dim(t, i * Bc, Bc, 0)
            u0c, v0c, fuc, fvc, gc = (sl(u0), sl(v0), sl(fu), sl(fv), sl(gk))
            U = ((iota == u0c[:, None]).astype(jnp.int8)
                 + (iota == u0c[:, None] + 1).astype(jnp.int8))
            V = ((iota == v0c[:, None]).astype(jnp.float32) * (1 - fvc)[:, None]
                 + (iota == v0c[:, None] + 1).astype(jnp.float32) * fvc[:, None])
            W = (V[:, :, None] * gc[:, None, :]).reshape(Bc, R * C)
            Wq = jnp.clip(jnp.round(W * 16.0), -127, 127).astype(jnp.int8)
            part = jax.lax.dot_general(
                U, Wq, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc + part

        out = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros((R, R * C), jnp.int32))
        return out.sum().astype(jnp.float32)

    timed("b: int8 one-hot dT (same shapes)", b_int8, fl)

    # c) per-chunk sort cost: keys [n_chunks, Bc] + 12-wide payload
    n_chunks = B // Bc
    keys_s = jnp.asarray(
        rng.randint(0, R, size=(n_chunks, Bc)).astype(np.int32))
    payload = jnp.asarray(rng.randn(n_chunks, Bc, 12).astype(np.float32))

    def c_sort(k):
        ks = keys_s + (jax.random.randint(k, (), 0, 2)).astype(jnp.int32) * 0
        ops = [ks] + [payload[..., i] for i in range(12)]
        out = jax.lax.sort(ops, dimension=-1, num_keys=1)
        return sum(o.sum() for o in out[1:])

    timed(f"c: lax.sort [{n_chunks},{Bc}] + 12-wide payload", c_sort)

    # d) banded assembly: per chunk, 8 subchunk matmuls [Bs, Rb]^T @
    #    [Bs, R*C] accumulated at a dynamic row offset
    Rb = 128
    Bs = Bc // 8
    offs = jnp.asarray(
        rng.randint(0, R - Rb, size=(n_chunks, 8)).astype(np.int32))

    def d_banded(k):
        gk = g + jax.random.normal(k, g.shape) * 1e-6

        def body(i, acc):
            sl = lambda t: jax.lax.dynamic_slice_in_dim(t, i * Bc, Bc, 0)
            u0c, v0c, fuc, fvc, gc = (sl(u0), sl(v0), sl(fu), sl(fv), sl(gk))
            V = ((jnp.arange(R)[None, :] == v0c[:, None]).astype(jnp.float32)
                 * (1 - fvc)[:, None]
                 + (jnp.arange(R)[None, :] == v0c[:, None] + 1
                    ).astype(jnp.float32) * fvc[:, None])
            W = (V[:, :, None] * gc[:, None, :]).reshape(Bc, R * C)

            def sub(s, acc2):
                us = jax.lax.dynamic_slice_in_dim(u0c, s * Bs, Bs, 0)
                fs = jax.lax.dynamic_slice_in_dim(fuc, s * Bs, Bs, 0)
                Ws = jax.lax.dynamic_slice_in_dim(W, s * Bs, Bs, 0)
                off = offs[i, s]
                ub = us - off
                io = jnp.arange(Rb, dtype=jnp.int32)[None, :]
                Ub = ((io == ub[:, None]).astype(jnp.float32)
                      * (1 - fs)[:, None]
                      + (io == ub[:, None] + 1).astype(jnp.float32)
                      * fs[:, None])
                part = jax.lax.dot_general(
                    Ub.astype(jnp.bfloat16), Ws.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [Rb, R*C]
                cur = jax.lax.dynamic_slice(acc2, (off, 0), (Rb, R * C))
                return jax.lax.dynamic_update_slice(acc2, cur + part,
                                                    (off, 0))

            return jax.lax.fori_loop(0, 8, sub, acc)

        out = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros((R, R * C), jnp.float32))
        return out.sum()

    fl_band = 2.0 * B * Rb * R * C
    timed(f"d: banded dT Rb={Rb} (band flops only)", d_banded, fl_band)

    # e) per-channel matmuls, V built inline (no W materialization):
    #    dT[:, v, c] = U^T @ (V * g[:, c])  for each c — same flops, but the
    #    scaled operand may fuse into the matmul's operand read
    def e_perc(k):
        gk = (g + jax.random.normal(k, g.shape) * 1e-6).astype(jnp.bfloat16)
        n_chunks = B // Bc

        def body(i, acc):
            sl = lambda t: jax.lax.dynamic_slice_in_dim(t, i * Bc, Bc, 0)
            u0c, v0c, fuc, fvc, gc = (sl(u0), sl(v0), sl(fu), sl(fv), sl(gk))
            U = ((iota == u0c[:, None]).astype(jnp.float32)
                 * (1 - fuc)[:, None]
                 + (iota == u0c[:, None] + 1).astype(jnp.float32)
                 * fuc[:, None]).astype(jnp.bfloat16)
            V = ((iota == v0c[:, None]).astype(jnp.float32)
                 * (1 - fvc)[:, None]
                 + (iota == v0c[:, None] + 1).astype(jnp.float32)
                 * fvc[:, None]).astype(jnp.bfloat16)
            parts = []
            for c in range(C):
                Vc = V * gc[:, c:c + 1]
                parts.append(jax.lax.dot_general(
                    U, Vc, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))    # [R, R]
            return acc + jnp.stack(parts, axis=-1).reshape(R, R * C)

        out = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros((R, R * C), jnp.float32))
        return out.sum()

    timed("e: per-channel matmuls, inline V (no W mat.)", e_perc, fl)

    # f) current algorithm but W built directly in bf16 (halve build traffic)
    def f_bf16w(k):
        gk = (g + jax.random.normal(k, g.shape) * 1e-6)
        n_chunks = B // Bc

        def body(i, acc):
            sl = lambda t: jax.lax.dynamic_slice_in_dim(t, i * Bc, Bc, 0)
            u0c, v0c, fuc, fvc, gc = (sl(u0), sl(v0), sl(fu), sl(fv), sl(gk))
            U = ((iota == u0c[:, None]).astype(jnp.float32)
                 * (1 - fuc)[:, None]
                 + (iota == u0c[:, None] + 1).astype(jnp.float32)
                 * fuc[:, None])
            V = ((iota == v0c[:, None]).astype(jnp.float32)
                 * (1 - fvc)[:, None]
                 + (iota == v0c[:, None] + 1).astype(jnp.float32)
                 * fvc[:, None]).astype(jnp.bfloat16)
            W = (V[:, :, None] * gc.astype(jnp.bfloat16)[:, None, :]
                 ).reshape(Bc, R * C)
            part = jax.lax.dot_general(
                U.astype(jnp.bfloat16), W,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + part

        out = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros((R, R * C), jnp.float32))
        return out.sum()

    timed("f: bf16-built W (half build traffic)", f_bf16w, fl)

    # g) chunk-size sweep on the current path
    for bc in (2048, 4096, 16384, 32768):
        def a_bc(k, bc=bc):
            gk = g + jax.random.normal(k, g.shape) * 1e-6
            return _plane_dtable(u0, v0, fu, fv, gk, R, C, bc, True).sum()
        timed(f"g: _plane_dtable bf16 chunk={bc}", a_bc, fl)


if __name__ == "__main__":
    main()
