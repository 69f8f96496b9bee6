"""Price the BUCKET-COMPACTED BANDED dT backward against _plane_dtable.

The round-4 micro_dt.py negatives all kept the full-width W = V (x) g
[Bc, R*C] Kronecker build — the HBM wall — and/or full-R matmul FLOPs.
This variant restructures BOTH:

  * bucket the u axis into nb bands of width bw = R/nb (band rows bw+1);
  * per sub-block of S samples, compact samples into per-bucket slots with
    the same one-hot-matmul trick as the march/ray compaction (exact 0/1
    products on the PAYLOAD scalars, not on the wide W);
  * per bucket, the small Kronecker RHS = U_lo (x) g is only (bw+1)*C wide
    and the ONE-HOT factor V becomes the left matmul operand:

        dT_band[h, v, ul*C+c] = V_h^T @ (U_lo (x) g)_h      # [R, (bw+1)C]

    FLOPs drop R/(bw+1) ~ 16x and the materialized operands drop from
    W 64 MB/chunk to M+V ~ 48 MB/chunk (and shrink further with q).
  * sub-block bucket overflow (slot >= q) is rerouted EXACTLY through a
    chunk-wide overflow compaction (q_ov slots) + one full-width matmul on
    those few rows; only q_ov exhaustion (counted, reported) would drop
    gradient — production would lax.cond to the full path there.

Usage: python scripts/micro_dt_banded.py [check|perf|both]
Env:   MB_B=262144 MB_R=512 MB_C=8 MB_CHUNK=8192 MB_SPD=4 MB_DIST=uniform
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(globals().get("__file__", "scripts/x")))))


def make_banded(R, C, Bc, S, nb, q, q_ov, use_bf16, rhs_tile=True,
                batched=True):
    """Build a jittable banded dT: (u0, v0, fu, fv, g) -> dT [R*R, C].

    Exact (up to matmul dtype) as long as per-chunk sub-block overflow
    fits in q_ov; the residual drop count is returned alongside.

    rhs_tile: build the Kronecker RHS as repeat(Ulo)·tile(g) (2-D-minor
    layout discipline) instead of a 4-D broadcast-multiply — the 4-D
    [nb, m, band, C] intermediate pads its C=8 minor to 128 lanes (16×)
    and measured 4.5× SLOWER than the baseline it was meant to beat.
    batched: single batched dot_general over buckets vs a python loop of
    per-bucket 2-D matmuls (layout experiment)."""
    import jax
    import jax.numpy as jnp

    bw = R // nb
    band = bw + 1
    nsub = Bc // S
    m = nsub * q                      # compacted slots per bucket per chunk
    mm = jnp.bfloat16 if use_bf16 else jnp.float32

    def dtable(u0, v0, fu, fv, g):
        B = g.shape[0]
        n_chunks = -(-B // Bc)
        pad = n_chunks * Bc - B
        if pad:
            u0 = jnp.pad(u0, (0, pad))
            v0 = jnp.pad(v0, (0, pad))
            fu = jnp.pad(fu, (0, pad))
            fv = jnp.pad(fv, (0, pad))
            g = jnp.pad(g, ((0, pad), (0, 0)))

        pw = 4 + C                     # payload: u0, v0, fu, fv, g[C]
        iota_cols = jnp.arange(nb * q, dtype=jnp.int32)[None, None, :]
        iota_ov = jnp.arange(q_ov, dtype=jnp.int32)[None, :]
        iota_band = jnp.arange(band, dtype=jnp.int32)
        iota_R = jnp.arange(R, dtype=jnp.int32)

        def body(i, carry):
            acc_band, acc_ov, dropped = carry
            sl = lambda t: jax.lax.dynamic_slice_in_dim(t, i * Bc, Bc, 0)
            u0c, v0c, fuc, fvc, gc = sl(u0), sl(v0), sl(fu), sl(fv), sl(g)

            # ---- phase 1: per-sub-block bucket compaction of the payload
            h = (u0c // bw).astype(jnp.int32).reshape(nsub, S)
            # rank among same-bucket rows within the sub-block (exclusive)
            A = (h[:, :, None] == jnp.arange(nb)[None, None, :]
                 ).astype(jnp.int32)                       # [nsub, S, nb]
            rank = jnp.cumsum(A, axis=1) - A
            slot = jnp.sum(A * rank, axis=-1)              # [nsub, S]
            col = h * q + slot
            keep = slot < q
            M = ((iota_cols == col[:, :, None]) & keep[:, :, None]
                 ).astype(mm)                              # [nsub, S, nb*q]

            P = jnp.stack(
                [u0c.astype(jnp.float32), v0c.astype(jnp.float32), fuc, fvc],
                axis=-1)
            P = jnp.concatenate([P, gc], axis=-1)          # [Bc, pw]
            Pt = P.reshape(nsub, S, pw).transpose(0, 2, 1).astype(mm)
            # [nsub, pw, S] @ [nsub, S, nb*q] -> [nsub, pw, nb*q]
            Pc = jax.lax.dot_general(
                Pt, M, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            # -> [nb, nsub*q, pw]
            Pc = (Pc.reshape(nsub, pw, nb, q)
                  .transpose(2, 0, 3, 1).reshape(nb, m, pw))

            u0b = Pc[..., 0]
            v0b = Pc[..., 1].astype(jnp.int32)
            fub = Pc[..., 2]
            fvb = Pc[..., 3]
            gb = Pc[..., 4:]
            ul = u0b.astype(jnp.int32) - (jnp.arange(nb, dtype=jnp.int32)
                                          [:, None] * bw)      # [nb, m]

            # ---- phase 2: banded matmul, one-hot V on the LEFT
            V = ((iota_R[None, None, :] == v0b[:, :, None]).astype(
                jnp.float32) * (1 - fvb)[:, :, None]
                + (iota_R[None, None, :] == v0b[:, :, None] + 1).astype(
                    jnp.float32) * fvb[:, :, None])        # [nb, m, R]
            Ulo = ((iota_band[None, None, :] == ul[:, :, None]).astype(
                jnp.float32) * (1 - fub)[:, :, None]
                + (iota_band[None, None, :] == ul[:, :, None] + 1).astype(
                    jnp.float32) * fub[:, :, None])        # [nb, m, band]
            if rhs_tile:
                RHS = (jnp.repeat(Ulo, C, axis=-1)
                       * jnp.tile(gb, (1, 1, band)))       # [nb, m, band*C]
            else:
                RHS = (Ulo[:, :, :, None] * gb[:, :, None, :]
                       ).reshape(nb, m, band * C)
            if batched:
                part = jax.lax.dot_general(
                    V.astype(mm), RHS.astype(mm),
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)    # [nb, R, band*C]
            else:
                part = jnp.stack([
                    jax.lax.dot_general(
                        V[h].astype(mm), RHS[h].astype(mm),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    for h in range(nb)])

            # ---- overflow: chunk-wide compaction + full-width matmul
            ov = (~keep).reshape(Bc)
            ovi = ov.astype(jnp.int32)
            ovslot = jnp.cumsum(ovi) - ovi
            Mov = ((iota_ov == ovslot[:, None]) & ov[:, None]
                   & (ovslot < q_ov)[:, None]).astype(mm)  # [Bc, q_ov]
            Pov = jax.lax.dot_general(
                P.T.astype(mm), Mov,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).T      # [q_ov, pw]
            u0o = Pov[:, 0].astype(jnp.int32)
            v0o = Pov[:, 1].astype(jnp.int32)
            fuo, fvo = Pov[:, 2], Pov[:, 3]
            go = Pov[:, 4:]
            ovvalid = (jnp.cumsum(jnp.ones((q_ov,), jnp.float32))
                       <= jnp.sum(ovi).astype(jnp.float32))
            Uo = ((iota_R[None, :] == u0o[:, None]).astype(jnp.float32)
                  * (1 - fuo)[:, None]
                  + (iota_R[None, :] == u0o[:, None] + 1).astype(jnp.float32)
                  * fuo[:, None]) * ovvalid[:, None]
            Vo = ((iota_R[None, :] == v0o[:, None]).astype(jnp.float32)
                  * (1 - fvo)[:, None]
                  + (iota_R[None, :] == v0o[:, None] + 1).astype(jnp.float32)
                  * fvo[:, None])
            Wo = jnp.repeat(Vo, C, axis=-1) * jnp.tile(go, (1, R))
            part_ov = jax.lax.dot_general(
                Uo.astype(mm), Wo.astype(mm),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [R, R*C]

            dropped = dropped + jnp.maximum(
                jnp.sum(ovi) - q_ov, 0).astype(jnp.int32)
            return (acc_band + part, acc_ov + part_ov, dropped)

        acc_band = jnp.zeros((nb, R, band * C), jnp.float32)
        acc_ov = jnp.zeros((R, R * C), jnp.float32)
        acc_band, acc_ov, dropped = jax.lax.fori_loop(
            0, n_chunks, body, (acc_band, acc_ov, jnp.int32(0)))

        # ---- unpack: band (h, v, ul, c) -> absolute (u = h*bw + ul, v, c)
        bandT = (acc_band.reshape(nb, R, band, C)
                 .transpose(0, 2, 1, 3))                   # [nb, band, R, C]
        main = bandT[:, :bw].reshape(R, R, C)
        spill = bandT[:, bw]                               # [nb, R, C] -> u=(h+1)*bw
        main = main.at[bw::bw].add(spill[:-1])
        dT = main.reshape(R, R * C) + acc_ov
        return dT.reshape(R * R, C), dropped

    return dtable


def make_banded_v2(R, C, Bc, S, nb, q, q2, use_bf16, rank_tril=False):
    """v2: everything lives in BAND layout — no [R, R*C] accumulator.

    * per-sub-block bucket compaction (q slots) exactly as v1;
    * overflow (slot >= q) gets a CHUNK-WIDE second-level compaction into
      q2 extra slots per bucket, concatenated onto the same phase-2 m axis
      (no separate full-width overflow matmul);
    * double overflow (bucket's chunk-wide overflow > q2) falls back via
      lax.cond to the full-width matmul whose [R, R*C] result is reshaped
      INTO band layout (u = h*bw + ul is a bijection), so the carry stays
      [nb, R, (bw+1)*C] in every case;
    * one-hot/bilinear factors are built directly in the matmul dtype
      (no f32 intermediate + cast round-trip).

    Returns (dT [R*R, C] f32, n_fallback_chunks int32).
    """
    import jax
    import jax.numpy as jnp

    bw = R // nb
    band = bw + 1
    nsub = Bc // S
    m1 = nsub * q
    m = m1 + q2
    mm = jnp.bfloat16 if use_bf16 else jnp.float32

    def dtable(u0, v0, fu, fv, g):
        B = g.shape[0]
        n_chunks = -(-B // Bc)
        pad = n_chunks * Bc - B
        if pad:
            u0 = jnp.pad(u0, (0, pad))
            v0 = jnp.pad(v0, (0, pad))
            fu = jnp.pad(fu, (0, pad))
            fv = jnp.pad(fv, (0, pad))
            g = jnp.pad(g, ((0, pad), (0, 0)))

        pw = 4 + C
        iota_cols = jnp.arange(nb * q, dtype=jnp.int32)[None, None, :]
        iota_cols2 = jnp.arange(nb * q2, dtype=jnp.int32)[None, :]
        iota_band = jnp.arange(band, dtype=jnp.int32)
        iota_R = jnp.arange(R, dtype=jnp.int32)
        hoff = jnp.arange(nb, dtype=jnp.int32)[:, None] * bw

        def onehot_bilinear(idx, frac, iota):
            lo = (iota == idx[..., None]).astype(mm)
            hi = (iota == idx[..., None] + 1).astype(mm)
            f = frac.astype(mm)[..., None]
            return lo * (1 - f) + hi * f

        def body(i, carry):
            acc_band, n_fb = carry
            sl = lambda t: jax.lax.dynamic_slice_in_dim(t, i * Bc, Bc, 0)
            u0c, v0c, fuc, fvc, gc = sl(u0), sl(v0), sl(fu), sl(fv), sl(g)

            h = (u0c // bw).reshape(nsub, S)
            if rank_tril:
                from customnerf_tpu.ops.triplane import _rank_exclusive
                A = (h[:, :, None] == jnp.arange(nb, dtype=jnp.int32)
                     [None, None, :]).astype(jnp.float32)
                rank = _rank_exclusive(A)
                slot = jnp.sum(A * rank, axis=-1).astype(jnp.int32)
                keep = slot < q
                ovf = (~keep).reshape(Bc)
                A2 = ((h[:, :, None] == jnp.arange(nb, dtype=jnp.int32)
                       [None, None, :]) & (~keep)[:, :, None]
                      ).astype(jnp.float32)
                r2l = _rank_exclusive(A2)
                tot2 = jnp.sum(A2, axis=1)
                off2 = _rank_exclusive(tot2[None])[0]
                slot2 = jnp.sum(A2 * (r2l + off2[:, None, :]),
                                axis=-1).reshape(Bc).astype(jnp.int32)
                hflat = h.reshape(Bc)
            else:
                A = (h[:, :, None] == jnp.arange(nb, dtype=jnp.int32)
                     [None, None, :]).astype(jnp.int32)    # [nsub, S, nb]
                rank = jnp.cumsum(A, axis=1) - A
                slot = jnp.sum(A * rank, axis=-1)          # [nsub, S]
                keep = slot < q
                hflat = h.reshape(Bc)
                ovf = (~keep).reshape(Bc)
                A2 = ((hflat[:, None] == jnp.arange(nb, dtype=jnp.int32)
                       [None, :]) & ovf[:, None]).astype(jnp.int32)
                rank2 = jnp.cumsum(A2, axis=0) - A2
                slot2 = jnp.sum(A2 * rank2, axis=-1)       # [Bc]
            keep2 = ovf & (slot2 < q2)
            n_ov2 = jnp.sum((ovf & ~keep2).astype(jnp.int32))

            P = jnp.stack(
                [u0c.astype(jnp.float32), v0c.astype(jnp.float32),
                 fuc, fvc], axis=-1)
            P = jnp.concatenate([P, gc], axis=-1)          # [Bc, pw]

            def banded_branch(_):
                col = h * q + slot
                M = ((iota_cols == col[:, :, None]) & keep[:, :, None]
                     ).astype(mm)                          # [nsub, S, nb*q]
                Pt = (P.reshape(nsub, S, pw).transpose(0, 2, 1)
                      .astype(mm))
                Pc = jax.lax.dot_general(
                    Pt, M, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)    # [nsub, pw, nb*q]
                Pc = (Pc.reshape(nsub, pw, nb, q)
                      .transpose(2, 0, 3, 1).reshape(nb, m1, pw))

                col2 = hflat * q2 + slot2
                M2 = ((iota_cols2 == col2[:, None]) & keep2[:, None]
                      ).astype(mm)                         # [Bc, nb*q2]
                Pc2 = jax.lax.dot_general(
                    P.T.astype(mm), M2,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [pw, nb*q2]
                Pc2 = Pc2.reshape(pw, nb, q2).transpose(1, 2, 0)
                Pcat = jnp.concatenate([Pc, Pc2], axis=1)  # [nb, m, pw]

                u0b = Pcat[..., 0].astype(jnp.int32)
                v0b = Pcat[..., 1].astype(jnp.int32)
                fub, fvb = Pcat[..., 2], Pcat[..., 3]
                gb = Pcat[..., 4:]
                ul = u0b - hoff                            # [nb, m]

                V = onehot_bilinear(v0b, fvb, iota_R[None, None, :])
                Ulo = onehot_bilinear(ul, fub, iota_band[None, None, :])
                RHS = (jnp.repeat(Ulo, C, axis=-1)
                       * jnp.tile(gb.astype(mm), (1, 1, band)))
                return jax.lax.dot_general(
                    V, RHS, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32), jnp.int32(0)

            def full_branch(_):
                U = onehot_bilinear(u0c, fuc, iota_R[None, :])
                Vf = onehot_bilinear(v0c, fvc, iota_R[None, :])
                W = jnp.repeat(Vf, C, axis=-1) * jnp.tile(
                    gc.astype(mm), (1, R))
                part = jax.lax.dot_general(
                    U, W, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [R, R*C]
                # reshape the full-width result INTO band layout
                pb = part.reshape(nb, bw, R * C).reshape(nb, bw, R, C)
                pb = jnp.concatenate(
                    [pb, jnp.zeros((nb, 1, R, C), jnp.float32)], axis=1)
                return (pb.transpose(0, 2, 1, 3).reshape(nb, R, band * C),
                        jnp.int32(1))

            part_band, fb = jax.lax.cond(
                n_ov2 == 0, banded_branch, full_branch, None)
            return acc_band + part_band, n_fb + fb

        acc_band, n_fb = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.zeros((nb, R, band * C), jnp.float32), jnp.int32(0)))

        bandT = (acc_band.reshape(nb, R, band, C)
                 .transpose(0, 2, 1, 3))                   # [nb, band, R, C]
        main = bandT[:, :bw].reshape(R, R, C)
        spill = bandT[:, bw]
        main = main.at[bw::bw].add(spill[:-1])
        return main.reshape(R * R, C), n_fb

    return dtable


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("MB_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.expanduser("~/.cache/customnerf_jax")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from customnerf_tpu.ops.triplane import _plane_dtable

    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    B = int(os.environ.get("MB_B", 262144))
    R = int(os.environ.get("MB_R", 512))
    C = int(os.environ.get("MB_C", 8))
    Bc = int(os.environ.get("MB_CHUNK", 8192))
    spd = int(os.environ.get("MB_SPD", 4))
    dist = os.environ.get("MB_DIST", "uniform")

    rng = np.random.RandomState(0)
    if dist == "uniform":
        u0n = rng.randint(0, R - 1, size=(B,)).astype(np.int32)
    else:  # center-skewed, bear-like: clipped gaussian around R/2
        u0n = np.clip((rng.randn(B) * 0.18 + 0.5) * (R - 1), 0, R - 2
                      ).astype(np.int32)
    u0 = jnp.asarray(u0n)
    v0 = jnp.asarray(rng.randint(0, R - 1, size=(B,)).astype(np.int32))
    fu = jnp.asarray(rng.rand(B).astype(np.float32))
    fv = jnp.asarray(rng.rand(B).astype(np.float32))
    g = jnp.asarray(rng.randn(B, C).astype(np.float32))

    if mode in ("check", "both"):
        # small exact check, f32 matmuls, no sub-block overflow possible
        Rs, Cs, Bs = 64, 8, 4096
        ck = make_banded(Rs, Cs, 1024, 256, 8, 256, 1024, False)
        rng2 = np.random.RandomState(1)
        u0s = jnp.asarray(rng2.randint(0, Rs - 1, (Bs,)).astype(np.int32))
        v0s = jnp.asarray(rng2.randint(0, Rs - 1, (Bs,)).astype(np.int32))
        fus = jnp.asarray(rng2.rand(Bs).astype(np.float32))
        fvs = jnp.asarray(rng2.rand(Bs).astype(np.float32))
        gs = jnp.asarray(rng2.randn(Bs, Cs).astype(np.float32))
        ref = _plane_dtable(u0s, v0s, fus, fvs, gs, Rs, Cs, 1024, False)
        out, dropped = jax.jit(ck)(u0s, v0s, fus, fvs, gs)
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"[banded-check] max|diff|={err:.3e} (ref max {scale:.3e}) "
              f"dropped={int(dropped)}")
        assert err <= 1e-4 * max(scale, 1.0), "banded dT mismatch"
        # skew + overflow reroute check: tight q forces the overflow path
        ck2 = make_banded(Rs, Cs, 1024, 256, 8, 40, 1024, False)
        u0sk = jnp.asarray(np.clip((np.random.RandomState(2).randn(Bs)
                                    * 0.10 + 0.5) * (Rs - 1), 0, Rs - 2
                                   ).astype(np.int32))
        ref2 = _plane_dtable(u0sk, v0s, fus, fvs, gs, Rs, Cs, 1024, False)
        out2, dropped2 = jax.jit(ck2)(u0sk, v0s, fus, fvs, gs)
        err2 = float(jnp.max(jnp.abs(out2 - ref2)))
        print(f"[banded-check] skew/overflow max|diff|={err2:.3e} "
              f"dropped={int(dropped2)}")
        assert err2 <= 1e-4 * max(scale, 1.0), "overflow reroute mismatch"
        # v2: second-level reroute (q2 generous) and cond fallback (q2 tiny)
        for q2, label in ((512, "level-2 reroute"), (1, "cond fallback")):
            ck3 = make_banded_v2(Rs, Cs, 1024, 256, 8, 40, q2, False)
            out3, nfb = jax.jit(ck3)(u0sk, v0s, fus, fvs, gs)
            err3 = float(jnp.max(jnp.abs(out3 - ref2)))
            print(f"[banded-check] v2 {label}: max|diff|={err3:.3e} "
                  f"fallback_chunks={int(nfb)}")
            assert err3 <= 1e-4 * max(scale, 1.0), f"v2 {label} mismatch"
        print("[banded-check] PASS")

    if mode not in ("perf", "both", "stages"):
        return

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
        print(f"[micro-dtb] {tag:56s} {dt * 1e3:8.2f} ms{extra}")
        return dt

    fl = 2.0 * B * R * R * C

    def a_cur(k):
        gk = g + jax.random.normal(k, g.shape) * 1e-6
        return _plane_dtable(u0, v0, fu, fv, gk, R, C, Bc, True).sum()

    timed(f"a: _plane_dtable bf16 B={B} dist={dist}", a_cur, fl)

    # ---- stage decomposition of the v2 internals (where does time go?)
    if mode == "stages" or os.environ.get("MB_STAGES", "0") == "1":
        nb_, S_, q_, q2_ = 16, 512, 48, 32
        bw_ = R // nb_
        band_ = bw_ + 1
        nsub_ = Bc // S_
        m1_ = nsub_ * q_
        m_ = m1_ + q2_
        n_chunks_ = B // Bc
        iota_R_ = jnp.arange(R, dtype=jnp.int32)
        iota_band_ = jnp.arange(band_, dtype=jnp.int32)
        iota_nb_ = jnp.arange(nb_, dtype=jnp.int32)

        def s1_slots(k):
            uu = u0 + jax.random.randint(k, (), 0, 1)
            def body(i, acc):
                u0c = jax.lax.dynamic_slice_in_dim(uu, i * Bc, Bc, 0)
                h = (u0c // bw_).reshape(nsub_, S_)
                A = (h[:, :, None] == iota_nb_[None, None, :]
                     ).astype(jnp.int32)
                rank = jnp.cumsum(A, axis=1) - A
                slot = jnp.sum(A * rank, axis=-1)
                keep = slot < q_
                hflat = h.reshape(Bc)
                ovf = (~keep).reshape(Bc)
                A2 = ((hflat[:, None] == iota_nb_[None, :]) & ovf[:, None]
                      ).astype(jnp.int32)
                rank2 = jnp.cumsum(A2, axis=0) - A2
                slot2 = jnp.sum(A2 * rank2, axis=-1)
                return acc + slot.sum() + slot2.sum()
            return jax.lax.fori_loop(0, n_chunks_, body, jnp.int32(0)
                                     ).astype(jnp.float32)

        def s2_compact(k):
            gk = g + jax.random.normal(k, g.shape) * 1e-6
            pw = 4 + C
            iota_cols = jnp.arange(nb_ * q_, dtype=jnp.int32)[None, None, :]
            def body(i, acc):
                sl = lambda t: jax.lax.dynamic_slice_in_dim(t, i * Bc, Bc, 0)
                u0c, v0c, fuc, fvc, gc = (sl(u0), sl(v0), sl(fu), sl(fv),
                                          sl(gk))
                h = (u0c // bw_).reshape(nsub_, S_)
                A = (h[:, :, None] == iota_nb_[None, None, :]
                     ).astype(jnp.int32)
                rank = jnp.cumsum(A, axis=1) - A
                slot = jnp.sum(A * rank, axis=-1)
                keep = slot < q_
                col = h * q_ + slot
                M = ((iota_cols == col[:, :, None]) & keep[:, :, None]
                     ).astype(jnp.bfloat16)
                P = jnp.concatenate(
                    [jnp.stack([u0c.astype(jnp.float32),
                                v0c.astype(jnp.float32), fuc, fvc], -1),
                     gc], axis=-1)
                Pt = (P.reshape(nsub_, S_, pw).transpose(0, 2, 1)
                      .astype(jnp.bfloat16))
                Pc = jax.lax.dot_general(
                    Pt, M, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return acc + Pc.sum()
            return jax.lax.fori_loop(0, n_chunks_, body, jnp.float32(0))

        def s3_phase2(k):
            # pre-compacted random payload: V build + RHS + banded dot only
            ku, kv, kf, kg = jax.random.split(k, 4)
            u0b = jax.random.randint(ku, (nb_, m_), 0, bw_)
            v0b = jax.random.randint(kv, (nb_, m_), 0, R - 1)
            fubv = jax.random.uniform(kf, (2, nb_, m_))
            gb = jax.random.normal(kg, (nb_, m_, C))
            def body(i, acc):
                V = ((iota_R_[None, None, :] == v0b[:, :, None]
                      ).astype(jnp.bfloat16)
                     * (1 - fubv[1]).astype(jnp.bfloat16)[:, :, None]
                     + (iota_R_[None, None, :] == v0b[:, :, None] + 1
                        ).astype(jnp.bfloat16)
                     * fubv[1].astype(jnp.bfloat16)[:, :, None])
                Ulo = ((iota_band_[None, None, :] == u0b[:, :, None]
                        ).astype(jnp.bfloat16)
                       * (1 - fubv[0]).astype(jnp.bfloat16)[:, :, None]
                       + (iota_band_[None, None, :] == u0b[:, :, None] + 1
                          ).astype(jnp.bfloat16)
                       * fubv[0].astype(jnp.bfloat16)[:, :, None])
                RHS = (jnp.repeat(Ulo, C, axis=-1)
                       * jnp.tile(gb.astype(jnp.bfloat16), (1, 1, band_)))
                part = jax.lax.dot_general(
                    V, RHS, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return acc + part.sum() + acc * 0.0
            return jax.lax.fori_loop(0, n_chunks_, body, jnp.float32(0))

        timed(f"s1: slot bookkeeping (both cumsums) x{n_chunks_}", s1_slots)
        timed(f"s2: s1 + M build + payload dot x{n_chunks_}", s2_compact)
        timed(f"s3: phase-2 (V+RHS build + banded dot) x{n_chunks_}",
              s3_phase2)

    if mode == "stages":
        return

    # production path (tril ranks + folded-bilinear single-compare V)
    from customnerf_tpu.ops.triplane import _plane_dtable_banded
    for (bw, S, q, q2) in [(32, 512, 40, 32), (32, 512, 48, 32),
                           (32, 512, 64, 32), (32, 1024, 88, 32)]:
        if R % bw or Bc % S or q > S:
            continue
        fl_b = 2.0 * B * (bw + 1) * R * C

        def h_prod(k, bw=bw, S=S, q=q, q2=q2):
            gk = g + jax.random.normal(k, g.shape) * 1e-6
            return _plane_dtable_banded(
                u0, v0, fu, fv, gk, R, C, Bc, True, bw, S, q, q2).sum()

        timed(f"prod: bw={bw} S={S} q={q} q2={q2}", h_prod, fl_b)


if __name__ == "__main__":
    main()
