"""Decompose the flagship's field-forward stage (VERDICT r4 next #2: the
largest step stage at 16384 rays with no published sub-breakdown).

Isolates, at flagship shapes (16384 rays × 40 keep, compact 0.4/G=32 →
NB=512 blocks, M=512 slots, B=262144 compacted samples):

  1. xyz/dirs build + clip from (o, d, z)            [N, K, 3] tiling cost
  2. ray permutation gathers (xyz[perm], ...)
  3. compaction bookkeeping + pack matmul (compact_blocks)
  4. triplane encode forward on the compacted batch  (the gather wall)
  5. MLP heads on pre-encoded features               (MXU)
  6. full field apply (encode + MLP)
  7. scatter-back matmul (uncompact_blocks)
  8. the whole _eval_field_compacted
  9. plane-layout counterparts of 2/3/7/8 (round-5 channel-major path:
     compact_planes / uncompact_planes / _eval_field_compacted_pl)

Each stage is wrapped in a lax.scan of SPD iters/dispatch (tunnel latency
amortization) and fed a key-jittered input so XLA cannot CSE dispatches.

Usage: python scripts/prof_field.py [n_rays]       (default 16384)
Env:   PF_KEEP=40 PF_FRAC=0.4 PF_BLOCK=32 PF_SPD=8
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

    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import (_eval_field_compacted,
                                                _eval_field_compacted_pl)
    from customnerf_tpu.ops.compaction import (block_budget, compact_blocks,
                                               compact_plan, compact_planes,
                                               ray_permutation,
                                               uncompact_blocks,
                                               uncompact_planes)
    from customnerf_tpu.ops.triplane import TriplaneSpec, triplane_encode

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    K = int(os.environ.get("PF_KEEP", 40))
    frac = float(os.environ.get("PF_FRAC", 0.4))
    G = int(os.environ.get("PF_BLOCK", 32))
    spd = int(os.environ.get("PF_SPD", 8))
    NB = N // G
    M = block_budget(G, K, frac)
    B = NB * M

    tri = TriplaneSpec(resolutions=(128, 512), channels=(16, 8))
    field = NeRFField(FieldConfig(bound=2.0, grid=tri,
                                  compute_dtype="bfloat16"))
    params = field.init_params(jax.random.PRNGKey(0))
    table = params["params"]["grid_table"]

    rng = np.random.RandomState(0)
    o = jnp.asarray(np.tile([[0.0, 0.0, -1.5]], (N, 1)).astype(np.float32))
    d = rng.randn(N, 3).astype(np.float32) * 0.1 + np.asarray([0, 0, 1.0])
    d = jnp.asarray((d / np.linalg.norm(d, axis=-1, keepdims=True)
                     ).astype(np.float32))
    z = jnp.asarray(np.sort(rng.rand(N, K).astype(np.float32) * 2.5, axis=1))
    valid = jnp.asarray(rng.rand(N, K) < 0.32)       # measured slab fill
    xyz0 = jnp.clip(o[:, None, :] + d[:, None, :] * z[..., None], -2.0, 2.0)
    dirs0 = jnp.broadcast_to(d[:, None, :], xyz0.shape)
    xc = jnp.asarray(rng.rand(B, 3).astype(np.float32))      # compacted-size
    dc = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)).astype(np.float32))
    feat = jnp.asarray(rng.rand(B, tri.output_dim).astype(np.float32))
    perm, inv_perm = ray_permutation(N)
    vals6 = jnp.concatenate([xyz0, dirs0], axis=-1)
    vals_c0, onehot0, slot_valid0, _ = compact_blocks(valid, vals6, G, M)
    outc0 = jnp.asarray(rng.rand(NB, M, 5).astype(np.float32))

    print(f"[prof-field] N={N} K={K} G={G} M={M} NB={NB} B={B}")

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
        print(f"[prof-field] {tag:48s} {dt * 1e3:8.2f} ms")
        return dt

    def jit_z(k):
        return z + jax.random.normal(k, ()) * 0.0

    # 1. xyz/dirs build
    timed("xyz+dirs build+clip [N,K,3]", lambda k: (
        jnp.clip(o[:, None, :] + d[:, None, :] * jit_z(k)[..., None],
                 -2.0, 2.0).sum()
        + jnp.broadcast_to(d[:, None, :], (N, K, 3)).sum()))

    # 2. permutation gathers
    def f_perm(k):
        xyzj = xyz0 + jax.random.normal(k, ()) * 0.0
        return (xyzj[perm].sum() + dirs0[perm].sum()
                + valid[perm].sum().astype(jnp.float32))
    timed("perm gathers xyz/dirs/valid [N,K,*]", f_perm)

    # 3. compact pack (bookkeeping + onehot build + pack matmul)
    def f_pack(k):
        v6 = vals6 + jax.random.normal(k, ()) * 0.0
        vals_c, onehot, slot_valid, bs = compact_blocks(valid, v6, G, M)
        return vals_c.sum() + onehot.sum().astype(jnp.float32) + bs.sum()
    timed("compact_blocks (pack)", f_pack)

    # 4. encode on compacted batch
    def f_enc(k):
        xj = xc + jax.random.normal(k, ()) * 0.0
        return triplane_encode(xj, table, tri).sum()
    timed(f"triplane encode fwd [B={B},3]", f_enc)

    # 5. MLP heads on pre-encoded features
    def heads(p, fea_in, dirs_in, xin):
        import flax.linen as nn
        m = field.bind(p)
        fea = m.feature_net(fea_in)
        raw = m.density_net(fea)[..., 0]
        from customnerf_tpu.ops.activations import trunc_exp
        from customnerf_tpu.ops.frequency import freq_encode
        sigma = trunc_exp(raw + m.gaussian_blob(xin))
        view_en = freq_encode(dirs_in, 4)
        radiance = m.rgb_net(jnp.concatenate([view_en, fea], axis=-1))
        return sigma.sum() + radiance.sum()
    timed(f"MLP heads (feat+dens+rgb) [B={B}]",
          lambda k: heads(params, feat + jax.random.normal(k, ()) * 0.0,
                          dc, xc))

    # 6. full field apply on compacted batch
    timed(f"field.apply full [B={B}]",
          lambda k: sum(t.sum() for t in field.apply(
              params, xc + jax.random.normal(k, ()) * 0.0, dc)))

    # 7. scatter-back
    def f_unpack(k):
        oc = outc0 + jax.random.normal(k, ()) * 0.0
        return uncompact_blocks(onehot0, oc).sum()
    timed("uncompact_blocks (scatter-back)", f_unpack)

    # 8. whole _eval_field_compacted
    def f_all(k):
        xyzj = xyz0 + jax.random.normal(k, ()) * 0.0
        sig, rad, dtm = _eval_field_compacted(
            lambda x, dd: field.apply(params, x, dd), xyzj, dirs0, valid,
            frac, G)
        return sig.sum() + rad.sum() + dtm.sum()
    timed("_eval_field_compacted (whole)", f_all)

    # ---- 9. round-5 plane-layout counterparts ----------------------------
    zk = jnp.asarray(np.sort(rng.rand(N, K).astype(np.float32) * 2.5, 1))
    onehot0p, _, _ = compact_plan(valid, G, M)
    planes7 = [zk] + [jnp.broadcast_to(o[:, i:i + 1], (N, K))
                      for i in range(3)] \
                   + [jnp.broadcast_to(d[:, i:i + 1], (N, K))
                      for i in range(3)]
    outp0 = jnp.asarray(rng.rand(NB, 5, M).astype(np.float32))

    def f_perm_pl(k):
        zj = zk + jax.random.normal(k, ()) * 0.0
        return (zj[perm].sum() + o[perm].sum() + d[perm].sum()
                + valid[perm].sum().astype(jnp.float32))
    timed("PL perm gathers z/o/d/valid [N,K]+[N,3]", f_perm_pl)

    def f_pack_pl(k):
        zj = zk + jax.random.normal(k, ()) * 0.0
        onehot, slot_valid, bs = compact_plan(valid, G, M)
        pc = compact_planes(onehot, [zj] + planes7[1:])
        return pc.sum() + slot_valid.sum().astype(jnp.float32) + bs.sum()
    timed("PL compact_plan + compact_planes (pack)", f_pack_pl)

    def f_unpack_pl(k):
        oc = outp0 + jax.random.normal(k, ()) * 0.0
        return uncompact_planes(onehot0p, oc).sum()
    timed("PL uncompact_planes (scatter-back)", f_unpack_pl)

    aabb6 = jnp.asarray([-2.0, -2.0, -2.0, 2.0, 2.0, 2.0], jnp.float32)

    def f_all_pl(k):
        zj = zk + jax.random.normal(k, ()) * 0.0
        sig, rad_pl, dtm = _eval_field_compacted_pl(
            lambda x, dd: field.apply(params, x, dd), o, d, zj, valid,
            frac, G, aabb6)
        return sig.sum() + sum(p.sum() for p in rad_pl) + dtm.sum()
    timed("PL _eval_field_compacted_pl (whole)", f_all_pl)

    # fwd+bwd (params-grad, the real step's gradient path: march outputs
    # are stop-grad so the pack matmul backward is dead in both layouts)
    def f_all_vjp(k):
        xyzj = xyz0 + jax.random.normal(k, ()) * 0.0

        def lw(p):
            sig, rad, dtm = _eval_field_compacted(
                lambda x, dd: field.apply(p, x, dd), xyzj, dirs0, valid,
                frac, G)
            return sig.sum() + rad.sum()
        l, g = jax.value_and_grad(lw)(params)
        return l + sum(t.sum() for t in jax.tree_util.tree_leaves(g))
    timed("WIDE whole fwd+params-bwd", f_all_vjp)

    def f_all_pl_vjp(k):
        zj = zk + jax.random.normal(k, ()) * 0.0

        def lp(p):
            sig, rad_pl, dtm = _eval_field_compacted_pl(
                lambda x, dd: field.apply(p, x, dd), o, d, zj, valid,
                frac, G, aabb6)
            return sig.sum() + sum(q.sum() for q in rad_pl)
        l, g = jax.value_and_grad(lp)(params)
        return l + sum(t.sum() for t in jax.tree_util.tree_leaves(g))
    timed("PL whole fwd+params-bwd", f_all_pl_vjp)


if __name__ == "__main__":
    main()
