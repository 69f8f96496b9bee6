"""Tri-plane encoder: oracle parity, scatter-free backward, field integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from customnerf_tpu.ops.triplane import (TriplaneSpec, triplane_encode,
                                         triplane_encode_reference,
                                         triplane_init, _encode_impl)


def _spec(**kw):
    base = dict(resolutions=(8, 17), channels=4, bwd="matmul", mm_bf16=False,
                bwd_chunk=32)
    base.update(kw)
    return TriplaneSpec(**base)


def test_forward_matches_numpy_oracle():
    spec = _spec()
    key = jax.random.PRNGKey(0)
    table = triplane_init(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    # include border + out-of-range points
    x = jnp.concatenate([
        x,
        jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 1.0, 0.0],
                     [-0.1, 0.5, 0.5], [0.5, 0.5, 1.2]], jnp.float32),
    ])
    got = np.asarray(triplane_encode(x, table, spec))
    want = triplane_encode_reference(x, table, spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    # OOB rows are exactly zero
    np.testing.assert_array_equal(got[-2], 0.0)
    np.testing.assert_array_equal(got[-1], 0.0)


@pytest.mark.slow
def test_matmul_backward_matches_scatter_autodiff():
    spec = _spec()
    table = triplane_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (37, 3))
    x = jnp.concatenate([x, jnp.asarray([[1.3, 0.5, 0.5]], jnp.float32)])
    g = jax.random.normal(jax.random.PRNGKey(2), (38, spec.output_dim))

    def loss_mm(x, t):
        return jnp.sum(triplane_encode(x, t, spec) * g)

    def loss_sc(x, t):
        return jnp.sum(_encode_impl(x, t, spec) * g)

    dx_mm, dt_mm = jax.grad(loss_mm, argnums=(0, 1))(x, table)
    dx_sc, dt_sc = jax.grad(loss_sc, argnums=(0, 1))(x, table)
    np.testing.assert_allclose(np.asarray(dt_mm), np.asarray(dt_sc),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx_mm), np.asarray(dx_sc),
                               rtol=1e-4, atol=1e-5)
    # OOB row gets zero input-gradient
    np.testing.assert_array_equal(np.asarray(dx_mm)[-1], 0.0)


@pytest.mark.slow
def test_per_level_channels_oracle_and_backward():
    """channels=(Cmax, Cfine) layout: forward matches the NumPy oracle and
    the matmul backward (run at each level's OWN width — the R²·C flops
    lever, docs/PERF.md) matches scatter autodiff, incl. zero grads in the
    unused trailing columns of narrow levels."""
    spec = _spec(resolutions=(8, 17), channels=(4, 2))
    assert spec.output_dim == 3 * (4 + 2)
    table = triplane_init(jax.random.PRNGKey(0), spec)
    assert table.shape[1] == 4                       # max width

    x = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(1), (41, 3)),
        jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [-0.2, 0.5, 0.5]],
                    jnp.float32)])
    got = np.asarray(triplane_encode(x, table, spec))
    want = triplane_encode_reference(x, table, spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(got[-1], 0.0)

    g = jax.random.normal(jax.random.PRNGKey(2), (44, spec.output_dim))
    dx_mm, dt_mm = jax.grad(
        lambda xx, t: jnp.sum(triplane_encode(xx, t, spec) * g),
        argnums=(0, 1))(x, table)
    dx_sc, dt_sc = jax.grad(
        lambda xx, t: jnp.sum(_encode_impl(xx, t, spec) * g),
        argnums=(0, 1))(x, table)
    np.testing.assert_allclose(np.asarray(dt_mm), np.asarray(dt_sc),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx_mm), np.asarray(dx_sc),
                               rtol=1e-4, atol=1e-5)
    # the fine level's unused trailing columns receive exactly zero grad
    fine_rows = np.asarray(dt_mm)[3 * 8 * 8:]        # level-1 blocks
    np.testing.assert_array_equal(fine_rows[:, 2:], 0.0)


@pytest.mark.slow
def test_backward_chunking_pads_correctly():
    # B not a multiple of bwd_chunk exercises the zero-padded tail
    spec = _spec(bwd_chunk=16)
    table = triplane_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (23, 3))

    def loss(t, fn):
        return jnp.sum(fn(x, t, spec) ** 2)

    dt_mm = jax.grad(lambda t: loss(t, triplane_encode))(table)
    dt_sc = jax.grad(lambda t: loss(t, _encode_impl))(table)
    np.testing.assert_allclose(np.asarray(dt_mm), np.asarray(dt_sc),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_banded_backward_matches_scatter_autodiff():
    """bwd="banded" (bucket-compacted band matmul) ≡ scatter autodiff, with
    the fine level banded (16 % 4 == 0) and the 17-res level falling back
    to the plain matmul path (17 % 4 != 0) in the same backward."""
    spec = _spec(resolutions=(16, 17), bwd="banded", bwd_chunk=32,
                 banded_bw=4, banded_sub=16, banded_q=8, banded_q2=16,
                 banded_min_res=8)
    table = triplane_init(jax.random.PRNGKey(0), spec)
    x = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(1), (51, 3)),
        jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [1.3, 0.5, 0.5]],
                    jnp.float32)])
    g = jax.random.normal(jax.random.PRNGKey(2), (54, spec.output_dim))

    dx_b, dt_b = jax.grad(
        lambda xx, t: jnp.sum(triplane_encode(xx, t, spec) * g),
        argnums=(0, 1))(x, table)
    dx_sc, dt_sc = jax.grad(
        lambda xx, t: jnp.sum(_encode_impl(xx, t, spec) * g),
        argnums=(0, 1))(x, table)
    np.testing.assert_allclose(np.asarray(dt_b), np.asarray(dt_sc),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx_b), np.asarray(dx_sc),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dx_b)[-1], 0.0)


@pytest.mark.slow
def test_banded_backward_overflow_and_cond_fallback_exact():
    """Skewed samples force (a) the sub-block overflow reroute (slot ≥ q)
    and (b) with q_ov tiny, the lax.cond full-width fallback — the gradient
    must stay exact through both."""
    # all x concentrated in one u-bucket of every plane → massive overflow
    x = jnp.clip(
        0.5 + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 3)),
        0.0, 1.0)
    g = None
    for qov, label in ((64, "level-2 reroute"), (0, "cond-fallback")):
        spec = _spec(resolutions=(16,), channels=4, bwd="banded",
                     bwd_chunk=32, banded_bw=4, banded_sub=16,
                     banded_q=2, banded_q2=qov, banded_min_res=8)
        table = triplane_init(jax.random.PRNGKey(0), spec)
        if g is None:
            g = jax.random.normal(jax.random.PRNGKey(2),
                                  (64, spec.output_dim))
        dt_b = jax.grad(
            lambda t: jnp.sum(triplane_encode(x, t, spec) * g))(table)
        dt_sc = jax.grad(
            lambda t: jnp.sum(_encode_impl(x, t, spec) * g))(table)
        np.testing.assert_allclose(
            np.asarray(dt_b), np.asarray(dt_sc), rtol=1e-4, atol=1e-6,
            err_msg=f"banded {label} path diverged from scatter autodiff")


@pytest.mark.slow
def test_field_with_triplane_trains():
    import optax

    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import RenderSettings, render_rays

    cfg = FieldConfig(bound=2.0, grid=_spec(resolutions=(16,), channels=8))
    field = NeRFField(cfg)
    params = field.init_params(jax.random.PRNGKey(0))
    assert params["params"]["grid_table"].shape == (3 * 16 * 16, 8)

    settings = RenderSettings(bound=2.0, num_steps=8, upsample_steps=4,
                              soft_mask=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.5]]), (16, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
    target = jnp.full((16, 3), 0.25)

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, key):
        def loss_fn(p):
            out = render_rays(field, p, o, d, key, settings, train=True,
                              perturb=True)
            return jnp.mean((out["image"] - target) ** 2)
        l, gr = jax.value_and_grad(loss_fn)(p)
        up, s = tx.update(gr, s)
        return optax.apply_updates(p, up), s, l

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(20):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, sub)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_config_builds_triplane_field():
    from customnerf_tpu.config import parse_args
    from customnerf_tpu.engine.trainer import build_field

    opt = parse_args(["--grid_type", "triplane", "--triplane_res", "16", "32",
                      "--triplane_channels", "4"])
    field = build_field(opt)
    spec = field.cfg.grid
    assert spec.resolutions == (16, 32)
    assert spec.output_dim == 3 * 4 * 2
    params = field.init_params(jax.random.PRNGKey(0))
    sig, rad = field.apply(params, jnp.zeros((5, 3)), jnp.zeros((5, 3)))
    assert sig.shape == (5,) and rad.shape == (5, 4)


def test_bad_grid_type_rejected():
    from customnerf_tpu.config import parse_args
    with pytest.raises(ValueError):
        parse_args(["--grid_type", "bogus"])


def test_pallas_dtable_matches_xla_interpret():
    """The Pallas dT kernel (kept as a measured-negative artifact,
    ops/triplane_pallas.py) stays numerically exact vs the XLA backward."""
    from customnerf_tpu.ops.triplane_pallas import plane_dtable_pallas
    from customnerf_tpu.ops.triplane import _plane_dtable

    rng = np.random.RandomState(0)
    R, C, B = 16, 4, 100
    u0 = jnp.asarray(rng.randint(0, R - 1, B).astype(np.int32))
    v0 = jnp.asarray(rng.randint(0, R - 1, B).astype(np.int32))
    fu = jnp.asarray(rng.rand(B).astype(np.float32))
    fv = jnp.asarray(rng.rand(B).astype(np.float32))
    g = jnp.asarray(rng.randn(B, C).astype(np.float32))

    want = np.asarray(_plane_dtable(u0, v0, fu, fv, g, R, C, chunk=32,
                                    use_bf16=False))
    got = np.asarray(plane_dtable_pallas(u0, v0, fu, fv, g, R, C, chunk=32,
                                         use_bf16=False, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_dtable_fw_matches_xla_interpret():
    """Round-5 full-width Pallas dT (sample-chunk grid, VMEM-resident
    accumulator) stays exact vs the XLA backward, incl. the ragged-chunk
    zero-pad path (B=100 not divisible by chunk=32)."""
    from customnerf_tpu.ops.triplane_pallas import plane_dtable_pallas_fw
    from customnerf_tpu.ops.triplane import _plane_dtable

    rng = np.random.RandomState(1)
    R, C, B = 16, 4, 100
    u0 = jnp.asarray(rng.randint(0, R - 1, B).astype(np.int32))
    v0 = jnp.asarray(rng.randint(0, R - 1, B).astype(np.int32))
    fu = jnp.asarray(rng.rand(B).astype(np.float32))
    fv = jnp.asarray(rng.rand(B).astype(np.float32))
    g = jnp.asarray(rng.randn(B, C).astype(np.float32))

    want = np.asarray(_plane_dtable(u0, v0, fu, fv, g, R, C, chunk=32,
                                    use_bf16=False))
    got = np.asarray(plane_dtable_pallas_fw(u0, v0, fu, fv, g, R, C,
                                            chunk=32, use_bf16=False,
                                            interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
